package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class PgBoolSpec extends SparkSpec {
  import spark.implicits._

  private def parse(values: Seq[String]): Seq[Option[Boolean]] =
    values.toDF("s").select(PgBool.pgBool(col("s")).as("b"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0))).toSeq

  test("'t'/'f'/''/null parse per the reference rules (convert.py:41-56,140-144)") {
    assert(parse(Seq("t", "f", "")) == Seq(Some(true), Some(false), None))
    assert(Seq[String](null).toDF("s").select(PgBool.pgBool(col("s")))
      .collect().head.isNullAt(0))
  }

  test("anything else raises (ValueError analog, convert.py:55)") {
    // may surface raw (driver-side local relation) or wrapped in SparkException
    intercept[Exception](parse(Seq("true")))
  }

  test("property: every valid token round-trips, all others throw") {
    val valid = Map("t" -> Some(true), "f" -> Some(false), "" -> None)
    val gen = Gen.oneOf(Gen.oneOf("t", "f", ""), Gen.alphaNumStr)
    val samples = Iterator.from(0)
      .map(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
      .take(100).flatten.toSeq
    samples.foreach { s =>
      if (valid.contains(s)) assert(parse(Seq(s)) == Seq(valid(s)), s"for input '$s'")
      else intercept[Exception](parse(Seq(s)))
    }
  }
}
