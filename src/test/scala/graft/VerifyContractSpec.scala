package graft

import java.nio.file.{Files, Paths}

/** The driver contract itself: Verify.main must dump per-query parquet plus
  * a parseable oracle_sql.json (this is what feeds the DuckDB gate — if it
  * breaks, the whole round's correctness silently zeroes).
  */
class VerifyContractSpec extends SparkSpec {

  test("Verify.run writes query results and valid oracle json") {
    spark // ensure the shared session exists before Verify's getOrCreate
    val out = Files.createTempDirectory("verify_contract_").toString
    Verify.run(Array("/root/testdata/sf0.001", out, "q5_agg,m_binary_meta"))
    for (q <- Seq("q5_agg", "m_binary_meta")) {
      val dir = new java.io.File(s"$out/$q")
      assert(dir.isDirectory && dir.listFiles().exists(_.getName.endsWith(".parquet")),
        s"missing parquet output for $q")
      assert(spark.read.parquet(s"$out/$q").count() > 0)
    }
    val json = Files.readString(Paths.get(s"$out/oracle_sql.json"))
    // every declared oracle present, and the JSON is well-formed enough for
    // a strict parser: balanced quotes via Spark's own JSON reader
    val parsed = spark.read.option("multiLine", "true").json(
      spark.createDataset(Seq(json))(org.apache.spark.sql.Encoders.STRING))
    assert(parsed.columns.length == SparkEntry.oracleSql.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(parsed.columns.toSet))
  }
}
