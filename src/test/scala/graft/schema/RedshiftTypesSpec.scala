package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class RedshiftTypesSpec extends AnyFunSuite {
  import RedshiftType._

  test("spark type mapping covers the full supported matrix (SURVEY §1.3)") {
    assert(RsBigInt.spark == LongType)
    assert(RsInteger.spark == IntegerType)
    assert(RsSmallInt.spark == ShortType)
    assert(RsDoublePrecision.spark == DoubleType)
    assert(RsReal.spark == FloatType)
    assert(RsVarchar(Some(17)).spark == StringType)
    assert(RsBoolean.spark == BooleanType)
    assert(RsTimestamp.spark == TimestampType)
    assert(RsDate.spark == DateType)
    assert(RsDecimal(38, 9).spark == DecimalType(38, 9))
  }

  test("DOUBLE PRECISION renders as FLOAT in DDL (create.py:11-13)") {
    assert(RsDoublePrecision.ddl == "FLOAT")
  }

  test("decimal precision capped at Redshift max 38 (convert.py:20-23)") {
    intercept[IllegalArgumentException](RsDecimal(39, 0))
  }

  test("fromSpark reflects a parquet-style schema") {
    val st = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", TimestampType)))
    assert(TableSchema.fromStructType(st).fields ==
      Seq("a" -> RsBigInt, "b" -> RsVarchar(None), "c" -> RsTimestamp))
  }

  test("unsupported types rejected fail-fast, naming the column (schema.py:38-44)") {
    val st = StructType(Seq(
      StructField("ok", LongType),
      StructField("bad", ArrayType(LongType))))
    val e = intercept[IllegalArgumentException](TableSchema.fromStructType(st))
    assert(e.getMessage.contains("bad"))
    assert(e.getMessage.contains("not currently supported"))
  }
}
