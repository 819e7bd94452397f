package graft.schema

import org.apache.spark.sql.types._

/** The reference engine's closed scalar type system (SURVEY.md §1.3; reference
  * spectrify/utils/parquet.py:24-40 for the type map, utils/schema.py:38-44
  * for the fail-fast whitelist).
  *
  * 4-hop mapping in the reference (Redshift -> SQLAlchemy -> Arrow -> Parquet)
  * collapses to one hop here: RedshiftType -> Spark DataType.
  */
sealed abstract class RedshiftType(val ddl: String, val spark: DataType)

object RedshiftType {
  case object RsBigInt extends RedshiftType("BIGINT", LongType)
  case object RsInteger extends RedshiftType("INTEGER", IntegerType)
  case object RsSmallInt extends RedshiftType("SMALLINT", ShortType)
  /** DDL emitted as FLOAT for Spectrum compat (reference create.py:11-13). */
  case object RsDoublePrecision extends RedshiftType("FLOAT", DoubleType)
  case object RsReal extends RedshiftType("REAL", FloatType)
  final case class RsVarchar(length: Option[Int] = None)
    extends RedshiftType(length.fold("VARCHAR")(n => s"VARCHAR($n)"), StringType)
  final case class RsChar(length: Option[Int] = None)
    extends RedshiftType(length.fold("CHAR")(n => s"CHAR($n)"), StringType)
  case object RsText extends RedshiftType("TEXT", StringType)
  case object RsBoolean extends RedshiftType("BOOLEAN", BooleanType)
  case object RsTimestamp extends RedshiftType("TIMESTAMP", TimestampType)
  case object RsDate extends RedshiftType("DATE", DateType)
  final case class RsDecimal(precision: Int, scale: Int)
      extends RedshiftType(s"NUMERIC($precision, $scale)", {
        // Redshift's (and Spark's) decimal ceiling (convert.py:20-23) —
        // checked before DecimalType's own constructor can throw.
        require(precision <= 38, s"NUMERIC precision $precision exceeds Redshift max 38")
        DecimalType(precision, scale)
      })

  /** Reverse mapping used when the source of truth is a Spark schema (e.g.
    * reflecting a parquet table). Throws on unsupported types — the same
    * fail-fast-before-any-work contract as the reference (schema.py:38-44).
    */
  def fromSpark(dt: DataType): RedshiftType = dt match {
    case LongType => RsBigInt
    case IntegerType => RsInteger
    case ShortType => RsSmallInt
    case DoubleType => RsDoublePrecision
    case FloatType => RsReal
    case StringType => RsVarchar(None)
    case BooleanType => RsBoolean
    case TimestampType => RsTimestamp
    // naive parquet timestamps surface as NTZ under inferTimestampNTZ; the
    // reference's TIMESTAMP is timezone-naive anyway (timestamps.py:22-32)
    case TimestampNTZType => RsTimestamp
    case DateType => RsDate
    case d: DecimalType => RsDecimal(d.precision, d.scale)
    case other =>
      throw new IllegalArgumentException(
        s"Type is not currently supported by the engine: $other")
  }
}

/** An ordered (name, type) table schema — the engine's equivalent of the
  * reference's reflected sqlalchemy.Table (constraints intentionally not
  * carried: "There are no NOT NULL, DEFAULT, etc." — create.py:38-40).
  */
final case class TableSchema(fields: Seq[(String, RedshiftType)]) {
  def toStructType: StructType =
    StructType(fields.map { case (n, t) => StructField(n, t.spark, nullable = true) })
  def names: Seq[String] = fields.map(_._1)
}

object TableSchema {
  /** Reflect + validate from a Spark schema; throws listing the first
    * unsupported column (reference schema.py:38-44 semantics).
    */
  def fromStructType(st: StructType): TableSchema =
    TableSchema(st.fields.toSeq.map { f =>
      try f.name -> RedshiftType.fromSpark(f.dataType)
      catch {
        case e: IllegalArgumentException =>
          throw new IllegalArgumentException(s"Column '${f.name}': ${e.getMessage}")
      }
    })
}
