package graft.cli

import graft.engine.Sessions
import graft.pipeline.{PathConfig, TableTransformer}

/** CLI entry (reference operator R12, main.py:16-95). Subcommands mirror the
  * reference: transform | export | convert | create_table.
  *
  * Usage:
  *   graft.cli.Main transform   <source.parquet> <basePath> <schema> <table>
  *   graft.cli.Main export      <source.parquet> <basePath>
  *   graft.cli.Main convert     <source.parquet> <basePath>
  *   graft.cli.Main create_table <source.parquet> <basePath> <schema> <table>
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { println(usage); sys.exit(2) }
    val spark = Sessions.local()
    try {
      args.toList match {
        case "transform" :: src :: base :: schema :: table :: Nil =>
          val t = new TableTransformer(spark, src, PathConfig(base), schema, table)
          val ddl = t.transform()
          println("*** CREATE TABLE SQL ***")
          println(ddl)
        case "export" :: src :: base :: Nil =>
          val t = new TableTransformer(spark, src, PathConfig(base), "", "")
          val parts = t.exportToCsv()
          println(s"Exported ${parts.size} part file(s) + manifest under $base/csv/")
        case "convert" :: src :: base :: Nil =>
          val t = new TableTransformer(spark, src, PathConfig(base), "", "")
          t.convertToParquet()
          println(s"Converted to parquet under $base/spectrum/")
        case "create_table" :: src :: base :: schema :: table :: Nil =>
          val t = new TableTransformer(spark, src, PathConfig(base), schema, table)
          println(t.createTableDdl())
        case other =>
          System.err.println(s"Unknown or malformed command: ${other.mkString(" ")}")
          println(usage)
          sys.exit(2)
      }
    } finally spark.stop()
  }

  private val usage: String =
    """Usage:
      |  transform    <source.parquet> <basePath> <schema> <table>   export+convert+DDL
      |  export       <source.parquet> <basePath>                    table -> unload CSV + manifest
      |  convert      <source.parquet> <basePath>                    CSV + manifest -> typed parquet
      |  create_table <source.parquet> <basePath> <schema> <table>   print external-table DDL
      |""".stripMargin
}
