package graft.cli

import org.apache.spark.sql.SparkSession

import graft.ddl.SpectrumDdl
import graft.engine.Sessions
import graft.pipeline.{PathConfig, TableTransformer}

/** CLI entry (reference operator R12, main.py:16-95). Subcommands mirror the
  * reference: transform | export | convert | create_table | add_part, behind
  * the reference's group-level connection flags (main.py:16-26).
  *
  * Usage:
  *   graft.cli.Main [conn flags] transform    [--yes] <source> <basePath> <schema> <table>
  *   graft.cli.Main [conn flags] export       <source> <basePath>
  *   graft.cli.Main [conn flags] convert      <source> <basePath>
  *   graft.cli.Main [conn flags] create_table [--yes] <source> <basePath> <schema> <table>
  *   graft.cli.Main add_part     <basePath> <schema> <table> <partition_key> <value>
  *
  * conn flags: `--host --port --user --password --db` (any subset, before
  * the subcommand; env fallbacks GRAFT_HOST/PORT/USER/PASSWORD/DB — see
  * [[ConnectionParams]]). `<source>` is a parquet path, or `table:<name>`
  * to read the table live over JDBC from the configured connection
  * (reference export.py:28-34; the Derby e2e passes a full `jdbc:` URL via
  * `--db`).
  *
  * transform/create_table echo the DDL and ask for confirmation before
  * executing (the reference's log_query + click.confirm flow,
  * create.py:66-73); `--yes` skips the prompt. add_part renders the
  * ALTER TABLE ... ADD PARTITION DDL for the Hive-style partition directory
  * (reference main.py:92-95 declares the subcommand but leaves it a stub;
  * the rendering is examples/weekly_partitions.py:107-129).
  */
object Main {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { println(usage); sys.exit(2) }
    val spark = Sessions.local()
    val code = try run(args.toList, spark) finally spark.stop()
    if (code != 0) sys.exit(code)
  }

  /** `--yes` is recognized only where it is syntactically a FLAG — a token
    * in value position after a value-taking connection flag is that flag's
    * value (so `--password --yes` really sets the password to "--yes"
    * instead of silently consuming the next token as the password, which
    * is what a global partition did). The flag/value pairing applies only
    * to the LEADING flag prefix — exactly the region ConnectionParams.parse
    * consumes — so a positional arg that happens to spell a value flag
    * (a literal `--password` table name) cannot shield a following
    * `--yes` from being the confirm flag.
    */
  private def stripYes(args: List[String]): (Boolean, List[String]) = {
    val out = List.newBuilder[String]
    var yes = false
    var rest = args
    var leading = true
    while (rest.nonEmpty) rest = rest match {
      case f :: v :: tail if leading && ConnectionParams.flagsWithValue(f) =>
        out += f += v; tail
      case "--yes" :: tail => yes = true; tail
      case x :: tail => leading = false; out += x; tail
      case Nil => Nil
    }
    (yes, out.result())
  }

  /** Testable core: returns the process exit code instead of calling it. */
  def run(args: List[String], spark: SparkSession,
          confirm: () => Boolean = stdinConfirm): Int = {
    val (skipConfirm, noYes) = stripYes(args)
    ConnectionParams.parse(noYes) match {
      case Left(msg) =>
        System.err.println(msg)
        println(usage)
        2
      case Right((conn, rest)) => run(rest, conn, skipConfirm, spark, confirm)
    }
  }

  /** `table:<name>` sources read live over JDBC (reference export.py:28-34);
    * anything else is a parquet path.
    */
  private def transformer(spark: SparkSession, conn: ConnectionParams, src: String,
                          base: String, schema: String, table: String): TableTransformer =
    if (src.startsWith("table:"))
      TableTransformer.fromJdbc(spark, conn.jdbcUrl, src.stripPrefix("table:"),
        conn.jdbcOptions, PathConfig(base), schema, table)
    else TableTransformer.fromParquet(spark, src, PathConfig(base), schema, table)

  private def run(rest: List[String], conn: ConnectionParams, skipConfirm: Boolean,
                  spark: SparkSession, confirm: () => Boolean): Int =
    rest match {
      case "transform" :: src :: base :: schema :: table :: Nil =>
        val t = transformer(spark, conn, src, base, schema, table)
        t.exportToCsv()
        t.convertToParquet()
        logQuery(t.createTableDdl())
        if (skipConfirm || confirm()) {
          val name = t.createTable()
          println(s"Created table $name over ${PathConfig(base).spectrumDir}")
          0
        } else { println("Aborted."); 1 }
      case "export" :: src :: base :: Nil =>
        val t = transformer(spark, conn, src, base, "", "")
        val parts = t.exportToCsv()
        println(s"Exported ${parts.size} part file(s) + manifest under $base/csv/")
        0
      case "convert" :: src :: base :: Nil =>
        val t = transformer(spark, conn, src, base, "", "")
        t.convertToParquet()
        println(s"Converted to parquet under $base/spectrum/")
        0
      case "create_table" :: src :: base :: schema :: table :: Nil =>
        val t = transformer(spark, conn, src, base, schema, table)
        logQuery(t.createTableDdl())
        if (skipConfirm || confirm()) {
          val name = t.createTable()
          println(s"Created table $name over ${PathConfig(base).spectrumDir}")
          0
        } else { println("Aborted."); 1 }
      case "add_part" :: base :: schema :: table :: key :: value :: Nil =>
        val location = s"${PathConfig(base).spectrumDir}/$key=$value"
        logQuery(SpectrumDdl.addPartition(schema, table, key, value, location))
        0
      case other =>
        System.err.println(s"Unknown or malformed command: ${other.mkString(" ")}")
        println(usage)
        2
    }

  private def logQuery(ddl: String): Unit = {
    println("*** CREATE TABLE SQL ***")
    println(ddl)
  }

  private def stdinConfirm(): Boolean = {
    print("Continue? [y/N] ")
    Option(scala.io.StdIn.readLine()).exists(l => l.trim.equalsIgnoreCase("y"))
  }

  private val usage: String =
    """Usage: [--host H] [--port P] [--user U] [--password PW] [--db D] <subcommand>
      |  (conn flags fall back to GRAFT_HOST/PORT/USER/PASSWORD/DB; <source> is a
      |   parquet path or table:<name> to read live over the JDBC connection)
      |
      |  transform    [--yes] <source> <basePath> <schema> <table>   export+convert+create
      |  export       <source> <basePath>                     table -> unload CSV + manifest
      |  convert      <source> <basePath>                     CSV + manifest -> typed parquet
      |  create_table [--yes] <source> <basePath> <schema> <table>   render+execute DDL
      |  add_part     <basePath> <schema> <table> <partition_key> <value>  render ADD PARTITION DDL
      |""".stripMargin
}
