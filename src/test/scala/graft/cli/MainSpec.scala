package graft.cli

import java.nio.file.Files

import graft.SparkSpec

/** CLI smoke tests (R12) — exit codes, confirm flow, add_part rendering. */
class MainSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001/nation.parquet"

  test("transform --yes runs end-to-end and registers the table") {
    val base = Files.createTempDirectory("cli_").toString
    val code = Main.run(List("transform", "--yes", src, base, "spectrum", "cli_nation"), spark)
    assert(code == 0)
    assert(spark.table("spectrum.cli_nation").count() == 25)
  }

  test("--yes in a flag's value position is the value, not the confirm flag") {
    val base = Files.createTempDirectory("cli_").toString
    Main.run(List("export", src, base), spark)
    Main.run(List("convert", src, base), spark)
    // '--yes' here is the --password VALUE; no confirm skip was requested,
    // so the declined confirmation must abort (the old global partition
    // stripped it and consumed 'create_table' as the password)
    val code = Main.run(List("--password", "--yes", "create_table", src, base,
      "spectrum", "cli_pwyes"), spark, confirm = () => false)
    assert(code == 1)
    assert(!spark.catalog.tableExists("spectrum.cli_pwyes"))
  }

  test("create_table without confirmation aborts with exit 1") {
    val base = Files.createTempDirectory("cli_").toString
    Main.run(List("export", src, base), spark)
    Main.run(List("convert", src, base), spark)
    val code = Main.run(List("create_table", src, base, "spectrum", "cli_abort"), spark,
      confirm = () => false)
    assert(code == 1)
    assert(!spark.catalog.tableExists("spectrum.cli_abort"))
  }

  test("export/convert subcommands succeed standalone") {
    val base = Files.createTempDirectory("cli_").toString
    assert(Main.run(List("export", src, base), spark) == 0)
    assert(new java.io.File(s"$base/csv/manifest").exists())
    assert(Main.run(List("convert", src, base), spark) == 0)
    assert(spark.read.parquet(s"$base/spectrum").count() == 25)
  }

  test("add_part renders the partition DDL") {
    val code = Main.run(List("add_part", "/b", "spectrum", "events", "partition_key", "2020-01-01"), spark)
    assert(code == 0)
  }

  test("malformed command exits 2") {
    assert(Main.run(List("bogus"), spark) == 2)
    assert(Main.run(List("transform", "only_one_arg"), spark) == 2)
    assert(Main.run(List("--port", "NaN", "export", src, "/tmp/x"), spark) == 2)
  }

  test("connection flags + table:<name> source transform live over JDBC") {
    // stage a live table in embedded Derby, then run the full pipeline from
    // it through the CLI connection surface (reference main.py:16-26 flow)
    val dbDir = Files.createTempDirectory("cli_derby_").toString
    val url = s"jdbc:derby:$dbDir/db;create=true"
    spark.read.parquet(src)
      .write.format("jdbc")
      .option("url", url).option("dbtable", "nation_live").save()
    val base = Files.createTempDirectory("cli_").toString
    // Derby resolves unqualified tables in the schema named after the JDBC
    // user; the staging write above used no user, i.e. schema APP
    val code = Main.run(
      List("--db", url, "--user", "app",
        "transform", "--yes", "table:nation_live", base, "spectrum", "cli_jdbc_nation"),
      spark)
    assert(code == 0)
    assert(spark.table("spectrum.cli_jdbc_nation").count() == 25)
  }
}
