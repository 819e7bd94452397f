package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.JdbcSource

/** Live-source path (reference R1, export.py:28-34): embedded Derby stands in
  * for the warehouse. Covers JDBC read, predicate pushdown into the remote
  * SQL, and the full transform() from a JDBC source.
  */
class JdbcTransformerSpec extends SparkSpec {

  private def newDb(): String = {
    val dir = Files.createTempDirectory("graft_derby_test_").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("JDBC source round-trips through transform()") {
    import spark.implicits._
    val url = newDb()
    val src = Seq((1L, "alpha", Some(1.5)), (2L, "beta", Some(2.5)), (3L, "gamma", None))
      .toDF("id", "name", "score")
    src.write.format("jdbc").option("url", url).option("dbtable", "src_table").save()

    val base = Files.createTempDirectory("jdbc_transform_").toString
    val t = TableTransformer.fromJdbc(spark, url, "src_table", Map.empty,
      PathConfig(base), "spectrum", "jdbc_rt")
    val ddl = t.transform()
    assert(ddl.contains("create external table spectrum.jdbc_rt ("))

    val back = spark.table("spectrum.jdbc_rt").orderBy("id").collect()
    assert(back.length == 3)
    assert(back(0).getLong(0) == 1L && back(0).getString(1) == "alpha" && back(0).getDouble(2) == 1.5)
    assert(back(2).isNullAt(2)) // null survives JDBC -> CSV '' -> parquet null
  }

  test("filters push down into the remote JDBC scan (R13)") {
    import spark.implicits._
    val url = newDb()
    (1 to 100).map(i => (i.toLong, s"row$i")).toDF("id", "name")
      .write.format("jdbc").option("url", url).option("dbtable", "pushdown_t").save()
    val df = JdbcSource.read(spark, url, "pushdown_t").filter(col("id") < 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan"),
      s"expected pushed JDBC filter in plan:\n$plan")
    assert(df.count() == 9)
  }

  test("partitionOptions yields a range-parallel scan") {
    import spark.implicits._
    val url = newDb()
    (1 to 50).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
      .write.format("jdbc").option("url", url).option("dbtable", "par_t").save()
    val df = JdbcSource.read(spark, url, "par_t",
      JdbcSource.partitionOptions("id", 1L, 51L, 4))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 50)
  }
}
