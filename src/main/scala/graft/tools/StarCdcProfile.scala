package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.StarView
import graft.tables.Tables

/** Scratch profiler for the e_join3_cdc lifecycle: per-stage wall times at
  * a given SF — the measurement behind the r18 StarView optimization work.
  */
object StarCdcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.builder(master = "local[32]",
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val fact = Tables.load(s, sfDir, "lineitem")
      .groupBy((col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("pk"))
      .agg(min(col("l_orderkey")).as("l_orderkey"),
        min(col("l_partkey")).as("l_partkey"),
        min(col("l_suppkey")).as("l_suppkey"),
        min(col("l_quantity")).as("qty"))
    val dO = Tables.load(s, sfDir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority").as("prio"))
    val dP = Tables.load(s, sfDir, "part")
      .select(col("p_partkey").as("l_partkey"), col("p_brand").as("brand"))
    val dS = Tables.load(s, sfDir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"),
        col("s_nationkey").cast("long").as("snation"))
    val p = java.nio.file.Files.createTempDirectory("graft_starprof_").toString
    t("build") { StarView.build(fact, "pk",
      Seq("l_orderkey" -> dO, "l_partkey" -> dP, "l_suppkey" -> dS), p, cdc = true) }
    t("cdc1(2 dims)") { StarView.ingestCdc(fact.limit(0),
      Seq(dO.limit(0),
        dP.filter(col("l_partkey") % 11 === 0).withColumn("brand", lit("BX")),
        dS.filter(col("l_suppkey") % 13 === 0)
          .withColumn("snation", lit(999L))), p) }
    t("cdc2(fact up+del)") { StarView.ingestCdc(
      fact.filter(col("pk") % 17 === 0 && col("l_orderkey") % 19 =!= 3)
        .withColumn("qty", col("qty") + 5),
      Seq(dO.limit(0), dP.limit(0), dS.limit(0)), p,
      factDeletes = fact.filter(col("l_orderkey") % 19 === 3).select("pk")) }
    t("cdc3(dim del)") { StarView.ingestCdc(fact.limit(0),
      Seq(dO.limit(0), dP.limit(0), dS.limit(0)), p,
      dimDeletes = Seq(null, null,
        dS.filter(col("l_suppkey") === 7).select("l_suppkey"))) }
    t("merged+rollup") {
      StarView.merged(s, p)
        .groupBy("prio", "brand", "snation")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("qty").cast("decimal(18,6)")), 2).cast("double").as("sum_qty"))
        .orderBy("prio", "brand", "snation")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
