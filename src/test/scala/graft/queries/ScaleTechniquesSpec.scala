package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** Evidence for the 100 TB techniques that don't show up in the oracle gate:
  * bucketed co-located joins (no shuffle), AQE skew-join splitting, and
  * approximate sketches vs their exact twins.
  */
class ScaleTechniquesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("hive-partitioned write prunes partitions on read") {
    val base = Files.createTempDirectory("graft_part_").toString
    Tables.load(spark, sfDir, "orders")
      .withColumn("od", col("o_orderdate").cast("date"))
      .write.partitionBy("od").parquet(s"$base/orders_p")
    val read = spark.read.parquet(s"$base/orders_p")
      .filter(col("od") === "1995-06-15")
    val plan = read.queryExecution.executedPlan.toString
    // the date predicate must land in PartitionFilters (pruned at planning,
    // unmatched directories never listed into tasks), NOT in PushedFilters
    // or a post-scan Filter
    assert(plan.contains("PartitionFilters: [isnotnull(od"),
      s"partition filter not applied:\n$plan")
    val scannedParts = finalPlan(read).collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }.sum
    val allParts = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderdate").cast("date")).distinct().count()
    // == 1 exactly: a <=-style bound would pass VACUOUSLY at 0 if an AQE
    // wrapper ever hid the scan (the r11 IvfPqIndexSpec lesson)
    assert(scannedParts == 1 && scannedParts < allParts,
      s"expected exactly 1 scanned partition of $allParts, got $scannedParts")
  }

  test("q34 TopK aggregator plans map-side partial aggregation, no Window sort") {
    val df = graft.SparkEntry.queries("q34_topk_grouped")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // partial_topkagg BELOW the exchange = each map task reduces to <= k
    // rows per key before any shuffle; and no Window/partition-wide sort
    // anywhere (the q14 formulation this replaces)
    val partialIdx = plan.indexOf("partial_topkagg")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    assert(partialIdx > 0, s"no partial aggregation in plan:\n$plan")
    assert(exchangeIdx > 0 && exchangeIdx < partialIdx,
      s"partial agg should sit below the exchange:\n$plan")
    assert(!plan.contains("Window"), s"q34 must not plan a window:\n$plan")
  }

  test("s_knn_batch ranks per-probe via partial TopK agg, no Window sort") {
    val df = graft.SparkEntry.queries("s_knn_batch")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // each corpus-scan task must reduce to <= k triples per probe BEFORE
    // the exchange; the old row_number-over-Window formulation funneled
    // every probe's full corpus triple set through one task's sort
    val partialIdx = plan.indexOf("partial_topkagg")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    assert(partialIdx > 0, s"no partial TopK aggregation in plan:\n$plan")
    assert(exchangeIdx > 0 && exchangeIdx < partialIdx,
      s"partial agg should sit below the exchange:\n$plan")
    assert(!plan.contains("Window"), s"s_knn_batch must not plan a window:\n$plan")
  }

  test("bucketed tables join with ZERO shuffle exchanges") {
    val wh = Files.createTempDirectory("graft_wh_").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS buckets LOCATION '$wh'")
    Tables.load(spark, sfDir, "customer")
      .write.format("parquet").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("buckets.customer_b")
    Tables.load(spark, sfDir, "orders")
      .withColumnRenamed("o_custkey", "c_custkey")
      .write.format("parquet").bucketBy(8, "c_custkey")
      .mode("overwrite").saveAsTable("buckets.orders_b")
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the co-located (bucket-wise) join is observable
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("buckets.customer_b")
        .join(spark.table("buckets.orders_b"), "c_custkey")
      val n = joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan should be bucket-aware:\n$plan")
      assert(n == Tables.load(spark, sfDir, "orders").join(
        Tables.load(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
  }

  test("AQE splits a skewed join") {
    import spark.implicits._
    // one key holds ~90% of the rows
    val skewed = (1 to 200000).map(i => (if (i % 10 == 0) i.toLong else 7L, i.toLong))
      .toDF("k", "v")
    val dim = (1L to 200000L).map(k => (k, s"d$k")).toDF("k", "name")
    val prev = spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevC = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    try {
      // thresholds low enough for test-sized data to register as skew;
      // broadcast disabled so a shuffle join is actually planned
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = skewed.join(dim, "k")
      joined.collect() // run through joined's own QueryExecution so the
      // adaptive plan below is the FINAL one
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected AQE skew handling:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prevC)
    }
  }

  test("approx_count_distinct (HLL++) lands within 5% of exact") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).collect()(0)
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("approx_percentile brackets the exact median") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val approx = li.agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)"))
      .collect()(0).getDouble(0)
    val bounds = li.agg(
      expr("percentile(l_extendedprice, 0.45)").as("lo"),
      expr("percentile(l_extendedprice, 0.55)").as("hi")).collect()(0)
    assert(approx >= bounds.getDouble(0) && approx <= bounds.getDouble(1))
  }

  test("z-ordered layout prunes 2-D box predicates; single-column sort does not") {
    // the p_zorder claim, measured: a file sorted by the Morton interleave
    // of (partkey, suppkey) clusters BOTH dimensions, so parquet row-group
    // min/max stats let a 2-D box predicate skip most row groups; a file
    // sorted on an unrelated single column leaves both dims uniform in
    // every row group, so nothing skips. The SCAN node's numOutputRows
    // counts rows materialized from SURVIVING row groups (pushed filters
    // prune at group granularity; exact filtering happens above the scan),
    // which makes it a direct gauge of skipping.
    val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val zval = expr((0 until 16).map(b =>
      s"shiftleft(shiftright(l_partkey % 65536, $b) & 1, ${2 * b}) + " +
        s"shiftleft(shiftright(l_suppkey % 65536, $b) & 1, ${2 * b + 1})")
      .mkString(" + ")).cast("long")
    val base = Files.createTempDirectory("graft_zorder_").toString
    // small row groups so sf0.01 yields enough of them to make skipping
    // observable (~60k rows -> dozens of groups)
    li.withColumn("zv", zval).orderBy("zv").coalesce(1)
      .write.option("parquet.block.size", 64 * 1024).parquet(s"$base/zordered")
    li.orderBy("l_orderkey").coalesce(1)
      .write.option("parquet.block.size", 64 * 1024).parquet(s"$base/bysingle")

    def scannedRows(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter(col("l_partkey").between(100, 120) && col("l_suppkey").between(10, 20))
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value }.sum
    }
    val nz = scannedRows(s"$base/zordered")
    val ns = scannedRows(s"$base/bysingle")
    val total = li.count()
    info(s"box scan: z-ordered $nz rows vs single-sort $ns of $total total")
    assert(ns > total / 2,
      s"single-column sort should skip (almost) nothing: scanned $ns of $total")
    assert(nz * 4 < ns,
      s"z-order should scan <1/4 of the single-sort layout: $nz vs $ns")
  }
}
