package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** A/B of the remaining DECIMAL reductions (r12 verdict task 7, carried
  * from r11): q31_salted_agg and q8b_region_rev are the two BIGGEST
  * decimal carriers left (both reduce over lineitem — q6/q39 are
  * orders-sized), measured decimal vs integer-cents under the r12
  * convergence-warmup discipline (warm until two consecutive runs agree
  * within 10%, then median-of-5) so the comparison samples the JIT
  * plateau, not the ramp — the r10/r11 lesson that a cold measurement
  * indicts the wrong formulation.
  *
  * Value-identity is asserted in-run (the q5 lattice's contract: the
  * integer-cents form must land on the same doubles as the decimal form
  * before any migration is allowed).
  *
  * Usage: runMain graft.tools.DecimalAbRun [sfDir]
  */
object DecimalAbRun {

  private def warmThenMedian(name: String, spark: SparkSession,
                             mk: () => DataFrame): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    var prev = -1.0; var i = 0; var converged = false
    while (i < 5 && !converged) {
      val t = once()
      System.err.println(f"[decimal-ab] $name warm pass ${i + 1}: $t%.3f")
      if (prev > 0 && math.abs(t - prev) <= 0.10 * math.min(t, prev)) converged = true
      prev = t; i += 1
    }
    val ts = (1 to 5).map(_ => once()).sorted
    val med = ts(2)
    println(f"[decimal-ab] $name%-22s median $med%.3f s  (runs: ${ts.map(t => f"$t%.3f").mkString(" ")})")
    med
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local()
    spark.sparkContext.setLogLevel("WARN")

    // ---- q31_salted_agg: two-stage salted reduction over lineitem ----
    def q31(decimal: Boolean): DataFrame = {
      val price =
        if (decimal) sum(col("l_extendedprice").cast("decimal(18,2)"))
        else sum(round(col("l_extendedprice") * 100).cast("long"))
      val partial = Tables.load(spark, sfDir, "lineitem")
        .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(32)))
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(count(lit(1)).as("c"), sum(col("l_quantity")).as("sq"),
          min(col("l_extendedprice")).as("mn"), max(col("l_extendedprice")).as("mx"),
          price.as("sp"))
      val avg =
        if (decimal) round(sum(col("sp")).cast("double") / sum(col("c")), 4)
        else round((sum(col("sp")).cast("double") / 100.0) / sum(col("c")), 4)
      partial.groupBy("l_returnflag")
        .agg(sum(col("c")).as("cnt"), round(sum(col("sq")), 2).as("sum_qty"),
          round(min(col("mn")), 2).as("min_price"), round(max(col("mx")), 2).as("max_price"),
          avg.as("avg_price"))
        .orderBy("l_returnflag")
    }

    // ---- q8b-shaped revenue: same 5-way join, only the reduction swaps ----
    def q8b(decimal: Boolean): DataFrame = {
      def t(n: String) = Tables.load(spark, sfDir, n)
      val joined = t("region")
        .join(t("nation"), col("n_regionkey") === col("r_regionkey"))
        .join(t("customer"), col("c_nationkey") === col("n_nationkey"))
        .join(t("orders"), col("o_custkey") === col("c_custkey"))
        .join(t("lineitem"), col("l_orderkey") === col("o_orderkey"))
      val revenue =
        if (decimal)
          round(sum(col("l_extendedprice").cast("decimal(18,2)")
            * (lit(1) - col("l_discount").cast("decimal(18,2)"))), 2)
            .cast("double")
        else {
          val cents = round(col("l_extendedprice") * 100).cast("long")
          val disc = round(col("l_discount") * 100).cast("long")
          floor((sum(cents * (lit(100L) - disc)) + 50L) / 100L) / 100.0
        }
      joined.groupBy("r_name")
        .agg(revenue.as("revenue"), count(lit(1)).as("cnt"))
        .orderBy("r_name")
    }

    val q31dec = warmThenMedian("q31 decimal", spark, () => q31(decimal = true))
    val q31int = warmThenMedian("q31 int-cents", spark, () => q31(decimal = false))
    val q8bdec = warmThenMedian("q8b decimal", spark, () => q8b(decimal = true))
    val q8bint = warmThenMedian("q8b int-cents", spark, () => q8b(decimal = false))

    val id31 = q31(true).collect().toSeq == q31(false).collect().toSeq
    val id8b = q8b(true).collect().toSeq == q8b(false).collect().toSeq
    println(s"[decimal-ab] q31 value-identical: $id31; q8b value-identical: $id8b")
    println(f"[decimal-ab] q31 int/dec = ${q31int / q31dec}%.2fx; q8b int/dec = ${q8bint / q8bdec}%.2fx")
    spark.stop()
  }
}
