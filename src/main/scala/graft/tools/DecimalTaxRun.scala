package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** A/B/C measurement of the price of exactness on the q5_agg money sum
  * (VERDICT r10 task 2: "quantify the DECIMAL tax per migrated slot").
  *
  * Three formulations of SUM(price * (1 - discount)):
  *   A. double  — the pre-FLOAT_AUDIT shape: fast, but the partial-sum
  *      order leaks into the last ulp, so the hash-checked result depends
  *      on the batch/partition split;
  *   B. decimal — the r10 migration: DECIMAL(18,2) casts + exact decimal
  *      sum, order-independent at any split, measured 2.26x on the bench;
  *   C. integer-cents — the proven-range lattice: 2-dp inputs are exact
  *      multiples of 0.01, so round(x*100) recovers exact integer cents
  *      and the whole reduction is 64-bit integer arithmetic (ANSI mode
  *      throws on overflow rather than wrapping — fail-loud). Range proof
  *      for the 100 TB case: price < 10^6 -> cents < 10^8; x (100 - disc)
  *      <= 10^10 per row; 2^63/10^10 ~ 9.2x10^8 rows PER GROUP before
  *      overflow, and the loud ANSI failure is the escape hatch.
  *
  * Usage: runMain graft.tools.DecimalTaxRun [sfDir] — prints median-of-5
  * per formulation plus an equality check of B vs C.
  */
object DecimalTaxRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local()
    def li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))

    def variantA(df: DataFrame): DataFrame =
      df.groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"))
    def variantB(df: DataFrame): DataFrame =
      df.groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1) - col("l_discount").cast("decimal(18,2)"))), 2)
          .cast("double").as("sum_disc_price"))
    def variantC(df: DataFrame): DataFrame = {
      val cents = round(col("l_extendedprice") * 100).cast("long")
      val disc = round(col("l_discount") * 100).cast("long")
      df.groupBy("l_returnflag", "l_linestatus")
        .agg((floor((sum(cents * (lit(100L) - disc)) + 50L) / 100L) / 100.0)
          .as("sum_disc_price"))
    }

    def timeMedian(name: String, mk: DataFrame => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk(li).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val ts = (1 to 5).map(_ => once()).sorted
      val med = ts(2)
      println(f"[decimal-tax] $name%-14s median $med%.3f s  (runs: ${ts.map(t => f"$t%.3f").mkString(" ")})")
      med
    }

    val a = timeMedian("A double", variantA)
    val b = timeMedian("B decimal", variantB)
    val c = timeMedian("C int-cents", variantC)

    val rb = variantB(li).orderBy("l_returnflag", "l_linestatus").collect().toSeq
    val rc = variantC(li).orderBy("l_returnflag", "l_linestatus").collect().toSeq
    println(s"[decimal-tax] B == C value-identical: ${rb == rc}")
    println(f"[decimal-tax] tax B/A = ${b / a}%.2fx; C/A = ${c / a}%.2fx; C/B = ${c / b}%.2fx")
    spark.stop()
  }
}
