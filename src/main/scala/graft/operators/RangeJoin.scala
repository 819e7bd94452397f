package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join. A raw
  * `p.ts >= iv.lo AND p.ts < iv.hi` theta join has no equi key, so Spark
  * plans a BroadcastNestedLoopJoin — one side collected whole to every
  * executor, O(|points| x |intervals|) compute: dead at scale. Bucketizing
  * restores an equi key: each interval explodes to the fixed-width time
  * buckets it overlaps, each point maps to exactly one bucket, candidates
  * meet on a shuffle-friendly bucket equi-join (AQE still broadcasts
  * genuinely small interval sides at runtime), and a residual predicate
  * keeps true [lo, hi) containment. Shuffle volume is
  * |points| + sum(interval_width / bucket_width) — linear and skew-safe;
  * this is the standard interval-join plan in distributed engines.
  */
object RangeJoin {

  /** Join `points` to every interval containing them ([lo, hi) half-open).
    * `unit` is the bucket width, a date_trunc unit (DAY, HOUR, ...) — pick
    * it near the typical interval width so intervals explode to a handful
    * of buckets.
    */
  def pointsInIntervals(points: DataFrame, pointTs: String,
                        intervals: DataFrame, lo: String, hi: String,
                        unit: String = "DAY"): DataFrame = {
    val iv = intervals.withColumn("__bucket", explode(expr(
      s"sequence(date_trunc('$unit', $lo), date_trunc('$unit', $hi), interval 1 ${unit.toLowerCase})")))
    points
      .withColumn("__bucket", date_trunc(unit, col(pointTs)))
      .join(iv, "__bucket")
      .filter(col(pointTs) >= col(lo) && col(pointTs) < col(hi))
      .drop("__bucket")
  }
}
