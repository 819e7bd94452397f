package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — "the most recent build-side value at or before
  * each probe row's timestamp", the time-series join Spark lacks natively
  * (DuckDB `ASOF JOIN`, pandas `merge_asof`, kdb `aj`). The reference engine
  * has no joins at all (SURVEY §2.2), so this is a north-star extension
  * operator.
  *
  * Plan shape (the 100 TB contract): NOT a join. A backward range join
  * (`b.ts <= a.ts`, keep latest) has no usable equi key beyond the grouping
  * key, so Spark would sort-merge every candidate pair per key — quadratic
  * within a key for bursty build sides. Instead both inputs are tagged and
  * unioned, and ONE window (partition by key, order by (ts, tag)) carries
  * the latest build payload forward to each probe row: a single shuffle on
  * the key plus a per-partition sort — the merge pass a single-node engine
  * does, but per key group across the cluster, with each row shuffled
  * exactly once.
  */
object AsofJoin {

  /** Left as-of join: every probe row survives, gaining an `asof` struct
    * holding the latest build row's (ts, payload...) at or before the probe
    * ts within the same key — NULL when no build row precedes.
    *
    * Inclusive semantics: a build row AT the probe ts is visible (build rows
    * sort before probe rows at equal ts), matching DuckDB
    * `ASOF LEFT JOIN ... ON p.key = b.key AND p.ts >= b.ts`.
    *
    * The build side must be unique per (key, ts) — pre-aggregate it if not;
    * "the value at t" is ill-defined under duplicates.
    */
  def leftAsof(probe: DataFrame, build: DataFrame, key: String, ts: String,
               payload: Seq[String]): DataFrame = {
    val pay = struct(col(ts) +: payload.map(col): _*)
    val payType = build.select(pay.as("p")).schema.head.dataType
    val probeOthers = probe.columns.toSeq.filterNot(c => c == key || c == ts)
    val probeSchema = probe.schema
    val bSide = build.select(
      Seq(col(key), col(ts), lit(1).as("__tag"), pay.as("__pay")) ++
        probeOthers.map(n => lit(null).cast(probeSchema(n).dataType).as(n)): _*)
    val pSide = probe.select(
      Seq(col(key), col(ts), lit(0).as("__tag"),
        lit(null).cast(payType).as("__pay")) ++ probeOthers.map(col): _*)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__tag").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bSide.unionByName(pSide)
      .withColumn("asof", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 0)
      .drop("__tag", "__pay")
  }
}
