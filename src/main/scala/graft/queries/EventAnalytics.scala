package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AggIndex
import graft.tables.Tables

/** Event-stream analytics operators (funnel conversion, cohort retention) —
  * the queries a product-analytics user of the engine runs over the events
  * table. Both are single-shuffle plans: all window passes share the
  * user_id partitioning, so each query shuffles the events table exactly
  * once regardless of how many derived stages it computes.
  */
object EventAnalytics {

  private def q(name: String, oracle: String, headline: Boolean = false)(
      body: (org.apache.spark.sql.SparkSession, String) => DataFrame): Query =
    Query(name, body, Some(oracle), headline)

  /** Ordered funnel view -> click -> purchase: a user converts a stage only
    * with an event STRICTLY AFTER their previous stage's first event. The
    * three stage timestamps are chained window minima over the same
    * user_id partition — Catalyst plans one Exchange and three Window
    * nodes, so at 100 TB this is one shuffle of (user_id, type, ts), not
    * three self-joins. Conversion ratios divide exact BIGINT counts.
    */
  val e_funnel: Query = q("e_funnel",
    """WITH s1 AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
      |         MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END)
      |           OVER (PARTITION BY user_id) AS t_view
      |  FROM events),
      |s2 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
      |              OVER (PARTITION BY user_id) AS t_click FROM s1),
      |s3 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
      |              OVER (PARTITION BY user_id) AS t_purch FROM s2),
      |u AS (SELECT user_id, MAX(t_view) AS tv, MAX(t_click) AS tc, MAX(t_purch) AS tp
      |      FROM s3 GROUP BY user_id)
      |SELECT CAST(COUNT(tv) AS BIGINT) AS n_view,
      |       CAST(COUNT(tc) AS BIGINT) AS n_click,
      |       CAST(COUNT(tp) AS BIGINT) AS n_purchase,
      |       ROUND(CAST(COUNT(tc) AS DOUBLE) / CAST(COUNT(tv) AS DOUBLE), 4) AS r_click,
      |       ROUND(CAST(COUNT(tp) AS DOUBLE) / CAST(COUNT(tc) AS DOUBLE), 4) AS r_purchase
      |FROM u""".stripMargin, headline = true) { (s, dir) =>
    val w = Window.partitionBy("user_id")
    val staged = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts") > col("t_view"), col("ts"))).over(w))
      .withColumn("t_purch",
        min(when(col("event_type") === "purchase" && col("ts") > col("t_click"), col("ts"))).over(w))
    staged
      .groupBy("user_id")
      .agg(max(col("t_view")).as("tv"), max(col("t_click")).as("tc"),
        max(col("t_purch")).as("tp"))
      .agg(count(col("tv")).as("n_view"), count(col("tc")).as("n_click"),
        count(col("tp")).as("n_purchase"))
      .select(col("n_view"), col("n_click"), col("n_purchase"),
        round(col("n_click").cast("double") / col("n_view").cast("double"), 4).as("r_click"),
        round(col("n_purchase").cast("double") / col("n_click").cast("double"), 4).as("r_purchase"))
  }

  /** Cohort retention: users grouped by first-seen day; for each (cohort,
    * day-offset) the count of distinct active users. First-seen is a window
    * min over user_id; the retention matrix is a groupBy over (cohort,
    * offset) — two shuffles total, both on small keys. Offsets are exact
    * integer day differences (no float date math).
    */
  val e_retention: Query = q("e_retention",
    """WITH f AS (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
      |         MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) OVER (PARTITION BY user_id) AS cohort
      |  FROM events)
      |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
      |       CAST(date_diff('day', cohort, d) AS BIGINT) AS day_offset,
      |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
      |FROM f GROUP BY cohort, day_offset
      |ORDER BY cohort_day, day_offset""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id")
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .withColumn("cohort", min(col("d")).over(w))
      .groupBy(col("cohort"), datediff(col("d"), col("cohort")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("active_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Event-time RANGE frame: per event, the count of the same user's events
    * in the trailing hour — a true time-interval frame (peers at identical
    * timestamps are in or out together), not a row-count frame like
    * q15's. Ordered by exact microseconds on both engines so the frame
    * boundary is integer-exact. One shuffle on user_id.
    */
  val w_range_frame: Query = q("w_range_frame",
    """SELECT user_id, event_id,
      |       CAST(COUNT(*) OVER (PARTITION BY user_id
      |                           ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
      |                           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |            AS BIGINT) AS cnt_1h
      |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, 0L)
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("cnt_1h"))
      .orderBy("user_id", "event_id")
  }

  /** Time-series gap filling (resampling): hourly counts per event type
    * joined against a COMPLETE generated hour spine, missing buckets
    * 0-filled and flagged — the primitive behind any downsampled
    * dashboard or training-curve export (aggregations alone silently skip
    * empty buckets). The spine is hours x types: a 1-row bounds aggregate
    * exploded to hours, crossed with the tiny type dimension — both sides
    * bounded, the exempt-by-design broadcast pattern. The real data only
    * flows through the hourly groupBy and one left join.
    */
  val e_gapfill: Query = q("e_gapfill",
    """WITH b AS (SELECT date_trunc('hour', MIN(CAST(ts AS TIMESTAMP))) AS h0,
      |                  date_trunc('hour', MAX(CAST(ts AS TIMESTAMP))) AS h1 FROM events),
      |hours AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
      |ty AS (SELECT DISTINCT event_type FROM events),
      |spine AS (SELECT h, event_type FROM hours, ty),
      |c AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type,
      |             COUNT(*) AS cnt
      |      FROM events GROUP BY h, event_type)
      |SELECT strftime(s.h, '%Y-%m-%d %H:%M:%S') AS h, s.event_type,
      |       CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt, c.cnt IS NULL AS filled
      |FROM spine s LEFT JOIN c ON c.h = s.h AND c.event_type = s.event_type
      |ORDER BY h, s.event_type""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    val hours = ev
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val types = ev.select(col("event_type")).distinct()
    val counts = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    hours.crossJoin(types)
      .join(counts, Seq("h", "event_type"), "left")
      .select(date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("h"), col("event_type"),
        coalesce(col("cnt"), lit(0L)).as("cnt"), col("cnt").isNull.as("filled"))
      .orderBy("h", "event_type")
  }

  /** Per-JVM memo of the persisted partial-aggregate table for an sf dir
    * (single-snapshot-per-JVM contract, shared with NorthStar's index
    * caches). The build splits the log three ways — base (batch 0) plus
    * two deltas (batches 1, 2) — so the stored table genuinely exercises
    * multi-batch merge-on-read, the shape a week of incremental refreshes
    * leaves behind.
    */
  private val aggIndexCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def aggIndexPath(s: org.apache.spark.sql.SparkSession, dir: String): String =
    aggIndexCache.computeIfAbsent(dir, _ => {
      val ev = Tables.load(s, dir, "events")
      val p = java.nio.file.Files.createTempDirectory("graft_aggidx_").toString
      AggIndex.build(ev.filter(col("event_id") % 5 =!= 4), p)
      AggIndex.ingest(ev.filter(col("event_id") % 10 === 4), p, batch = 1)
      AggIndex.ingest(ev.filter(col("event_id") % 10 === 9), p, batch = 2)
      p
    })

  /** Incremental rollup maintenance ([[graft.operators.AggIndex]]): the
    * daily (event_type, day) rollup answered from the STORED mergeable
    * partial table — built as base + two ingested deltas — instead of
    * re-aggregating the raw log. The exact columns (cnt, DECIMAL-carried
    * sum, min, max) are provably split-invariant (associative combines),
    * which is exactly what the oracle checks: DuckDB aggregates the WHOLE
    * log in one pass and the hashes must match. Distinct users ride a
    * merged HLL sketch under the q32-style tolerance gate (`exact_users`
    * hash-checked, the estimate must land within 5%). At 100 TB the
    * refresh cost is delta-sized and this query's own cost is
    * O(keys x batches), not O(log).
    */
  /** Shared oracle (e_agg_maintain + StreamingQueries.st_agg_ingest): the
    * one-shot whole-log rollup the stored partial table must reproduce.
    */
  private[queries] val aggMaintainOracleSql: String =
    """SELECT event_type,
      |       strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_v,
      |       MIN(value) AS min_v, MAX(value) AS max_v,
      |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |       TRUE AS within_5pct
      |FROM events GROUP BY event_type, day ORDER BY event_type, day""".stripMargin

  /** The merged rollup in the oracle's output shape: exact columns from
    * the stored table, exact distinct recomputed from the raw log ONLY to
    * feed the differential gate (the production query ships the estimate
    * alone). Shared by the batch and streamed ingest rows.
    */
  private[queries] def mergedWithGate(s: org.apache.spark.sql.SparkSession,
                                      dir: String, path: String,
                                      evFilter: Column = lit(true),
                                      upToBatch: Int = Int.MaxValue): DataFrame = {
    val m = AggIndex.mergedAsOf(s, path, upToBatch)
    val exact = Tables.load(s, dir, "events").filter(evFilter)
      .groupBy(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    m.join(exact, Seq("event_type", "day"))
      .select(col("event_type"), col("day"), col("cnt"),
        // round the DECIMAL itself, THEN cast (FLOAT_AUDIT.md): a 6-dp
        // decimal rounded at 2 dp is exact HALF_UP on both engines; the old
        // round-after-double-cast could land on a .xx5000 tie where Spark
        // (shortest-repr) and DuckDB (binary) round apart
        round(col("sum_v"), 2).cast("double").as("sum_v"),
        col("min_v"), col("max_v"), col("exact_users"),
        (abs(col("users") - col("exact_users")).cast("double") <=
          col("exact_users").cast("double") * 0.05).as("within_5pct"))
      .orderBy("event_type", "day")
  }

  val e_agg_maintain: Query = q("e_agg_maintain", aggMaintainOracleSql,
    headline = true) { (s, dir) =>
    mergedWithGate(s, dir, aggIndexPath(s, dir))
  }

  /** Percentiles from the stored rollup — "p50/p95 value per (type, day)"
    * answered by merging the per-batch KLL quantile sketches
    * ([[graft.operators.AggIndex.quantiles]]): the dashboard query that
    * usually forces a raw-log rescan runs merge-on-read over O(keys x
    * batches) sketch rows instead. Gate discipline is q32/HLL's: the
    * estimates are not hash-compared (a sketch value is
    * implementation-defined); instead each estimate's EXACT rank in the
    * raw log must sit inside KLL's published error envelope — p50's
    * inclusive rank in [0.40, 0.64] (0.5 + rank error + discrete tie
    * mass), p95's in [0.90, 1.0] — and the BOOLEAN verdicts are the
    * hash-checked contract, TRUE on both engines. cnt rides along
    * hash-exact. At 100 TB: refresh stays delta-sized (the sketch is
    * mergeable), the percentile query never touches the log; the rank
    * gate here scans it only to AUDIT the estimates.
    */
  val e_agg_quantile: Query = q("e_agg_quantile",
    """SELECT event_type,
      |       strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       TRUE AS p50_ok, TRUE AS p95_ok
      |FROM events GROUP BY event_type, day ORDER BY event_type, day""".stripMargin,
    headline = true) { (s, dir) =>
    val est = AggIndex.quantiles(s, aggIndexPath(s, dir))
    Tables.load(s, dir, "events")
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("value"))
      .join(broadcast(est), Seq("event_type", "day"))
      .groupBy("event_type", "day", "cnt", "p50", "p95")
      .agg(sum(when(col("value") <= col("p50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("value") <= col("p95"), 1L).otherwise(0L)).as("le95"))
      .select(col("event_type"), col("day"), col("cnt"),
        // adaptive envelope: at small n the 1/n rank granularity dominates
        // the sketch error (an inclusive quantile of 3 items has rank 2/3),
        // so the band is max(absolute-row slack, proportional slack)
        (col("le50") >= col("cnt") * 0.5 - greatest(lit(1.0), col("cnt") * 0.05) &&
          col("le50") <= col("cnt") * 0.5 + greatest(lit(2.0), col("cnt") * 0.14)).as("p50_ok"),
        (col("le95") >= col("cnt") * 0.95 - greatest(lit(1.0), col("cnt") * 0.05)).as("p95_ok"))
      .orderBy("event_type", "day")
  }

  /** Day-over-day audience overlap from the stored rollup — the set
    * operation the HLL users sketch structurally cannot answer:
    * "how many users were active on day d AND day d+1" needs
    * INTERSECTION, and HLL registers only union; the partial table's
    * theta sketches ([[graft.operators.AggIndex.overlaps]]) intersect
    * losslessly at this cardinality (theta is exact below its k=4096
    * retained entries; bounded-error above). Gate discipline as
    * e_agg_quantile: the exact overlap (hash-checked) comes from the raw
    * log, the sketch estimate must land within max(5, 15%) of it, and the
    * boolean verdict is the contract. At 100 TB the retention dashboard
    * reads O(keys x batches) sketch rows; the log is scanned here only to
    * AUDIT the estimates.
    */
  val e_agg_overlap: Query = q("e_agg_overlap",
    """WITH u AS (
      |  SELECT DISTINCT event_type,
      |         strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
      |         user_id
      |  FROM events)
      |SELECT a.event_type, a.day, b.day AS day_next,
      |       CAST(COUNT(*) AS BIGINT) AS exact_overlap, TRUE AS within_tol
      |FROM u a JOIN u b
      |  ON a.event_type = b.event_type AND a.user_id = b.user_id
      | AND CAST(b.day AS DATE) = CAST(a.day AS DATE) + INTERVAL 1 DAY
      |GROUP BY a.event_type, a.day, b.day
      |ORDER BY a.event_type, a.day""".stripMargin) { (s, dir) =>
    val est = AggIndex.overlaps(s, aggIndexPath(s, dir))
    val u = Tables.load(s, dir, "events")
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("user_id"))
      .distinct()
    val exact = u.as("a").join(u.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.user_id") === col("b.user_id") &&
          expr("to_date(b.day) = date_add(to_date(a.day), 1)"))
      .groupBy(col("a.event_type").as("event_type"),
        col("a.day").as("day"), col("b.day").as("day_next"))
      .agg(count(lit(1)).as("exact_overlap"))
    exact.join(broadcast(est), Seq("event_type", "day", "day_next"))
      .select(col("event_type"), col("day"), col("day_next"), col("exact_overlap"),
        (abs(col("overlap_est") - col("exact_overlap")) <=
          greatest(lit(5.0), col("exact_overlap") * 0.15)).as("within_tol"))
      .orderBy("event_type", "day")
  }

  /** The rollup AS OF an earlier ingest — time travel over the partial
    * table ([[graft.operators.AggIndex.mergedAsOf]]): "the dashboard as it
    * stood after batch 1" is a batch <= 1 FILTER on the immutable stored
    * partials (base + first delta here; the batch-2 delta must vanish),
    * no recomputation, no log access — what the audit/debug workflow
    * ("did Tuesday's numbers change because of data or because of the
    * Wednesday ingest?") needs from an append-only rollup. Oracle = the
    * one-shot aggregate of exactly the events the first two batches
    * covered (event_id % 10 <> 9); the HLL estimate rides the same gate
    * as e_agg_maintain against THAT slice's exact distinct.
    */
  val e_agg_asof: Query = q("e_agg_asof",
    """SELECT event_type,
      |       strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_v,
      |       MIN(value) AS min_v, MAX(value) AS max_v,
      |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |       TRUE AS within_5pct
      |FROM events WHERE event_id % 10 <> 9
      |GROUP BY event_type, day ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    mergedWithGate(s, dir, aggIndexPath(s, dir),
      evFilter = col("event_id") % 10 =!= 9, upToBatch = 1)
  }

  /** Modal value-bucket per key from the stored rollup — the Misra-Gries
    * heavy-hitters column answering "which latency decile dominates this
    * (service, day)" by merging per-batch k=8 summaries
    * ([[graft.operators.AggIndex.topBuckets]]), never rescanning the log.
    * Gate discipline is e_agg_quantile's, with MG's DETERMINISTIC envelope
    * instead of a probabilistic one: for every bucket the summary reports,
    * exact - n/(k+1) <= est <= exact, and any bucket above n/(k+1) is
    * guaranteed PRESENT (both facts survive the Agarwal merge, so they
    * hold for the merged-across-batches summary). The hash contract is the
    * exact side (per-key total n, exact modal bucket, its exact count —
    * tie to the smaller bucket) plus two booleans: present_ok (the modal
    * bucket is in the stored summary, or its count sits under the
    * presence bound — integer cross-multiplication, no division) and
    * est_ok (every reported estimate inside the envelope, vacuously true
    * for an emptied summary). Estimates themselves are never hash-compared
    * (MG contents are partition-order-dependent; the BOUND is not). At
    * 100 TB: the dashboard reads O(keys x batches) k-counter maps; the
    * raw-log scan here exists only to AUDIT the envelope.
    */
  val e_agg_topbucket: Query = q("e_agg_topbucket",
    """WITH e AS (SELECT event_type,
      |       strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
      |       CAST(FLOOR(value / 10) AS BIGINT) AS vb
      |       FROM events),
      |c AS (SELECT event_type, day, vb, COUNT(*) AS cnt FROM e GROUP BY 1, 2, 3),
      |t AS (SELECT event_type, day, vb, cnt,
      |             SUM(cnt) OVER (PARTITION BY event_type, day) AS n,
      |             ROW_NUMBER() OVER (PARTITION BY event_type, day
      |               ORDER BY cnt DESC, vb) AS rn
      |      FROM c)
      |SELECT event_type, day, CAST(n AS BIGINT) AS n, vb AS top_vb,
      |       CAST(cnt AS BIGINT) AS top_cnt, TRUE AS present_ok, TRUE AS est_ok
      |FROM t WHERE rn = 1 ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    val est = broadcast(AggIndex.topBuckets(s, aggIndexPath(s, dir)))
    val exact = Tables.load(s, dir, "events")
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        floor(col("value") / 10).cast("long").as("vb"))
      .groupBy("event_type", "day", "vb").agg(count(lit(1)).as("cnt"))
    val keyTot = exact.groupBy("event_type", "day").agg(sum("cnt").as("n"))
    val top = exact.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type", "day")
          .orderBy(col("cnt").desc, col("vb"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day"),
        col("vb").as("top_vb"), col("cnt").as("top_cnt"))
    val estOk = est.join(exact, Seq("event_type", "day", "vb"))
      .join(keyTot, Seq("event_type", "day"))
      .groupBy("event_type", "day")
      .agg(min(col("est") <= col("cnt") &&
        col("est") * 9 >= col("cnt") * 9 - col("n")).as("est_ok"))
    top
      .join(est.select(col("event_type"), col("day"),
        col("vb").as("top_vb"), col("est").as("top_est")),
        Seq("event_type", "day", "top_vb"), "left")
      .join(keyTot, Seq("event_type", "day"))
      .join(estOk, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), col("n"), col("top_vb"),
        col("top_cnt"),
        (col("top_cnt") * 9 <= col("n") || col("top_est").isNotNull).as("present_ok"),
        coalesce(col("est_ok"), lit(true)).as("est_ok"))
      .orderBy("event_type", "day")
  }

  /** Right-to-be-forgotten for the ROLLUP under the gate (VERDICT r10
    * missing #1 — a GDPR delete hits the user's aggregate contributions,
    * not just their documents): the 3-batch stored partial table retracts
    * every user with user_id % 37 = 0 via
    * [[graft.operators.AggIndex.forgetUsers]] — recompute-affected-keys,
    * because min/max and the HLL sketch are NOT invertible (negative
    * partials can subtract a count, never unlearn a sketch). Affected
    * (event_type, day) keys are re-derived from the cleaned log and stored
    * under a fresh committed batch id; unaffected keys keep their stored
    * partials byte-identical. The oracle is the one-shot rollup of a log
    * that never contained those users — forget-equals-never-ingested at
    * the differential gate, with the 5% HLL tolerance riding the same
    * recomputed sketches. At 100 TB the affected-key rescan is
    * partition-prunable (day is the log's partition column) and is the
    * information-theoretic minimum for sketch retraction.
    */
  val e_agg_forget: Query = q("e_agg_forget",
    """SELECT event_type,
      |       strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_v,
      |       MIN(value) AS min_v, MAX(value) AS max_v,
      |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |       TRUE AS within_5pct
      |FROM events WHERE user_id % 37 <> 0
      |GROUP BY event_type, day ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    val path = aggIndexCache.computeIfAbsent(s"$dir#forget", _ => {
      val ev = Tables.load(s, dir, "events")
      val p = java.nio.file.Files.createTempDirectory("graft_aggidx_fgt_").toString
      AggIndex.build(ev.filter(col("event_id") % 5 =!= 4), p)
      AggIndex.ingest(ev.filter(col("event_id") % 10 === 4), p, batch = 1)
      AggIndex.ingest(ev.filter(col("event_id") % 10 === 9), p, batch = 2)
      AggIndex.forgetUsers(s, p, ev,
        ev.filter(col("user_id") % 37 === 0).select("user_id"))
      p
    })
    mergedWithGate(s, dir, path, evFilter = col("user_id") % 37 =!= 0)
  }

  /** Last-observation-carried-forward (LOCF) imputation — the time-series
    * gap-fill every metrics/sensor pipeline runs when a reading is
    * missing ([[e_gapfill]] fills missing BUCKETS with zeros; this fills
    * missing VALUES with the previous reading). Nulls are planted
    * deterministically (event_id % 7 = 0) since the fixture has none;
    * the carry is `last_value IGNORE NULLS` over a total order
    * (ts, event_id — event_id is unique, so the frame is deterministic),
    * with a -1 sentinel for leading nulls.
    *
    * Scale shape: ONE window over the user-partitioned stream — a single
    * exchange on user_id, running-frame evaluation, no self-join (the
    * naive "join each null to its latest non-null predecessor" is a
    * range self-join that re-sorts per null). The filled value is a
    * PICKED value, not a reduction — no float-sum surface
    * (FLOAT_AUDIT.md class: fixed-order).
    */
  val e_locf: Query = q("e_locf",
    """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |                  CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      |           FROM events)
      |SELECT user_id, event_id,
      |       ROUND(COALESCE(LAST_VALUE(v IGNORE NULLS) OVER (
      |               PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1), 2) AS filled
      |FROM e ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")).as("v"))
      .select(col("user_id"), col("event_id"),
        round(coalesce(last(col("v"), ignoreNulls = true).over(w), lit(-1)), 2).as("filled"))
      .orderBy("user_id", "event_id")
  }

  /** Per-JVM memo of the maintained join view for an sf dir: the enriched
    * fact table events ⋈ customer, seeded with a base slice of BOTH sides
    * and grown by two batches that append to both — so every delta-rule
    * term (ΔA⋈B_old, A_old⋈ΔB, ΔA⋈ΔB) materializes pairs across batch
    * boundaries, not just the seed join.
    */
  private val joinViewCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def joinViewPath(s: org.apache.spark.sql.SparkSession, dir: String): String =
    joinViewCache.computeIfAbsent(dir, _ => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      val p = java.nio.file.Files.createTempDirectory("graft_joinview_").toString
      graft.operators.JoinView.build(
        ev.filter(col("event_id") % 5 =!= 4),
        cust.filter(col("user_id") % 5 =!= 4), "user_id", p)
      graft.operators.JoinView.ingest(
        ev.filter(col("event_id") % 10 === 4),
        cust.filter(col("user_id") % 10 === 4), "user_id", p)
      graft.operators.JoinView.ingest(
        ev.filter(col("event_id") % 10 === 9),
        cust.filter(col("user_id") % 10 === 9), "user_id", p)
      p
    })

  /** Incrementally maintained JOIN view ([[graft.operators.JoinView]]) —
    * the enriched fact table (events ⋈ customer profile) kept current by
    * the delta rule as BOTH sides grow, answered from the STORED view:
    * per market segment, event count and the exact money sum. The oracle
    * joins the whole of both tables in one shot — the maintained view
    * must reproduce it exactly, which is precisely the IVM correctness
    * claim (every cross-batch pair found, none found twice). Money is
    * integer-cents (FLOAT_AUDIT discipline: order-independent 64-bit
    * algebra, one float division at the end).
    */
  private[queries] val joinMaintainOracleSql: String =
    """SELECT c.c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sv
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY segment ORDER BY segment""".stripMargin

  /** The maintained view's presentation agg — shared by the batch
    * (e_join_maintain), streamed (st_join_ingest) and forget
    * (e_join_forget) rows so all three hash against one shape.
    */
  private[queries] def joinViewAgg(s: org.apache.spark.sql.SparkSession,
                                   path: String,
                                   upToBatch: Int = Int.MaxValue): DataFrame =
    graft.operators.JoinView.mergedAsOf(s, path, upToBatch)
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sv"))
      .orderBy("segment")

  val e_join_maintain: Query = q("e_join_maintain", joinMaintainOracleSql,
    headline = true) { (s, dir) =>
    joinViewAgg(s, joinViewPath(s, dir))
  }

  /** Time travel for the JOIN view ([[graft.operators.JoinView
    * .mergedAsOf]]): the enriched table as it stood after batch 1 — a
    * prefix filter on the immutable batch column, no recomputation, no
    * input rescans (e_agg_asof's contract applied to the join family).
    * A view-as-of-batch-N contains exactly the pairs whose BOTH sides
    * arrived by N, so the oracle is the one-shot join of the first two
    * slices of each input.
    */
  val e_join_asof: Query = q("e_join_asof",
    """SELECT c.c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sv
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |WHERE (e.event_id % 5 <> 4 OR e.event_id % 10 = 4)
      |  AND (c.c_custkey % 5 <> 4 OR c.c_custkey % 10 = 4)
      |GROUP BY segment ORDER BY segment""".stripMargin) { (s, dir) =>
    joinViewAgg(s, joinViewPath(s, dir), upToBatch = 1)
  }

  /** Right-to-be-forgotten for the JOIN view ([[graft.operators.JoinView
    * .forget]]): a user set is tombstoned on the join key — O(deletes)
    * delete-vector appends on all three subtables, every read anti-joins
    * them out, compact physically reclaims and retires — and the oracle
    * is the one-shot join over tables that NEVER CONTAINED the users
    * (forget-equals-never-ingested parity: dropping a key from either
    * join input drops exactly that key's pairs). The delta ingested
    * AFTER the forget proves stored history cannot resurrect the
    * forgotten keys' enriched rows.
    */
  val e_join_forget: Query = q("e_join_forget",
    """SELECT c.c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sv
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |WHERE e.user_id % 37 <> 0
      |GROUP BY segment ORDER BY segment""".stripMargin) { (s, dir) =>
    val path = joinViewCache.computeIfAbsent(s"$dir#forget", _ => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      val p = java.nio.file.Files.createTempDirectory("graft_joinview_fgt_").toString
      graft.operators.JoinView.build(
        ev.filter(col("event_id") % 5 =!= 4), cust, "user_id", p)
      graft.operators.JoinView.ingest(
        ev.filter(col("event_id") % 10 === 4), cust.limit(0), "user_id", p)
      graft.operators.JoinView.forget(s, p,
        ev.filter(col("user_id") % 37 === 0).select("user_id")
          .unionByName(cust.filter(col("user_id") % 37 === 0).select("user_id")))
      graft.operators.JoinView.compact(s, p)
      // post-forget delta: its forgotten-key rows must stay invisible in
      // every old⋈Δ term (the keys are gone from stored history)
      graft.operators.JoinView.ingest(
        ev.filter(col("event_id") % 10 === 9 && col("user_id") % 37 =!= 0),
        cust.limit(0), "user_id", p)
      p
    })
    joinViewAgg(s, path)
  }

  /** The COMPOSED incremental pipeline — enrich THEN roll up, both
    * maintained: events and customers arrive in batches, each batch's
    * delta flows facts -> [[graft.operators.JoinView]] (the enriched
    * fact table, delta rule) -> [[graft.operators.AggIndex]] (the
    * dashboard rollup, mergeable partials) — the full
    * bronze-silver-gold lakehouse pipeline with NO full recomputation at
    * any stage: per batch, the join work is delta-rule-sized and the
    * rollup work is one partials pass over exactly that batch's NEW
    * enriched rows (the view's immutable `batch=` column IS the change
    * feed — no diffing, no CDC machinery). The rollup keys on the
    * ENRICHMENT attribute (market segment — AggIndex's generic key
    * column, aliased at the seam), which is the point: you cannot roll
    * up by segment without the join, and neither stage rescans history.
    * Oracle: the one-shot join + rollup over the whole of both tables;
    * HLL distinct under the family's 5% gate, exact columns hash-checked.
    */
  private[queries] val pipelineIvmOracleSql: String =
    """SELECT c.c_mktsegment AS segment,
      |       strftime(date_trunc('day', CAST(e.ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_v,
      |       MIN(e.value) AS min_v, MAX(e.value) AS max_v,
      |       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS exact_users,
      |       TRUE AS within_5pct
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY segment, day ORDER BY segment, day""".stripMargin

  /** Compaction mid-lifecycle under the ORACLED gate (the d_index_compact
    * discipline applied to the join view): the same seed + two ingests as
    * e_join_maintain, but with [[graft.operators.JoinView.compact]] run
    * between them — the file-merging rewrite of all three subtables
    * (kb/batch layout preserved) must not change a single answer, proven
    * against the one-shot oracle rather than only in JoinViewSpec.
    */
  val e_join_compact: Query = q("e_join_compact", joinMaintainOracleSql) { (s, dir) =>
    val path = joinViewCache.computeIfAbsent(s"$dir#compact", _ => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      val p = java.nio.file.Files.createTempDirectory("graft_joinview_cpt_").toString
      graft.operators.JoinView.build(
        ev.filter(col("event_id") % 5 =!= 4),
        cust.filter(col("user_id") % 5 =!= 4), "user_id", p)
      graft.operators.JoinView.ingest(
        ev.filter(col("event_id") % 10 === 4),
        cust.filter(col("user_id") % 10 === 4), "user_id", p)
      graft.operators.JoinView.compact(s, p)
      graft.operators.JoinView.ingest(
        ev.filter(col("event_id") % 10 === 9),
        cust.filter(col("user_id") % 10 === 9), "user_id", p)
      p
    })
    joinViewAgg(s, path)
  }

  /** The pipeline's change-feed read: batch N's partition of the view IS
    * exactly batch N's NEW enriched rows, presented in AggIndex's input
    * shape (the rollup keys on the enrichment attribute — AggIndex's
    * generic key column, aliased at the seam). Shared with the streamed
    * twin (StreamingQueries.st_pipeline_ivm) so the two cannot drift.
    */
  private[queries] def pipelineViewBatch(s: org.apache.spark.sql.SparkSession,
                                         jvPath: String, n: Int): DataFrame =
    s.read.parquet(s"$jvPath/view")
      .filter(col("batch") === n)
      .select(col("c_mktsegment").as("event_type"), col("ts"),
        col("value"), col("user_id"))

  /** The pipeline's presentation + gate: the merged rollup joined to the
    * exact distinct recomputed from the one-shot join (differential-gate
    * audit only — the production query ships the estimate). One copy for
    * the batch and streamed rows.
    */
  private[queries] def pipelineIvmGate(s: org.apache.spark.sql.SparkSession,
                                       dir: String, aggPath: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("value"))
    val cust = Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val m = AggIndex.merged(s, aggPath)
    val exact = ev.join(cust, Seq("user_id"))
      .groupBy(col("c_mktsegment").as("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    m.join(exact, Seq("event_type", "day"))
      .select(col("event_type").as("segment"), col("day"), col("cnt"),
        round(col("sum_v"), 2).cast("double").as("sum_v"),
        col("min_v"), col("max_v"), col("exact_users"),
        (abs(col("users") - col("exact_users")).cast("double") <=
          col("exact_users").cast("double") * 0.05).as("within_5pct"))
      .orderBy("segment", "day")
  }

  val e_pipeline_ivm: Query = q("e_pipeline_ivm", pipelineIvmOracleSql,
    headline = true) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
    val cust = Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val root = joinViewCache.computeIfAbsent(s"$dir#pipeline", _ => {
      val r = java.nio.file.Files.createTempDirectory("graft_jvivm_").toString
      def evS(p: Column) = ev.filter(p); def cuS(p: Column) = cust.filter(p)
      graft.operators.JoinView.build(
        evS(col("event_id") % 5 =!= 4), cuS(col("user_id") % 5 =!= 4), "user_id", s"$r/jv")
      AggIndex.build(pipelineViewBatch(s, s"$r/jv", 0), s"$r/agg")
      for ((em, cm, n) <- Seq((4, 4, 1), (9, 9, 2))) {
        graft.operators.JoinView.ingest(
          evS(col("event_id") % 10 === em), cuS(col("user_id") % 10 === cm),
          "user_id", s"$r/jv")
        AggIndex.ingest(pipelineViewBatch(s, s"$r/jv", n), s"$r/agg", batch = n)
      }
      r
    })
    pipelineIvmGate(s, dir, s"$root/agg")
  }

  /** Per-JVM memo of a CDC (upsert-mode) join view over the orders
    * fixture: both sides keyed by o_orderkey (key-unique, the row-image
    * contract) — a = order status, b = order priority. Three upsert
    * batches exercise every retraction shape: a fact-side correction
    * (batch 1 updates status for key % 7 = 3), a dim-side correction
    * (batch 2 updates priority for key % 5 = 1, overlapping batch 1's
    * keys at % 35), and a BOTH-sides-same-batch update (batch 3, key %
    * 11 = 4 — one retraction per pair, not two).
    */
  private def cdcViewPath(s: org.apache.spark.sql.SparkSession, dir: String): String =
    joinViewCache.computeIfAbsent(s"$dir#cdc", _ => {
      val ord = Tables.load(s, dir, "orders")
      val a0 = ord.select(col("o_orderkey").as("key"), col("o_orderstatus").as("status"))
      val b0 = ord.select(col("o_orderkey").as("key"), col("o_orderpriority").as("prio"))
      val p = java.nio.file.Files.createTempDirectory("graft_joinview_cdc_").toString
      graft.operators.JoinView.build(a0, b0, "key", p, cdc = true)
      graft.operators.JoinView.ingestCdc(
        a0.filter(col("key") % 7 === 3).select(col("key"), lit("U").as("status")),
        b0.limit(0), "key", p)
      graft.operators.JoinView.ingestCdc(a0.limit(0),
        b0.filter(col("key") % 5 === 1).select(col("key"), lit("P9").as("prio")),
        "key", p)
      graft.operators.JoinView.ingestCdc(
        a0.filter(col("key") % 11 === 4).select(col("key"), lit("W").as("status")),
        b0.filter(col("key") % 11 === 4).select(col("key"), lit("P8").as("prio")),
        "key", p)
      p
    })

  /** CDC UPSERTS into the maintained join view ([[graft.operators
    * .JoinView.ingestCdc]] — r14 verdict task 6): later batches UPDATE
    * earlier facts (the Debezium row-image shape) and the sign-resolved
    * view must equal the one-shot join over LATEST-STATE inputs — the
    * oracle writes that state directly as CASE overrides (batch 3 beats
    * batch 1 on the overlap keys), so a stale pair surviving retraction,
    * a double retraction, or a lost insert all hash-diverge.
    */
  private[queries] val joinUpsertOracleSql: String =
    """SELECT o_orderkey AS key,
      |       CASE WHEN o_orderkey % 11 = 4 THEN 'W'
      |            WHEN o_orderkey % 7 = 3 THEN 'U'
      |            ELSE o_orderstatus END AS status,
      |       CASE WHEN o_orderkey % 11 = 4 THEN 'P8'
      |            WHEN o_orderkey % 5 = 1 THEN 'P9'
      |            ELSE o_orderpriority END AS prio
      |FROM orders ORDER BY key""".stripMargin

  val e_join_upsert: Query = q("e_join_upsert", joinUpsertOracleSql) { (s, dir) =>
    graft.operators.JoinView.merged(s, cdcViewPath(s, dir)).orderBy("key")
  }

  /** Time travel on the CDC view: the prefix sign-resolve at batch 1 is
    * the state after the FIRST correction only — retractions are part of
    * history, not rewrites of it, so the as-of floor never rose and the
    * read is exact (e_join_asof's contract under upserts).
    */
  val e_join_upsert_asof: Query = q("e_join_upsert_asof",
    """SELECT o_orderkey AS key,
      |       CASE WHEN o_orderkey % 7 = 3 THEN 'U' ELSE o_orderstatus END AS status,
      |       o_orderpriority AS prio
      |FROM orders ORDER BY key""".stripMargin) { (s, dir) =>
    graft.operators.JoinView.mergedAsOf(s, cdcViewPath(s, dir), upToBatch = 1)
      .orderBy("key")
  }

  /** Sign-fold consolidation MID-LIFECYCLE under the oracled gate
    * (d_index_compact's discipline for the CDC view): the same upsert
    * batches as e_join_upsert, but with [[graft.operators.JoinView
    * .foldCdc]] run between them — the rewrite that collapses the signed
    * log to its resolved state (bounding merge-on-read) must not change
    * a single answer, and upserts AFTER the fold must still retract
    * correctly against the folded (value-identical) rows.
    */
  val e_join_upsert_fold: Query = q("e_join_upsert_fold", joinUpsertOracleSql) { (s, dir) =>
    val path = joinViewCache.computeIfAbsent(s"$dir#cdcfold", _ => {
      val ord = Tables.load(s, dir, "orders")
      val a0 = ord.select(col("o_orderkey").as("key"), col("o_orderstatus").as("status"))
      val b0 = ord.select(col("o_orderkey").as("key"), col("o_orderpriority").as("prio"))
      val p = java.nio.file.Files.createTempDirectory("graft_joinview_cdcf_").toString
      graft.operators.JoinView.build(a0, b0, "key", p, cdc = true)
      graft.operators.JoinView.ingestCdc(
        a0.filter(col("key") % 7 === 3).select(col("key"), lit("U").as("status")),
        b0.limit(0), "key", p)
      graft.operators.JoinView.foldCdc(s, p)
      graft.operators.JoinView.ingestCdc(a0.limit(0),
        b0.filter(col("key") % 5 === 1).select(col("key"), lit("P9").as("prio")),
        "key", p)
      graft.operators.JoinView.ingestCdc(
        a0.filter(col("key") % 11 === 4).select(col("key"), lit("W").as("status")),
        b0.filter(col("key") % 11 === 4).select(col("key"), lit("P8").as("prio")),
        "key", p)
      p
    })
    graft.operators.JoinView.merged(s, path).orderBy("key")
  }

  /** The CDC DELETE lifecycle over the upsert fixture (r15 verdict task
    * 1): update → delete (both sides, one batch) → RE-INSERT a subset of
    * the deleted keys. The latest-state oracle drops a pair iff its
    * a-key was deleted and not re-inserted (%13 = 2 minus %26 = 2) OR its
    * b-key was deleted (%17 = 5) — a marker that fails to kill the pair,
    * a retraction that kills too much, or a re-insert blocked by the
    * stale marker all hash-diverge. `foldWhere = 2` interleaves
    * [[graft.operators.JoinView.foldCdc]] after the delete batch, so the
    * folded sides must physically DROP the marked keys yet still admit
    * the re-insert (the fold twin's contract).
    */
  private def cdcDeleteView(s: org.apache.spark.sql.SparkSession, dir: String,
                            fold: Boolean): String =
    joinViewCache.computeIfAbsent(s"$dir#cdcdel$fold", _ => {
      val ord = Tables.load(s, dir, "orders")
      val a0 = ord.select(col("o_orderkey").as("key"), col("o_orderstatus").as("status"))
      val b0 = ord.select(col("o_orderkey").as("key"), col("o_orderpriority").as("prio"))
      val keys = ord.select(col("o_orderkey").as("key"))
      val p = java.nio.file.Files.createTempDirectory("graft_joinview_cdcdel_").toString
      graft.operators.JoinView.build(a0, b0, "key", p, cdc = true)
      graft.operators.JoinView.ingestCdc(
        a0.filter(col("key") % 7 === 3).select(col("key"), lit("U").as("status")),
        b0.limit(0), "key", p)
      graft.operators.JoinView.ingestCdc(a0.limit(0), b0.limit(0), "key", p,
        delA = keys.filter(col("key") % 13 === 2),
        delB = keys.filter(col("key") % 17 === 5))
      if (fold) graft.operators.JoinView.foldCdc(s, p)
      graft.operators.JoinView.ingestCdc(
        a0.filter(col("key") % 26 === 2).select(col("key"), lit("R").as("status")),
        b0.limit(0), "key", p)
      p
    })

  private[queries] val joinDeleteOracleSql: String =
    """SELECT o_orderkey AS key,
      |       CASE WHEN o_orderkey % 26 = 2 THEN 'R'
      |            WHEN o_orderkey % 7 = 3 THEN 'U'
      |            ELSE o_orderstatus END AS status,
      |       o_orderpriority AS prio
      |FROM orders
      |WHERE (o_orderkey % 13 <> 2 OR o_orderkey % 26 = 2)
      |  AND o_orderkey % 17 <> 5
      |ORDER BY key""".stripMargin

  val e_join_delete: Query = q("e_join_delete", joinDeleteOracleSql) { (s, dir) =>
    graft.operators.JoinView.merged(s, cdcDeleteView(s, dir, fold = false)).orderBy("key")
  }

  val e_join_delete_fold: Query = q("e_join_delete_fold", joinDeleteOracleSql) { (s, dir) =>
    graft.operators.JoinView.merged(s, cdcDeleteView(s, dir, fold = true)).orderBy("key")
  }

  /** HEADLINE lifecycle slot for the CDC/IVM-upsert family (r15 verdict
    * task 8): a FRESH view per execution — build + three upsert batches
    * + sign-fold consolidation + the sign-resolved merged read — so the
    * CDC view's merge-on-read and fold costs enter the round record and
    * are tracked round-over-round (the d_entity_index discipline:
    * lifecycle cost IS the number; the memoized e_join_upsert fixture
    * would amortize the builds away and time only the final read).
    */
  val e_join_cdc_lifecycle: Query = q("e_join_cdc_lifecycle", joinUpsertOracleSql,
    headline = true) { (s, dir) =>
    val ord = Tables.load(s, dir, "orders")
    val a0 = ord.select(col("o_orderkey").as("key"), col("o_orderstatus").as("status"))
    val b0 = ord.select(col("o_orderkey").as("key"), col("o_orderpriority").as("prio"))
    val p = java.nio.file.Files.createTempDirectory("graft_joinview_cdclc_").toString
    graft.operators.JoinView.build(a0, b0, "key", p, cdc = true)
    graft.operators.JoinView.ingestCdc(
      a0.filter(col("key") % 7 === 3).select(col("key"), lit("U").as("status")),
      b0.limit(0), "key", p)
    graft.operators.JoinView.ingestCdc(a0.limit(0),
      b0.filter(col("key") % 5 === 1).select(col("key"), lit("P9").as("prio")),
      "key", p)
    graft.operators.JoinView.ingestCdc(
      a0.filter(col("key") % 11 === 4).select(col("key"), lit("W").as("status")),
      b0.filter(col("key") % 11 === 4).select(col("key"), lit("P8").as("prio")),
      "key", p)
    graft.operators.JoinView.foldCdc(s, p)
    graft.operators.JoinView.merged(s, p).orderBy("key")
  }

  /** Per-JVM memo of a CDC-maintained rollup over the events fixture
    * ([[AggIndex.ingestCdc]] — r16 verdict missing #1): build on the full
    * log, then batch 1 applies a signed changefeed of DELETES (event_id
    * % 10 = 3, -1 rows) and value UPDATES (% 10 = 7: -1 original, +1 at
    * value + 100 — retraction keys recomputed as rep-rows from the
    * corrected state), and batch 2 RE-INSERTS half the deleted rows at
    * value + 7 (a pure +1 batch — the delta-sized insert-only path, its
    * ordinary partials merging ON TOP of batch 1's replacements).
    */
  private def cdcAggPath(s: org.apache.spark.sql.SparkSession, dir: String): String =
    aggIndexCache.computeIfAbsent(s"$dir#cdc", _ => {
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"), col("value"))
      val p = java.nio.file.Files.createTempDirectory("graft_aggcdc_").toString
      AggIndex.build(ev, p, cdc = true)
      val dels = ev.filter(col("event_id") % 10 === 3).withColumn("sgn", lit(-1))
      val updOld = ev.filter(col("event_id") % 10 === 7).withColumn("sgn", lit(-1))
      val updNew = ev.filter(col("event_id") % 10 === 7)
        .withColumn("value", col("value") + 100).withColumn("sgn", lit(1))
      val state1 = ev.filter(col("event_id") % 10 =!= 3)
        .withColumn("value",
          when(col("event_id") % 10 === 7, col("value") + 100).otherwise(col("value")))
      AggIndex.ingestCdc(dels.unionByName(updOld).unionByName(updNew),
        state1, p, batch = 1)
      val ins = ev.filter(col("event_id") % 20 === 3)
        .withColumn("value", col("value") + 7).withColumn("sgn", lit(1))
      AggIndex.ingestCdc(ins, state1.unionByName(ins.drop("sgn")), p, batch = 2)
      p
    })

  /** CDC-corrected rollup maintenance: the merged read after deletes,
    * updates, and re-inserts must equal the one-shot rollup over the
    * LATEST corrected log — a ghost-counted deleted event, a stale
    * pre-update sum, an unlearned-user HLL, or a replacement row that
    * failed to supersede all hash-diverge. Exact columns hash-checked;
    * the (non-invertible, recomputed) HLL rides the family's 5% gate.
    */
  val e_rollup_cdc: Query = q("e_rollup_cdc",
    """WITH corrected AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
      |         CASE WHEN event_id % 10 = 7 THEN value + 100
      |              WHEN event_id % 20 = 3 THEN value + 7
      |              ELSE value END AS value
      |  FROM events
      |  WHERE event_id % 10 <> 3 OR event_id % 20 = 3)
      |SELECT event_type,
      |       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_v,
      |       MIN(value) AS min_v, MAX(value) AS max_v,
      |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |       TRUE AS within_5pct
      |FROM corrected GROUP BY event_type, day ORDER BY event_type, day""".stripMargin) {
    (s, dir) =>
      mergedWithGate(s, dir, cdcAggPath(s, dir),
        evFilter = col("event_id") % 10 =!= 3 || col("event_id") % 20 === 3)
  }

  /** Time travel UNDER the CDC corrections: replacement rows are append-
    * only and visibility is resolved inside the as-of prefix, so the
    * rollup as of batch 0 is exactly the pre-correction whole-log answer
    * (the later-retracted events included — that is what that history
    * was), and the floor never rose. Same oracle as e_agg_maintain.
    */
  val e_rollup_cdc_asof: Query = q("e_rollup_cdc_asof", aggMaintainOracleSql) {
    (s, dir) =>
      mergedWithGate(s, dir, cdcAggPath(s, dir), upToBatch = 0)
  }

  /** The composed CDC pipeline — a mutable fact source CDC-fed into a
    * maintained dashboard, the r16 verdict's #1 missing cell: per batch,
    * upserts/deletes flow into the CDC [[graft.operators.JoinView]]
    * (sign-resolved enriched facts), and exactly that batch's SIGNED view
    * partition — the changefeed — corrects the stored [[AggIndex]]
    * partials ([[AggIndex.ingestCdc]], state = the view's own
    * [[graft.operators.JoinView.mergedForDays]] read, storage-pruned to
    * the affected days via the pd= layout). The rollup keys on the
    * ENRICHMENT attribute (order priority), so batch 3's priority upsert
    * MOVES facts between rollup groups — the changefeed emits -1 under
    * the old group and +1 under the new, and both groups' partials are
    * replaced from state. No stage ever rescans history.
    */
  val e_pipeline_cdc: Query = q("e_pipeline_cdc",
    """WITH a AS (
      |  SELECT o_orderkey AS key, CAST(o_orderdate AS TIMESTAMP) AS ts,
      |         o_custkey AS user_id,
      |         CASE WHEN o_orderkey % 7 = 3 THEN o_totalprice + 100
      |              ELSE o_totalprice END AS value
      |  FROM orders WHERE o_orderkey % 13 <> 2),
      |b AS (
      |  -- the batch-3 priority upsert RE-INSERTS keys batch 2 deleted:
      |  -- an ordinary row image out-batches the delete marker
      |  SELECT o_orderkey AS key,
      |         CASE WHEN o_orderkey % 5 = 1 THEN 'P9' ELSE o_orderpriority END AS prio
      |  FROM orders WHERE o_orderkey % 17 <> 5 OR o_orderkey % 5 = 1),
      |v AS (SELECT b.prio AS event_type, a.ts, a.user_id, a.value
      |      FROM a JOIN b USING (key))
      |SELECT event_type,
      |       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_v,
      |       MIN(value) AS min_v, MAX(value) AS max_v,
      |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |       TRUE AS within_5pct
      |FROM v GROUP BY event_type, day ORDER BY event_type, day""".stripMargin,
    headline = true) { (s, dir) =>
    val ord = Tables.load(s, dir, "orders")
    val a0 = ord.select(col("o_orderkey").as("key"), col("o_orderdate").as("ts"),
      col("o_custkey").as("user_id"), col("o_totalprice").as("value"))
    val b0 = ord.select(col("o_orderkey").as("key"), col("o_orderpriority").as("prio"))
    val keys = ord.select(col("o_orderkey").as("key"))
    // FRESH pipeline per execution (e_join_cdc_lifecycle's headline
    // discipline): the slot prices the composed CDC lifecycle — both
    // builds, three view CDC batches, three rollup corrections — not a
    // memoized fixture's final read
    val root = {
      val r = java.nio.file.Files.createTempDirectory("graft_jvcdc_ivm_").toString
      def feed(s2: org.apache.spark.sql.SparkSession, n: Int) =
        s2.read.parquet(s"$r/jv/view").filter(col("batch") === n)
          .select(col("prio").as("event_type"), col("ts"),
            col("value"), col("user_id"), col("sgn"))
      // the recompute's state source is DAY-PRUNED (r17 verdict #1): the
      // view is built with dayCol = "ts", so each correction asks
      // mergedForDays for exactly the affected days and the state read
      // scans only those pd= partitions, never the full kb=-bucketed view
      def state(s2: org.apache.spark.sql.SparkSession)(days: Seq[String]) =
        graft.operators.JoinView.mergedForDays(s2, s"$r/jv", days)
          .select(col("prio").as("event_type"), col("ts"),
            col("value"), col("user_id"))
      graft.operators.JoinView.build(a0, b0, "key", s"$r/jv", cdc = true,
        dayCol = "ts")
      AggIndex.build(feed(s, 0).drop("sgn"), s"$r/agg", cdc = true)
      // 1: fact-side value correction; 2: deletes on both sides;
      // 3: enrichment-side upsert that MOVES keys across rollup groups
      graft.operators.JoinView.ingestCdc(
        a0.filter(col("key") % 7 === 3).withColumn("value", col("value") + 100),
        b0.limit(0), "key", s"$r/jv")
      AggIndex.ingestCdc(feed(s, 1), null, s"$r/agg", batch = 1,
        stateForDays = state(s))
      graft.operators.JoinView.ingestCdc(a0.limit(0), b0.limit(0), "key", s"$r/jv",
        delA = keys.filter(col("key") % 13 === 2),
        delB = keys.filter(col("key") % 17 === 5))
      AggIndex.ingestCdc(feed(s, 2), null, s"$r/agg", batch = 2,
        stateForDays = state(s))
      graft.operators.JoinView.ingestCdc(a0.limit(0),
        b0.filter(col("key") % 5 === 1).select(col("key"), lit("P9").as("prio")),
        "key", s"$r/jv")
      AggIndex.ingestCdc(feed(s, 3), null, s"$r/agg", batch = 3,
        stateForDays = state(s))
      r
    }
    // gate: exact distinct recomputed from the corrected one-shot join
    val aCor = a0.filter(col("key") % 13 =!= 2)
      .withColumn("value",
        when(col("key") % 7 === 3, col("value") + 100).otherwise(col("value")))
    val bCor = b0.filter(col("key") % 17 =!= 5 || col("key") % 5 === 1)
      .withColumn("prio",
        when(col("key") % 5 === 1, lit("P9")).otherwise(col("prio")))
    val exact = aCor.join(bCor, Seq("key"))
      .groupBy(col("prio").as("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    AggIndex.merged(s, s"$root/agg").join(exact, Seq("event_type", "day"))
      .select(col("event_type"), col("day"), col("cnt"),
        round(col("sum_v"), 2).cast("double").as("sum_v"),
        col("min_v"), col("max_v"), col("exact_users"),
        (abs(col("users") - col("exact_users")).cast("double") <=
          col("exact_users").cast("double") * 0.05).as("within_5pct"))
      .orderBy("event_type", "day")
  }

  /** Additive layout evolution, oracled end to end (r17 verdict missing
    * #2): a v1 writer seeds the rollup, a NEW SKETCH COLUMN (distinct
    * values + its coverage count, [[AggIndex.CurrentLayout]] v2) arrives
    * with the next ingest — no rebuild, no backfill. The gate checks all
    * three contract halves: (a) pre-existing columns stay EXACT over
    * full history (the standard rollup columns vs the one-shot oracle);
    * (b) the new column's coverage count is exactly the post-evolution
    * slice; (c) its estimate is within 5% of the slice's exact distinct,
    * and NULL — never a measured-looking zero — where the slice is empty.
    */
  val e_agg_evolve: Query = q("e_agg_evolve",
    """WITH slice AS (
      |  SELECT event_type,
      |         strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
      |         COUNT(*) AS sc
      |  FROM events WHERE event_id % 2 = 1 GROUP BY 1, 2)
      |SELECT e.event_type,
      |       strftime(date_trunc('day', CAST(e.ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_v,
      |       MIN(e.value) AS min_v, MAX(e.value) AS max_v,
      |       CAST(COALESCE(MIN(s.sc), 0) AS BIGINT) AS since_cnt,
      |       TRUE AS vals_ok
      |FROM events e
      |LEFT JOIN slice s
      |  ON s.event_type = e.event_type
      | AND s.day = strftime(date_trunc('day', CAST(e.ts AS TIMESTAMP)), '%Y-%m-%d')
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    val p = java.nio.file.Files.createTempDirectory("graft_aggevolve_").toString
    AggIndex.build(ev.filter(col("event_id") % 2 === 0), p, schemaVersion = 1)
    AggIndex.ingest(ev.filter(col("event_id") % 2 === 1), p, batch = 1)
    val exact = ev.filter(col("event_id") % 2 === 1)
      .groupBy(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("value")).as("ex"))
    AggIndex.merged(s, p)
      .join(AggIndex.valueCardinalities(s, p), Seq("event_type", "day"))
      .join(exact, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), col("cnt"),
        round(col("sum_v"), 2).cast("double").as("sum_v"),
        col("min_v"), col("max_v"), col("since_cnt"),
        when(col("since_cnt") === 0, col("vals").isNull)
          .otherwise(abs(col("vals") - col("ex")) <=
            greatest(lit(1.0), col("ex") * 0.05)).as("vals_ok"))
      .orderBy("event_type", "day")
  }

  /** The composed CDC pipeline under DAY-LOCALIZED corrections — the
    * production cadence (late corrections land on recent days, not
    * uniformly over history) and the slot where the r18 pd= pruning is
    * VISIBLE: each of the three single-day correction batches asks
    * [[graft.operators.JoinView.mergedForDays]] for exactly one day, so
    * the recompute's state read scans ~1/PDB of the view instead of all
    * of it ([[e_pipeline_cdc]]'s changefeed touches every day by
    * construction — there the pruning is structurally a no-op and the
    * full-state recompute is the information-theoretic minimum). At a
    * production PDB (≈ day cardinality) this read is the affected day's
    * files alone — the recurring cost is O(day), not O(state).
    */
  val e_pipeline_cdc_local: Query = q("e_pipeline_cdc_local",
    """WITH a AS (
      |  SELECT o_orderkey AS key, CAST(o_orderdate AS TIMESTAMP) AS ts,
      |         o_custkey AS user_id,
      |         CASE WHEN o_orderdate >= DATE '1995-03-15'
      |                   AND o_orderdate < DATE '1995-03-18'
      |              THEN o_totalprice + 100 ELSE o_totalprice END AS value
      |  FROM orders),
      |v AS (SELECT o.o_orderpriority AS event_type, a.ts, a.user_id, a.value
      |      FROM a JOIN orders o ON a.key = o.o_orderkey)
      |SELECT event_type,
      |       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_v,
      |       MIN(value) AS min_v, MAX(value) AS max_v,
      |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |       TRUE AS within_5pct
      |FROM v GROUP BY event_type, day ORDER BY event_type, day""".stripMargin,
    headline = true) { (s, dir) =>
    val ord = Tables.load(s, dir, "orders")
    val a0 = ord.select(col("o_orderkey").as("key"), col("o_orderdate").as("ts"),
      col("o_custkey").as("user_id"), col("o_totalprice").as("value"))
    val b0 = ord.select(col("o_orderkey").as("key"), col("o_orderpriority").as("prio"))
    val days = Seq("1995-03-15", "1995-03-16", "1995-03-17")
    val root = {
      val r = java.nio.file.Files.createTempDirectory("graft_jvcdc_local_").toString
      def feed(n: Int) =
        s.read.parquet(s"$r/jv/view").filter(col("batch") === n)
          .select(col("prio").as("event_type"), col("ts"),
            col("value"), col("user_id"), col("sgn"))
      def state(ds: Seq[String]) =
        graft.operators.JoinView.mergedForDays(s, s"$r/jv", ds)
          .select(col("prio").as("event_type"), col("ts"),
            col("value"), col("user_id"))
      graft.operators.JoinView.build(a0, b0, "key", s"$r/jv", cdc = true,
        dayCol = "ts")
      AggIndex.build(feed(0).drop("sgn"), s"$r/agg", cdc = true)
      for ((d, i) <- days.zipWithIndex) {
        graft.operators.JoinView.ingestCdc(
          a0.filter(to_date(col("ts")) === lit(d))
            .withColumn("value", col("value") + 100),
          b0.limit(0), "key", s"$r/jv")
        AggIndex.ingestCdc(feed(i + 1), null, s"$r/agg", batch = i + 1,
          stateForDays = state)
      }
      r
    }
    val aCor = a0.withColumn("value",
      when(to_date(col("ts")).isin(days.map(d => d: Any): _*),
        col("value") + 100).otherwise(col("value")))
    val exact = aCor.join(b0, Seq("key"))
      .groupBy(col("prio").as("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    AggIndex.merged(s, s"$root/agg").join(exact, Seq("event_type", "day"))
      .select(col("event_type"), col("day"), col("cnt"),
        round(col("sum_v"), 2).cast("double").as("sum_v"),
        col("min_v"), col("max_v"), col("exact_users"),
        (abs(col("users") - col("exact_users")).cast("double") <=
          col("exact_users").cast("double") * 0.05).as("within_5pct"))
      .orderBy("event_type", "day")
  }

  /** Shared narrow projections for the 3-dim star cells: lineitem fact at
    * a synthetic unique pk = l_orderkey*8 + l_linenumber, deterministically
    * deduplicated by MIN per payload column — (l_orderkey, l_linenumber)
    * is NOT unique in this testdata (TESTDATA.md), and the CDC row-image
    * contract needs one row per pk. Dims: orders/part/supplier on three
    * distinct fact columns.
    */
  private def starSides(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val fact = Tables.load(s, dir, "lineitem")
      .groupBy((col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("pk"))
      .agg(min(col("l_orderkey")).as("l_orderkey"),
        min(col("l_partkey")).as("l_partkey"),
        min(col("l_suppkey")).as("l_suppkey"),
        min(col("l_quantity")).as("qty"))
    val dO = Tables.load(s, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority").as("prio"))
    val dP = Tables.load(s, dir, "part")
      .select(col("p_partkey").as("l_partkey"), col("p_brand").as("brand"))
    val dS = Tables.load(s, dir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"),
        col("s_nationkey").cast("long").as("snation"))
    (fact, dO, dP, dS)
  }

  private def starRollup(v: DataFrame): DataFrame =
    v.groupBy("prio", "brand", "snation")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("qty").cast("decimal(18,6)")), 2).cast("double").as("sum_qty"))
      .orderBy("prio", "brand", "snation")

  /** N-way (star) incremental join view, plain append mode (r17 verdict
    * missing #1): fact + THREE dims maintained as ONE persisted view
    * ([[graft.operators.StarView]]) — sides arrive in different batches
    * (incl. a dim arriving after facts that match it, and a batch where
    * several sides arrive at once), and the accumulated view must equal
    * the one-shot 3-way join. Chained binary [[graft.operators.JoinView]]s
    * would store both intermediates and commit each independently; the
    * star view has one ledger and k narrow key indexes instead.
    */
  val e_join3_maintain: Query = q("e_join3_maintain",
    """WITH l AS (
      |  SELECT l_orderkey*8 + l_linenumber AS pk, MIN(l_orderkey) AS l_orderkey,
      |         MIN(l_partkey) AS l_partkey, MIN(l_suppkey) AS l_suppkey,
      |         MIN(l_quantity) AS qty
      |  FROM lineitem GROUP BY 1)
      |SELECT o.o_orderpriority AS prio, p.p_brand AS brand,
      |       CAST(s.s_nationkey AS BIGINT) AS snation,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(ROUND(SUM(CAST(l.qty AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty
      |FROM l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN part p ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
    val (fact, dO, dP, dS) = starSides(s, dir)
    val p = java.nio.file.Files.createTempDirectory("graft_star3_").toString
    // slicing: facts over 3 batches, orders over 2, part at build,
    // supplier only in batch 1 — every later batch's dim term must pick
    // up earlier facts
    graft.operators.StarView.build(fact.filter(col("l_orderkey") % 3 === 0), "pk",
      Seq("l_orderkey" -> dO.filter(col("l_orderkey") % 2 === 0),
        "l_partkey" -> dP, "l_suppkey" -> dS.limit(0)), p)
    graft.operators.StarView.ingest(fact.filter(col("l_orderkey") % 3 === 1),
      Seq(dO.filter(col("l_orderkey") % 2 === 1), dP.limit(0), dS), p)
    graft.operators.StarView.ingest(fact.filter(col("l_orderkey") % 3 === 2),
      Seq(dO.limit(0), dP.limit(0), dS.limit(0)), p)
    starRollup(graft.operators.StarView.merged(s, p))
  }

  /** The star view under a full CDC op set — upserts on TWO dims in one
    * batch, a fact upsert + fact delete batch, and a dim-key delete that
    * evicts every joining fact row: the sign-resolved view must equal the
    * latest-state 3-way join after all of it. Headline: prices the fresh
    * n-way CDC lifecycle (build + 3 CDC batches + resolved rollup read).
    */
  val e_join3_cdc: Query = q("e_join3_cdc",
    """WITH l AS (
      |  SELECT l_orderkey*8 + l_linenumber AS pk, MIN(l_orderkey) AS l_orderkey,
      |         MIN(l_partkey) AS l_partkey, MIN(l_suppkey) AS l_suppkey,
      |         MIN(l_quantity) AS qty0
      |  FROM lineitem GROUP BY 1),
      |f AS (
      |  SELECT pk, l_orderkey, l_partkey, l_suppkey,
      |         CASE WHEN pk % 17 = 0 THEN qty0 + 5 ELSE qty0 END AS qty
      |  FROM l WHERE l_orderkey % 19 <> 3)
      |SELECT o.o_orderpriority AS prio,
      |       CASE WHEN p.p_partkey % 11 = 0 THEN 'BX' ELSE p.p_brand END AS brand,
      |       CAST(CASE WHEN s.s_suppkey % 13 = 0 THEN 999
      |            ELSE s.s_nationkey END AS BIGINT) AS snation,
      |       CAST(COUNT(*) AS BIGINT) AS cnt,
      |       CAST(ROUND(SUM(CAST(f.qty AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty
      |FROM f
      |JOIN orders o ON f.l_orderkey = o.o_orderkey
      |JOIN part p ON f.l_partkey = p.p_partkey
      |JOIN supplier s ON f.l_suppkey = s.s_suppkey
      |WHERE s.s_suppkey <> 7
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    headline = true) { (s, dir) =>
    val (fact, dO, dP, dS) = starSides(s, dir)
    val p = java.nio.file.Files.createTempDirectory("graft_star3cdc_").toString
    graft.operators.StarView.build(fact, "pk",
      Seq("l_orderkey" -> dO, "l_partkey" -> dP, "l_suppkey" -> dS), p, cdc = true)
    // batch 1: upserts on TWO dims at once — facts joining both are
    // recomputed exactly once
    graft.operators.StarView.ingestCdc(fact.limit(0),
      Seq(dO.limit(0),
        dP.filter(col("l_partkey") % 11 === 0).withColumn("brand", lit("BX")),
        dS.filter(col("l_suppkey") % 13 === 0)
          .withColumn("snation", lit(999L))), p)
    // batch 2: fact upserts AND fact deletes in one batch
    graft.operators.StarView.ingestCdc(
      fact.filter(col("pk") % 17 === 0 && col("l_orderkey") % 19 =!= 3)
        .withColumn("qty", col("qty") + 5),
      Seq(dO.limit(0), dP.limit(0), dS.limit(0)), p,
      factDeletes = fact.filter(col("l_orderkey") % 19 === 3).select("pk"))
    // batch 3: a dim-key delete — every lineitem of supplier 7 leaves
    graft.operators.StarView.ingestCdc(fact.limit(0),
      Seq(dO.limit(0), dP.limit(0), dS.limit(0)), p,
      dimDeletes = Seq(null, null,
        dS.filter(col("l_suppkey") === 7).select("l_suppkey")))
    starRollup(graft.operators.StarView.merged(s, p))
  }

  val all: Seq[Query] =
    Seq(e_funnel, e_retention, w_range_frame, e_gapfill, e_locf, e_agg_maintain,
      e_agg_quantile, e_agg_overlap, e_agg_topbucket, e_agg_asof, e_agg_forget,
      e_join_maintain, e_join_forget, e_join_asof, e_join_compact, e_pipeline_ivm,
      e_join_upsert, e_join_upsert_asof, e_join_upsert_fold,
      e_join_delete, e_join_delete_fold, e_join_cdc_lifecycle,
      e_rollup_cdc, e_rollup_cdc_asof, e_pipeline_cdc, e_pipeline_cdc_local,
      e_join3_maintain, e_join3_cdc, e_agg_evolve)
}
