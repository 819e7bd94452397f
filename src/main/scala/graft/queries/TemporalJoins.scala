package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, RangeJoin}
import graft.tables.Tables

/** Temporal join operators (as-of, point-in-interval) under the DuckDB
  * differential gate. These are the canonical "operators Spark lacks"
  * (builder brief): each is implemented as a composition of built-in
  * shuffle-friendly primitives (see [[graft.operators.AsofJoin]] /
  * [[graft.operators.RangeJoin]] for the scale rationale) and verified
  * against DuckDB's native ASOF JOIN / theta-join semantics.
  */
object TemporalJoins {

  private def q(name: String, oracle: String, headline: Boolean = false)(
      body: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Query =
    Query(name, body, Some(oracle), headline)

  /** For each click event, the user's most recent purchase at or before it.
    * The oracle is DuckDB's NATIVE ASOF LEFT JOIN — the engine's
    * union-and-carry-forward plan must reproduce it exactly (including
    * clicks with no preceding purchase -> NULLs, and purchases at the
    * identical timestamp being visible).
    */
  val q26_asof_join: Query = q("q26_asof_join",
    """WITH p AS (SELECT user_id, ts, MAX(value) AS purch_value FROM events
      |           WHERE event_type = 'purchase' GROUP BY user_id, ts),
      |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
      |SELECT c.event_id, c.user_id, strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts,
      |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purch_ts,
      |       ROUND(p.purch_value, 2) AS purch_value
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.event_id""".stripMargin, headline = true) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    // build side unique per (user, ts): the as-of contract
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max(col("value")).as("purch_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    AsofJoin.leftAsof(clicks, purchases, "user_id", "ts", Seq("purch_value"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        date_format(col("asof.ts"), "yyyy-MM-dd HH:mm:ss").as("purch_ts"),
        round(col("asof.purch_value"), 2).as("purch_value"))
      .orderBy("event_id")
  }

  /** The SAME as-of semantics through the native custom operator
    * ([[graft.plans.AsofJoinNative]]: logical node + strategy + sort-merge
    * AsofJoinExec) under the SAME DuckDB native-ASOF oracle as
    * [[q26_asof_join]]. Two independent implementations of one contract:
    * the rewrite proves the semantics are expressible in built-ins, the
    * operator proves the engine can extend Catalyst end-to-end — and each
    * differentially checks the other.
    */
  val q26b_asof_native: Query = q("q26b_asof_native",
    """WITH p AS (SELECT user_id, ts, MAX(value) AS purch_value FROM events
      |           WHERE event_type = 'purchase' GROUP BY user_id, ts),
      |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
      |SELECT c.event_id, c.user_id, strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts,
      |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purch_ts,
      |       ROUND(p.purch_value, 2) AS purch_value
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.event_id""".stripMargin, headline = true) { (s, dir) =>
    val ev = Tables.load(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max(col("value")).as("purch_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    graft.plans.AsofJoinNative.leftAsof(clicks, purchases, "user_id", "ts",
        Seq("purch_value"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("purch_ts"),
        round(col("purch_value"), 2).as("purch_value"))
      .orderBy("event_id")
  }

  /** Lineitems shipped inside 7-day windows opened by a sample of orders —
    * a genuine no-equi-key range join (the windows are unrelated to the
    * lineitems' order keys), executed as the bucketed equi-join plan.
    */
  val q27_range_join: Query = q("q27_range_join",
    """WITH iv AS (SELECT o_orderkey AS window_id, o_orderdate AS lo,
      |            o_orderdate + INTERVAL 7 DAY AS hi
      |            FROM orders WHERE o_orderkey % 1000 = 0)
      |SELECT iv.window_id, COUNT(*) AS cnt, ROUND(SUM(l.l_quantity), 2) AS qty
      |FROM iv JOIN lineitem l ON l.l_shipdate >= iv.lo AND l.l_shipdate < iv.hi
      |GROUP BY iv.window_id ORDER BY iv.window_id""".stripMargin,
    headline = true) { (s, dir) =>
    val iv = Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") % 1000 === 0)
      .select(col("o_orderkey").as("window_id"), col("o_orderdate").as("lo"),
        (col("o_orderdate") + expr("INTERVAL 7 DAY")).as("hi"))
    val pts = Tables.load(s, dir, "lineitem").select("l_shipdate", "l_quantity")
    RangeJoin.pointsInIntervals(pts, "l_shipdate", iv, "lo", "hi")
      .groupBy("window_id")
      .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("qty"))
      .orderBy("window_id")
  }

  val all: Seq[Query] = Seq(q26_asof_join, q26b_asof_native, q27_range_join)
}
