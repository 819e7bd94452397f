package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Connected components by alternating large-star/small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
  * — the O(log n)-round replacement for plain min-label propagation, whose
  * round count is the component DIAMETER (a 100-link duplicate chain costs
  * 100 joins propagating vs 7 contraction rounds here). Rounds run in
  * BATCHES of two per convergence check, so the returned round count is
  * even (the chain converges with rounds = 8: 7 contracting, rounded up).
  *
  * Edges live canonically as (u, v) with u > v. Per round:
  *   large-star: every node links its strictly-larger neighbors to the
  *     minimum of its neighborhood (including itself);
  *   small-star: every node links its smaller neighbors (and itself) to the
  *     minimum of those.
  * Both halves are one groupBy(min) + one equi-join — the same shuffle shape
  * as a propagation round, so the 100 TB cost model is unchanged; only the
  * round count drops. The fixed point is a star forest rooted at each
  * component's minimum node, from which labels read off directly.
  *
  * Convergence is detected STRUCTURALLY: a relation is the fixed point iff
  * it IS a star forest (each u exactly once, no node on both sides) — a
  * star forest maps to itself under both stars, and the alternation
  * strictly decreases the Kiveris potential until it reaches one. One
  * by-node aggregate per batch is the only driver interaction; it replaces
  * the earlier edge-set-signature equality test, which (a) needed a spare
  * confirming batch after the fixed point, (b) rested on the
  * no-period-2-cycles property — a cycling edge set would have passed
  * silently — and (c) still needed a separate post-loop forest audit to
  * fail loudly on that. The structural test is the audit, runs one batch
  * fewer, and converts any non-contracting pathology into the maxRounds
  * require. localCheckpoint truncates lineage so round k's plan does not
  * embed rounds 1..k-1.
  */
object ConnectedComponents {

  /** Label every node reachable from `pairs` (two columns, any names) with
    * its component's minimum node id. Returns (labels(id, lab), rounds).
    * Fails loudly at the round cap — partial labels are silently wrong
    * clusters (log2 of any real component count fits long before 48).
    *
    * Contract: nodes appearing ONLY in self-pairs (u == v) have no edges
    * after canonicalization and are excluded from the output — every
    * labeled node has at least one distinct neighbor. Callers feeding
    * near-dup pairs (id_a < id_b by construction) are unaffected; union in
    * self-labels for isolated ids if you need total coverage.
    *
    * HYBRID (r11): a canonical edge set at or below `smallGraphEdges`
    * (long-typed endpoints) is closed DRIVER-SIDE by union-find and
    * returned with rounds = 0. This is a BOUNDED collect by an explicit
    * budget — 2^20 edges is ~16 MB of rows and ~100 MB of union-find state
    * — not a scale escape hatch: near-dup pair graphs are OUTPUT-sized
    * (sf0.1: 9,150 edges for a 60 GB-scale corpus slice), and at that size
    * the distributed loop's cost is pure SCHEDULING — each 2-round batch
    * is ~8 sequential single-partition exchanges moving kilobytes, ~2.3 s
    * of stage barriers for work union-find closes in microseconds
    * (measured r11; the slot had crept 1.85 -> 2.7 s purely on barrier
    * latency under load). Above the budget the contraction loop runs
    * unchanged — THAT is the 100 TB path, and the budget is the honest
    * boundary between "graph fits one driver page" and "graph needs a
    * cluster". Parity hybrid == loop is spec-pinned on random graphs.
    */
  def label(pairs: DataFrame, maxRounds: Int = 48,
            smallGraphEdges: Long = 1L << 20): (DataFrame, Int) = {
    val cols = pairs.columns
    require(cols.length == 2, s"pairs must have 2 columns, got ${cols.length}")
    val caller = pairs.sparkSession
    // lazy checkpoint: the forest-stats aggregate right below materializes
    // it, so canonicalization + stats are ONE job (eager would be two) —
    // run under the CALLER's conf, because this step consumes the
    // corpus-sized pair feed the caller's shuffle width was sized for
    // The feed distinct stays: a banded pair generator emits a pair once
    // per colliding band (<= 7x here), and folding that ONCE in this wide
    // exchange beats carrying 7x rows through the loop's first batch (two
    // more exchanges) — measured neutral at sf0.1, clearly better shuffled
    // volume at scale (7E once + E onward vs 14E through round 1).
    val canonical = pairs
      .select(greatest(col(cols(0)), col(cols(1))).as("u"),
        least(col(cols(0)), col(cols(1))).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = false)
    // one job: the count materializes the checkpoint and sizes loopSp. A
    // NARROW aggregate on purpose — running forestStats here would add a
    // by-node exchange (and, under the caller's AQE, a job barrier) to
    // every call just to early-exit the rare already-forest input; that
    // shape instead converges at the loop's first structural check, paying
    // two cheap loopSp-width batches. Empty input needs no loop at all.
    val edgeCount = canonical.count()
    if (edgeCount == 0L) return (readOff(canonical), 0)
    val longTyped = canonical.schema.fields
      .forall(_.dataType == org.apache.spark.sql.types.LongType)
    if (longTyped && edgeCount <= smallGraphEdges)
      return (labelSmall(caller, canonical), 0)
    // The contraction loop runs on the EDGE set, which is usually orders of
    // magnitude smaller than the corpus (sf0.1: 9k edges vs 5k docs x 7
    // bands x 2 join sides; 100 TB: pair graphs are output-sized, not
    // corpus-sized) — and the loop pays the configured shuffle width ~4
    // exchanges per round, every round. Run the loop in a FORKED session
    // (same SparkContext and RDDs, isolated SQLConf): the loop-local
    // shuffle width and AQE setting cannot leak into — or be corrupted by —
    // anything else running on the caller's session, where the previous
    // set/restore-the-shared-conf approach broke under any concurrency.
    // Session hops are PLAN-level (Bridge.ofRows over the checkpointed
    // LogicalRDD) — no row conversion, no extra pass.
    //  - loopSp: edge-count-sized width (~100k edges per partition), never
    //    above the caller's setting. Measured: 4.1 s -> 2.6 s at sf0.1.
    //  - AQE off: loop shuffles are already sized and fixed-width; AQE's
    //    per-stage materialize-and-replan adds a scheduling barrier per
    //    exchange per round with nothing left to re-plan. Measured at
    //    sf0.1 (round 7): warm spread 3.3-6.5 s -> 3.6-4.3 s at
    //    equal-or-better median. (An earlier round saw AQE-off 3x WORSE —
    //    at sp=32 before loopSp existed, where AQE's coalescing was doing
    //    the down-sizing the loop now does explicitly.)
    val loopSp = math.min(caller.conf.get("spark.sql.shuffle.partitions").toInt,
      1 + (edgeCount / 100000L).toInt)
    // one cached fork per caller session: newSession() builds a fresh
    // SessionState (analyzer, optimizer, injected extensions) — measured
    // ~0.5 s per call if re-created per invocation. The fork's conf is
    // still per-call (loopSp), so concurrent label() calls SERIALIZE on
    // the fork's monitor — a documented contract, vs the silent conf
    // corruption mutating the shared caller session risked.
    val fork = loopSession(caller)
    val (eFinal, rounds) = fork.synchronized {
      fork.conf.set("spark.sql.shuffle.partitions", loopSp.toString)
      fork.conf.set("spark.sql.adaptive.enabled", "false")
      // no broadcasts inside the loop: the m-aggregate is derived from the
      // SAME explicit repartition that feeds the join probe, so a shuffled
      // hash join is ZERO-exchange (co-partitioned) — while a broadcast
      // join pays a separate collect-and-broadcast JOB per star per round
      // (4 scheduling barriers per batch, the dominant cost at loop scale).
      fork.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      fork.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      runLoop(Bridge.ofRows(fork, Bridge.analyzed(canonical)), maxRounds)
    }
    // The final edge set is a checkpointed LogicalRDD, so hand it back at
    // the PLAN level and build the label read-off in the caller's session —
    // downstream joins and the read-off's own distinct plan run under the
    // caller's conf. (MEASURED DEAD END, r9: eagerly materializing the
    // read-off in the fork instead — one cheap fixed-width job, flat
    // LogicalRDD to the caller — ran ~0.4 s SLOWER at sf0.1: the extra
    // job barrier costs more than the saved caller-side distinct exchange,
    // which fuses into the consumer's own job anyway.)
    (readOff(Bridge.ofRows(caller, Bridge.analyzed(eFinal))), rounds)
  }

  /** Driver-side closure of a small canonical edge set: union-find with
    * path compression, union-by-MIN (the smaller root becomes parent, so
    * every root only ever decreases and the final root IS the component
    * minimum — the same label the contraction fixed point reads off).
    * Output schema and node coverage match [[readOff]] exactly.
    */
  private def labelSmall(spark: org.apache.spark.sql.SparkSession,
                         canonical: DataFrame): DataFrame = {
    val edges = canonical.collect() // bounded by smallGraphEdges (caller)
    val parent = new java.util.HashMap[Long, Long](edges.length * 2)
    def find(x0: Long): Long = {
      var r = x0
      while (parent.get(r) != r) r = parent.get(r)
      var c = x0
      while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    var i = 0
    while (i < edges.length) {
      val u = edges(i).getLong(0); val v = edges(i).getLong(1)
      if (!parent.containsKey(u)) parent.put(u, u)
      if (!parent.containsKey(v)) parent.put(v, v)
      val ru = find(u); val rv = find(v)
      if (ru != rv) {
        if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv)
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val it = parent.keySet().iterator()
    while (it.hasNext) { val id = it.next(); out += ((id, find(id))) }
    spark.createDataFrame(out.toSeq).toDF("id", "lab")
  }

  /** Labels from a star forest: each non-root appears exactly once as u,
    * pointing at its component min; roots label themselves.
    */
  private def readOff(forest: DataFrame): DataFrame = {
    val leaves = forest.select(col("u").as("id"), col("v").as("lab"))
    val roots = forest.select(col("v")).distinct()
      .select(col("v").as("id"), col("v").as("lab"))
    leaves.unionByName(roots)
  }

  /** One cached fork per caller session, WEAKLY keyed: a strong map would
    * pin every caller session (and its fork's SessionState) for the JVM
    * lifetime in session-churning hosts. WeakHashMap drops the entry when
    * the caller becomes unreachable; the value holds no strong reference
    * back to the key (the fork references the shared SparkContext, not the
    * caller session), so entries are collectable. Synchronized: the
    * per-call conf writes serialize concurrent label() calls on the fork's
    * monitor anyway (documented contract below).
    */
  private val forkCache =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      org.apache.spark.sql.SparkSession]()

  private def loopSession(caller: org.apache.spark.sql.SparkSession) =
    forkCache.synchronized {
      var fork = forkCache.get(caller)
      if (fork == null) { fork = caller.newSession(); forkCache.put(caller, fork) }
      fork
    }

  /** The contraction loop proper; runs entirely in the fork session. */
  private def runLoop(e0: DataFrame, maxRounds: Int): (DataFrame, Int) = {
    var e = e0
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      // TWO contraction rounds per convergence check; the inner round skips
      // its closing distinct (duplicates pass 1:1 through both stars — no
      // join multiplies them — and the batch-final distinct restores set
      // semantics before the check). At loop scale the cost model is
      // scheduling barriers, not data: batching halves the check jobs
      // and their collect barriers (measured with the no-broadcast conf
      // above: sf0.1 median 4.9 -> 3.3 s under one load window).
      // HISTORY: rounds 7-8 used an edge-set-signature equality check
      // (count + xxhash64 XOR) with the structural test rejected as a
      // per-ROUND tax (~0.3 s x rounds > the one saved round). Both
      // premises changed in round 9: the check runs per BATCH (half as
      // often), and soundness now requires the structural test anyway
      // (signature equality rested on the no-period-2-cycles property and
      // needed a separate post-loop forest audit to fail loudly) — at
      // which point the structural test as THE convergence check is
      // strictly better: it detects the fixed point the batch it forms
      // (signature equality needs a spare confirming batch to see "no
      // change"), so the loop runs a whole batch fewer, and a
      // non-contracting pathology hits the maxRounds require instead of
      // silently mislabeling. Measured at sf0.1: 6 -> 4 rounds, loop
      // ~2.9 s -> ~2.2 s.
      // the inner round STILL lazily checkpoints: localCheckpoint replaces
      // the logical plan with a flat LogicalRDD immediately (materialization
      // stays lazy), which is what keeps the batch tree bounded — composing
      // two contractions as ONE unmaterialized DataFrame duplicates the
      // inner tree once per consumer (dir's union x the m/join branches),
      // 144 scan leaves after two rounds, and ReuseExchange stops finding
      // anything (measured: 4-6 s per batch vs 0.5 s per round). The inner
      // checkpoint materializes inside the same stats job as the outer
      // one, so the batch still costs ONE job.
      val mid = smallStar(largeStar(e), dedupe = false).localCheckpoint(eager = false)
      val next = smallStar(largeStar(mid)).localCheckpoint(eager = false)
      e = next
      rounds += 2
      // first check at round 4: one-batch convergence is the already-a-
      // forest case the pre-loop check catches, so a round-2 stats job is
      // almost always wasted. (Measured on the sf0.1 simhash graph, r9:
      // 9,150 edges include a 2,251-node giant component; after one batch
      // the relation still has 562 forest violations — a round-2 check
      // would pay its stats job on every call and pass ~never.) An unchecked batch stays LAZY (its
      // checkpoints replace the plan immediately but materialize inside
      // the next stats job), so skipping the check removes a whole job
      // barrier and an aggregate, not just the aggregate.
      if (rounds >= 4 || rounds >= maxRounds)
        converged = forestViolations(e) == 0L
    }
    require(converged,
      s"connected components: star contraction did not converge within $rounds rounds")
    (e, rounds)
  }

  /** Star-forest violation count, ONE aggregate job. A relation is the
    * contraction fixed point iff it is a star forest: each u exactly once
    * (one parent per non-root) and no node on both sides (an internal
    * node would chain labels through the read-off). The count is exact —
    * no hashing, no collision caveat — so a zero is a PROOF the
    * read-off's preconditions hold, and the loop's convergence claim
    * never rests on dynamics alone.
    */
  private def forestViolations(e: DataFrame): Long = {
    val perNode = e.select(col("u").as("n"), lit(1L).as("cu"), lit(0L).as("cv"))
      .unionAll(e.select(col("v").as("n"), lit(0L).as("cu"), lit(1L).as("cv")))
      .groupBy("n").agg(sum("cu").as("cu"), sum("cv").as("cv"))
    perNode.agg(
      count(when(col("cu") > 1 || (col("cu") > 0 && col("cv") > 0), 1))).first().getLong(0)
  }

  /** Γ(x) seen from BOTH endpoints; each strictly-larger neighbor y of x is
    * re-pointed at m = min(Γ(x) ∪ {x}). Emitted edges keep u > v because
    * y > x >= m.
    *
    * ONE exchange: the explicit repartition on x feeds both the min
    * aggregate and the join probe side — the aggregate preserves
    * HashPartitioning(x) so the join is co-partitioned with no further
    * shuffle (the naive groupBy-then-join plan paid two exchanges of `dir`
    * here, and the loop pays its exchange count every round). No distinct
    * either: output is one row per dir row with y > x (duplicates do not
    * multiply), smallStar's closing distinct restores set semantics before
    * the round signature.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val dir = e.select(col("u").as("x"), col("v").as("y"))
      .unionAll(e.select(col("v").as("x"), col("u").as("y")))
      .repartition(col("x"))
    val m = dir.groupBy("x").agg(least(min(col("y")), col("x")).as("m"))
    dir.join(m, "x")
      .filter(col("y") > col("x"))
      .select(col("y").as("u"), col("m").as("v"))
  }

  /** Each node x re-points its smaller neighbors (and itself) at the minimum
    * of those; canonical edges mean "smaller neighbors of x" is exactly the
    * v-side of x's u-edges. Same one-exchange co-partitioning as largeStar,
    * plus the round's single distinct — elided (`dedupe = false`) for the
    * inner round of a batch, where the batch-final distinct collapses the
    * bounded (non-multiplying) duplicates instead.
    */
  private def smallStar(e: DataFrame, dedupe: Boolean = true): DataFrame = {
    val byU = e.repartition(col("u"))
    val m = byU.groupBy("u").agg(min(col("v")).as("m"))
    val relinked = byU.join(m, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val self = m.select(col("u"), col("m").as("v"))
    val out = relinked.unionAll(self)
    if (dedupe) out.distinct() else out
  }
}
