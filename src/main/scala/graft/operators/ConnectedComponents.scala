package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by alternating large-star/small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
  * — the O(log n)-round replacement for plain min-label propagation, whose
  * round count is the component DIAMETER (a 100-link duplicate chain costs
  * 100 joins propagating, 8 contracting: 7 contraction rounds + 1
  * signature-unchanged round to confirm the fixed point; the returned round
  * count includes that confirmation round — see the measured dead-end note
  * in the loop for why no structural early-exit replaces it).
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
  * Convergence is detected from an order-insensitive edge-set signature
  * (count + XOR of xxhash64(u, v)) — one tiny aggregate per round, the only
  * driver interaction. localCheckpoint truncates lineage so round k's plan
  * does not embed rounds 1..k-1.
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
    */
  def label(pairs: DataFrame, maxRounds: Int = 48): (DataFrame, Int) = {
    val cols = pairs.columns
    require(cols.length == 2, s"pairs must have 2 columns, got ${cols.length}")
    // lazy checkpoint: the signature aggregate right below materializes it,
    // so canonicalization + signature are ONE job (eager would be two)
    var e = pairs
      .select(greatest(col(cols(0)), col(cols(1))).as("u"),
        least(col(cols(0)), col(cols(1))).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = false)
    var sig = signature(e)
    val spark = pairs.sparkSession
    // The contraction loop runs on the EDGE set, which is usually orders of
    // magnitude smaller than the corpus the session's shuffle-partition
    // count was sized for (sf0.1: 9k edges vs 5k docs x 7 bands x 2 join
    // sides; 100 TB: pair graphs are output-sized, not corpus-sized) — and
    // the loop pays that width ~6 exchanges per round, every round. Scale
    // the loop's shuffle width to the measured edge count (the initial
    // signature's count, ~100k edges per partition), never above the
    // session setting, and restore the setting on exit. Measured at sf0.1:
    // 4.1 s -> 2.6 s for the same 5 rounds.
    val spKey = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val sessionSp = spark.conf.get(spKey).toInt
    val sessionAqe = spark.conf.get(aqeKey)
    val loopSp = math.min(sessionSp, 1 + (sig._1 / 100000L).toInt)
    var rounds = 0
    var converged = false
    try {
      spark.conf.set(spKey, loopSp.toString)
      // loop shuffles are already sized (loopSp) and fixed-width; AQE's
      // per-stage materialize-and-replan adds a scheduling barrier to every
      // exchange of every round with nothing left to re-plan. Measured at
      // sf0.1 (round 7): AQE off in-loop tightened the warm spread
      // 3.3-6.5 s -> 3.6-4.3 s at equal-or-better median. (An earlier
      // round measured AQE-off 3x WORSE — but that was at the session's
      // sp=32 before loopSp existed, where AQE's coalescing was doing the
      // down-sizing this loop now does explicitly.)
      spark.conf.set(aqeKey, "false")
      while (!converged && rounds < maxRounds) {
        // lazy again: one job per round (contraction + signature).
        // MEASURED DEAD END (round 7, kept as a note): a structural
        // star-forest test (every u exactly once, no node both u and v)
        // can detect the fixed point one round early — a star forest maps
        // to itself under both stars — but every formulation pays a
        // per-round by-node shuffle (~0.3 s x rounds at sf0.1, whether as
        // a parallel aggregate branch + crossJoin barrier or fused into a
        // two-level signature aggregation) that exceeds the one saved
        // ~0.7 s round: 5.3-5.7 s vs 4.1 s median signature-only. The
        // signature's one-round lag is the cheaper convergence test.
        val next = smallStar(largeStar(e)).localCheckpoint(eager = false)
        val nextSig = signature(next)
        converged = nextSig == sig
        e = next
        sig = nextSig
        rounds += 1
      }
    } finally {
      spark.conf.set(spKey, sessionSp.toString)
      spark.conf.set(aqeKey, sessionAqe)
    }
    require(converged,
      s"connected components: star contraction did not converge within $rounds rounds")
    // fixed point = star forest: each non-root appears exactly once as u,
    // pointing at its component min; roots label themselves
    val leaves = e.select(col("u").as("id"), col("v").as("lab"))
    val roots = e.select(col("v")).distinct()
      .select(col("v").as("id"), col("v").as("lab"))
    (leaves.unionByName(roots), rounds)
  }

  /** (edge count, order-insensitive hash XOR) — the edge sets are distinct,
    * so XOR over per-edge hashes is set-determined; equal signatures on
    * unequal edge sets need a 64-bit collision (~2^-64, accepted; the cap
    * still bounds any pathological loop). XOR, not SUM: ANSI mode makes a
    * long hash sum an overflow error.
    */
  private def signature(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).first()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
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
    * plus the round's single distinct.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val byU = e.repartition(col("u"))
    val m = byU.groupBy("u").agg(min(col("v")).as("m"))
    val relinked = byU.join(m, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val self = m.select(col("u"), col("m").as("v"))
    relinked.unionAll(self).distinct()
  }
}
