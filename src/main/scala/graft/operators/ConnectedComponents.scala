package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by alternating large-star/small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
  * — the O(log n)-round replacement for plain min-label propagation, whose
  * round count is the component DIAMETER (a 100-link duplicate chain costs
  * 100 joins propagating, ~7 contracting).
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
  * (count + sum of xxhash64(u, v)) — one tiny aggregate per round, the only
  * driver interaction. localCheckpoint truncates lineage so round k's plan
  * does not embed rounds 1..k-1.
  */
object ConnectedComponents {

  /** Label every node reachable from `pairs` (two columns, any names) with
    * its component's minimum node id. Returns (labels(id, lab), rounds).
    * Fails loudly at the round cap — partial labels are silently wrong
    * clusters (log2 of any real component count fits long before 48).
    */
  def label(pairs: DataFrame, maxRounds: Int = 48): (DataFrame, Int) = {
    val cols = pairs.columns
    require(cols.length == 2, s"pairs must have 2 columns, got ${cols.length}")
    var e = pairs
      .select(greatest(col(cols(0)), col(cols(1))).as("u"),
        least(col(cols(0)), col(cols(1))).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var sig = signature(e)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val nextSig = signature(next)
      converged = nextSig == sig
      e = next
      sig = nextSig
      rounds += 1
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
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val dir = e.select(col("u").as("x"), col("v").as("y"))
      .unionAll(e.select(col("v").as("x"), col("u").as("y")))
    val m = dir.groupBy("x").agg(least(min(col("y")), col("x")).as("m"))
    dir.join(m, "x")
      .filter(col("y") > col("x"))
      .select(col("y").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Each node x re-points its smaller neighbors (and itself) at the minimum
    * of those; canonical edges mean "smaller neighbors of x" is exactly the
    * v-side of x's u-edges.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy("u").agg(min(col("v")).as("m"))
    val relinked = e.join(m, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val self = m.select(col("u"), col("m").as("v"))
    relinked.unionAll(self).distinct()
  }
}
