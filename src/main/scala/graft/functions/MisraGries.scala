package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items ("heavy hitters") sketch: k counters summarize
  * an arbitrarily long stream with the deterministic guarantee
  *
  *   exact - n/(k+1) <= estimate <= exact      (n = stream length)
  *
  * for EVERY item — items absent from the summary estimate 0, which the same
  * bound covers (absence implies exact <= n/(k+1)). Any item with frequency
  * above n/(k+1) is guaranteed present.
  *
  * Mergeability (what makes it a Spark plan, not a streaming trick) follows
  * Agarwal et al., "Mergeable Summaries" (PODS'12, §3.1): sum the two
  * summaries' counters, and if more than k survive, subtract the (k+1)-th
  * largest counter value from all and drop the non-positive — the combined
  * error telescopes, so the merged summary obeys the SAME n/(k+1) bound for
  * the union stream. Spark therefore plans the UDAF with map-side partial
  * aggregation: each task reduces its slice to k counters before the
  * exchange, the shuffle carries O(k * tasks) rows, and no global
  * per-item aggregation ever happens — the 100 TB plan for "what are the
  * frequent values", vs the exact path's full groupBy over every distinct
  * item.
  *
  * The estimates themselves are partition-order-dependent (any MG variant's
  * are); the BOUND is not. Differential contracts should therefore
  * hash-check exact counts and gate the sketch with the bound, mirroring
  * q32/q33's sketch-tolerance pattern.
  */
object MisraGries {

  /** Summary as a sorted association list (stable output ordering). */
  type Summary = Map[String, Long]

  final class MisraGriesAgg(k: Int) extends Aggregator[String, Summary, Summary] {
    require(k > 0, "misra-gries: k must be positive")

    override def zero: Summary = Map.empty

    override def reduce(b: Summary, item: String): Summary =
      b.get(item) match {
        case Some(c) => b.updated(item, c + 1)
        case None if b.size < k => b.updated(item, 1L)
        case None =>
          // classic MG decrement step: the new item and one unit of every
          // counter cancel out (k+1 distinct items observed once each)
          b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }

    override def merge(x: Summary, y: Summary): Summary = {
      val summed = y.foldLeft(x) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (summed.size <= k) summed
      else {
        // subtract the (k+1)-th largest counter from all, drop non-positive
        val kth = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
        summed.view.mapValues(_ - kth).filter(_._2 > 0).toMap
      }
    }

    override def finish(b: Summary): Summary = b

    override def bufferEncoder: Encoder[Summary] = ExpressionEncoder[Summary]()
    override def outputEncoder: Encoder[Summary] = ExpressionEncoder[Summary]()
  }

  /** Second-order aggregator: merge STORED summaries (e.g. per-batch rollup
    * partials — [[graft.operators.AggIndex]]) into one summary per group.
    * Same Agarwal et al. merge as [[MisraGriesAgg.merge]], so the merged
    * summary obeys the n/(k+1) bound for the union stream — the property
    * that makes a persisted MG column answerable by merge-on-read.
    */
  final class MisraGriesMergeAgg(k: Int) extends Aggregator[Summary, Summary, Summary] {
    private val inner = new MisraGriesAgg(k)
    override def zero: Summary = Map.empty
    // typed Aggregators see null input rows as null (unlike built-in aggs,
    // which skip them) — a CDC empty-replacement partial carries typed-null
    // sketches ([[graft.operators.AggIndex.ingestCdc]]), so skip explicitly
    override def reduce(b: Summary, in: Summary): Summary =
      if (in == null) b else inner.merge(b, in)
    override def merge(x: Summary, y: Summary): Summary = inner.merge(x, y)
    override def finish(b: Summary): Summary = b
    override def bufferEncoder: Encoder[Summary] = ExpressionEncoder[Summary]()
    override def outputEncoder: Encoder[Summary] = ExpressionEncoder[Summary]()
  }
}
