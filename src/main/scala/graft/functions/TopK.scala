package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k-per-key aggregation.
  *
  * The usual formulation — `row_number() OVER (PARTITION BY key ORDER BY ord
  * DESC) <= k` (q14_window_rank's shape) — shuffles EVERY row to its key's
  * partition and fully sorts there: O(n) shuffle, O(n log n) sort, for an
  * output of k rows per key. This Aggregator keeps a bounded k-element
  * buffer per key and is MERGEABLE, so Spark plans it with map-side partial
  * aggregation: each input task reduces its slice to <= k rows per local
  * key before the exchange, the shuffle carries O(k * keys * tasks) rows
  * instead of O(n), and no partition-wide sort ever happens. At 100 TB with
  * small k this is the difference between a job-dominating sort-shuffle and
  * a near-map-only plan.
  *
  * Determinism: total order (ord DESC, id ASC) — ties cannot reorder.
  */
object TopK {

  final case class OrdRow(ord: Double, id: Long)

  /** Descending by ord, ascending id tie-break. */
  private val ordering: Ordering[OrdRow] =
    Ordering.by((r: OrdRow) => (-r.ord, r.id))

  final class TopKAgg(k: Int) extends Aggregator[OrdRow, Seq[OrdRow], Seq[OrdRow]] {
    override def zero: Seq[OrdRow] = Vector.empty

    override def reduce(b: Seq[OrdRow], a: OrdRow): Seq[OrdRow] =
      if (b.size < k) (b :+ a).sorted(ordering)
      else if (ordering.lt(a, b.last)) (b.init :+ a).sorted(ordering)
      else b

    override def merge(x: Seq[OrdRow], y: Seq[OrdRow]): Seq[OrdRow] =
      (x ++ y).sorted(ordering).take(k)

    override def finish(b: Seq[OrdRow]): Seq[OrdRow] = b

    override def bufferEncoder: Encoder[Seq[OrdRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[OrdRow]]()
    override def outputEncoder: Encoder[Seq[OrdRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[OrdRow]]()
  }
}
