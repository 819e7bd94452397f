package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (the `Aggregator[IN, BUF, OUT]` axis of SURVEY §2.2): the
  * element-wise mean of a vector column — per-label centroids of the
  * embeddings table.
  *
  * Mergeable by construction (partial sums + count), so Spark plans it as a
  * partial aggregation: each task emits one (sum vector, n) per group and
  * only those merge across the shuffle — at 100 TB the shuffle carries
  * K x dim doubles per task, never rows. This is also exactly the shape
  * k-means M-steps / embedding-pool reducers need.
  */
final case class VecMeanBuf(var sum: Array[Double], var n: Long)

object VecMeanAgg extends Aggregator[Seq[Float], VecMeanBuf, Seq[Double]] {

  override def zero: VecMeanBuf = VecMeanBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: VecMeanBuf, a: Seq[Float]): VecMeanBuf = {
    if (b.sum.length == 0) b.sum = new Array[Double](a.length)
    // fail loudly on ragged input: silently truncating to the first-seen
    // length would make output depend on partition/reduce order — the
    // non-determinism this aggregate family must never have
    require(a.length == b.sum.length,
      s"ragged embedding: got dim ${a.length}, expected ${b.sum.length}")
    var i = 0
    while (i < b.sum.length) { b.sum(i) += a(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(x: VecMeanBuf, y: VecMeanBuf): VecMeanBuf = {
    if (x.sum.length == 0) y
    else if (y.sum.length == 0) x
    else {
      require(x.sum.length == y.sum.length,
        s"ragged partials: dims ${x.sum.length} vs ${y.sum.length}")
      var i = 0
      while (i < x.sum.length) { x.sum(i) += y.sum(i); i += 1 }
      x.n += y.n
      x
    }
  }

  override def finish(b: VecMeanBuf): Seq[Double] =
    if (b.n == 0) Seq.empty else b.sum.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

/** Fixed-point element-wise vector SUM on the 2^20 lattice — the
  * DETERMINISTIC twin of [[VecMeanAgg]]: each component is quantized to
  * floor(v * 2^20 + 0.5) (exact in doubles for any float32 input — the
  * scale is a power of two, so v*2^20 and the +0.5 are exact, and both
  * engines' FLOOR agree bit for bit), then summed as LONGs — associative,
  * commutative, overflow-free up to ~2^43 rows — so the aggregate is
  * independent of partitioning and reduce order, which a double sum is
  * not (an order-flipped last ulp under ROUND is exactly how
  * s_label_centroid's sf0.1 hash diverged). Same mergeable partial-agg
  * shape as VecMeanAgg: the shuffle carries K x dim longs per task.
  */
final case class VecFixedBuf(var sum: Array[Long])

object VecFixedSumAgg extends Aggregator[Seq[Float], VecFixedBuf, Seq[Long]] {
  val Scale: Long = 1L << 20

  override def zero: VecFixedBuf = VecFixedBuf(Array.emptyLongArray)

  override def reduce(b: VecFixedBuf, a: Seq[Float]): VecFixedBuf = {
    if (b.sum.length == 0) b.sum = new Array[Long](a.length)
    // loud on ragged input — see VecMeanAgg.reduce: truncation would
    // reintroduce reduce-order dependence into the DETERMINISM contract
    require(a.length == b.sum.length,
      s"ragged embedding: got dim ${a.length}, expected ${b.sum.length}")
    var i = 0
    while (i < b.sum.length) {
      b.sum(i) += math.floor(a(i).toDouble * Scale.toDouble + 0.5).toLong
      i += 1
    }
    b
  }

  override def merge(x: VecFixedBuf, y: VecFixedBuf): VecFixedBuf = {
    if (x.sum.length == 0) y
    else if (y.sum.length == 0) x
    else {
      require(x.sum.length == y.sum.length,
        s"ragged partials: dims ${x.sum.length} vs ${y.sum.length}")
      var i = 0
      while (i < x.sum.length) { x.sum(i) += y.sum(i); i += 1 }
      x
    }
  }

  override def finish(b: VecFixedBuf): Seq[Long] = b.sum.toSeq

  override def bufferEncoder: Encoder[VecFixedBuf] = Encoders.product[VecFixedBuf]
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
