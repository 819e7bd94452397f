package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** IVF (inverted-file) ANN index with a k-means-trained coarse quantizer —
  * the trained upgrade of the s_ann_ivf query's deterministic-stub codebook.
  *
  * Training is spherical Lloyd iterations on a bounded, hash-chosen sample,
  * driver-side: a codebook is a small parameter artifact (K x dim doubles)
  * in real ANN systems too. What must stay distributed is assignment and
  * search, and both are: assignment is a per-row argmax against broadcast
  * centroid literals (no shuffle, no training data rehandled), probe-time
  * work is nProbe/K of the corpus via an equi-join on the assigned list id.
  *
  * Deterministic by construction: the sample is the sampleCap smallest
  * xxhash64(id) rows (TakeOrdered — bounded driver memory), init is the
  * first K sample vectors, the iteration count is fixed, argmax ties go to
  * the smaller centroid id, and empty clusters keep their previous
  * centroid. k-means training is not SQL-expressible, so this index is
  * evidence-tested (IvfKmeansSpec: recall vs the exact top-k, list balance,
  * train determinism) rather than DuckDB-oracled; the s_ann_ivf query keeps
  * its first-K-codebook twin precisely because DuckDB can recompute that.
  */
object IvfIndex {

  final case class Codebook(centroids: IndexedSeq[Array[Double]]) {
    def k: Int = centroids.length
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    val inv = if (n == 0.0) 1.0 else 1.0 / math.sqrt(n)
    v.map(_ * inv)
  }

  private def argmaxDot(cents: IndexedSeq[Array[Double]], v: Array[Double]): Int = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val ctr = cents(c)
      var dot = 0.0
      var i = 0
      while (i < ctr.length) { dot += ctr(i) * v(i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = c } // ties keep the smaller id
      c += 1
    }
    best
  }

  /** Train a K-list spherical k-means codebook on a deterministic sample. */
  def train(emb: DataFrame, idCol: String, vecCol: String, k: Int,
            iters: Int = 5, sampleCap: Int = 4096): Codebook = {
    val sample: Array[Array[Double]] = emb
      .select(col(vecCol).as("v"), xxhash64(col(idCol)).as("h"))
      .orderBy("h")
      .limit(sampleCap)
      .collect()
      .map(r => normalize(r.getSeq[Float](0).map(_.toDouble).toArray))
    require(sample.nonEmpty, "ivf train: empty input")
    val kk = math.min(k, sample.length)
    var cents: IndexedSeq[Array[Double]] = sample.take(kk).map(_.clone).toIndexedSeq
    val dim = sample.head.length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      sample.foreach { v =>
        val c = argmaxDot(cents, v)
        val s = sums(c)
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        counts(c) += 1
      }
      cents = IndexedSeq.tabulate(kk) { c =>
        if (counts(c) == 0) cents(c) else normalize(sums(c))
      }
      it += 1
    }
    Codebook(cents)
  }

  /** Per-row nearest-list assignment against broadcast centroid literals:
    * adds a `centroid` column. Cosine ties resolve to the smaller list id
    * via the (sim, -cid) lexicographic max — same rule as training.
    */
  def assign(emb: DataFrame, vecCol: String, cb: Codebook): DataFrame =
    emb.withColumn("centroid",
      -array_max(array(simStructs(vecCol, cb): _*)).getField("ncid"))

  private def simStructs(vecCol: String, cb: Codebook) =
    cb.centroids.zipWithIndex.map { case (ctr, cid) =>
      struct(
        Vectors.cosineSim(col(vecCol), typedlit(ctr.map(_.toFloat).toSeq)).as("sim"),
        lit(-cid.toLong).as("ncid"))
    }

  /** ANN search: probe the nProbe nearest lists with exact cosine, top-k. */
  def search(emb: DataFrame, idCol: String, vecCol: String, cb: Codebook,
             probeId: Long, nProbe: Int, topK: Int): DataFrame = {
    val assigned = assign(emb, vecCol, cb)
    val probeRow = emb.filter(col(idCol) === probeId)
    val probeLists = probeRow
      .select(explode(array(simStructs(vecCol, cb): _*)).as("s"))
      .orderBy(col("s.sim").desc, col("s.ncid").desc)
      .limit(nProbe)
      .select((-col("s.ncid")).as("pcentroid"))
    val probeVec = probeRow.select(col(vecCol).as("pe"))
    assigned
      .join(broadcast(probeLists), col("centroid") === col("pcentroid"))
      .crossJoin(broadcast(probeVec))
      .select(col(idCol), Vectors.cosineSim(col(vecCol), col("pe")).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(topK)
  }
}
