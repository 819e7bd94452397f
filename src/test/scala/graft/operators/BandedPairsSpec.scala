package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The tiled pair generator must emit the IDENTICAL pair set to the naive
  * per-bucket O(size^2) explode for every chunking — including buckets that
  * straddle chunk boundaries (size = k*chunk - 1, k*chunk, k*chunk + 1) and
  * buckets far larger than the chunk, where the skew-defusing multi-tile
  * path actually runs. (The sf parity specs exercise real corpora but their
  * buckets sit below the 256 default chunk, i.e. single-tile.)
  */
class BandedPairsSpec extends SparkSpec {

  /** (band, bucket) -> member count; ids interleave so sort order within a
    * bucket is exercised, aux rides along like the 8-byte simhash payload.
    */
  private val sizes: Map[(Int, Int), Int] = Map(
    (0, 0) -> 1,  // singleton: no pairs
    (0, 1) -> 2,
    (0, 2) -> 3,
    (1, 0) -> 7,  // chunk*2 - 1 at chunk=4
    (1, 1) -> 8,  // chunk*2
    (1, 2) -> 9,  // chunk*2 + 1
    (2, 7) -> 23) // ~6 chunks at chunk=4: 21 tiles

  private def memberRows: Seq[(Int, Int, Long, Long)] =
    for {
      ((band, bucket), n) <- sizes.toSeq
      i <- 0 until n
      // non-monotonic ids so sort_array does real work
      id = band * 10000L + ((i * 13) % n) * 7L + bucket
    } yield (band, bucket, id, id * 31 + 5)

  private def expectedPairs: Set[(Long, Long)] =
    memberRows.groupBy(r => (r._1, r._2)).values.flatMap { rs =>
      val ids = rs.map(_._3).distinct.sorted
      for { i <- ids.indices; j <- i + 1 until ids.length } yield (ids(i), ids(j))
    }.toSet

  for (chunk <- Seq(2, 3, 4, 64)) {
    test(s"tiled pairs at chunk=$chunk == naive in-bucket all-pairs") {
      import spark.implicits._
      // duplicate every row once: collect_set must fold them like the naive
      // path does
      val banded = (memberRows ++ memberRows).toDF("band", "bucket", "id", "aux")
      val got = BandedPairs.pairs(banded, struct(col("id"), col("aux")), chunk)
        .select(col("p.a.id"), col("p.a.aux"), col("p.b.id"), col("p.b.aux"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // exactly-once emission (no cross-tile double counting) ...
      assert(got.length == got.distinct.length,
        s"chunk=$chunk emitted duplicate pairs")
      // ... of exactly the naive pair set, ordered a < b, payload intact
      assert(got.forall { case (a, _, b, _) => a < b })
      assert(got.forall { case (a, aa, b, ba) => aa == a * 31 + 5 && ba == b * 31 + 5 })
      assert(got.map(g => (g._1, g._3)).toSet == expectedPairs,
        s"chunk=$chunk pair set diverged from naive")
    }
  }

  test("pair count matches sum over buckets of n*(n-1)/2") {
    import spark.implicits._
    val banded = memberRows.toDF("band", "bucket", "id", "aux")
    val want = sizes.values.map(n => n.toLong * (n - 1) / 2).sum
    val got = BandedPairs.pairs(banded, struct(col("id"), col("aux")), 4).count()
    assert(got == want, s"expected $want pairs, got $got")
  }
}
