package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-proof in-bucket pair generation for LSH-banded candidate schemes
  * (MinHash banding, SimHash pigeonhole bands, hyperplane-fp bands).
  *
  * The naive shape — `groupBy(band, bucket).agg(collect_set(m))` followed by
  * an O(size^2) pair explode — does ALL of a bucket's quadratic work inside
  * the single task that owns that bucket's group. On boilerplate-heavy
  * corpora a few mega-buckets concentrate most of the candidate mass, so one
  * straggler task dominates wall-clock (measured at sf0.1: the same warm
  * d_simhash_weighted run swung 4.2-9.4 s purely on where the hot buckets
  * landed) and at 100 TB a single reducer would own billions of pairs.
  *
  * Fix: keep the banding (candidate count is unchanged) but TILE each
  * bucket's sorted member list into chunks of `chunkSize` and re-shuffle at
  * tile granularity. A bucket of n members becomes nc = ceil(n/chunkSize)
  * chunks and nc*(nc+1)/2 tiles; each tile is one (chunk_i, chunk_j) pair
  * carrying at most chunkSize^2 pair-candidates, hash-distributed across the
  * cluster by (band, bucket, i, j). Per-task work is bounded by
  * chunkSize^2 * tiles_per_partition regardless of bucket skew; the extra
  * shuffle moves each member struct nc times (n^2/chunkSize rows for a hot
  * bucket — linear in the pair count it defuses, and exactly n rows for the
  * common single-tile bucket).
  *
  * Pair semantics are identical to the naive explode: members are sorted
  * (sort_array over the collect_set), chunks are contiguous slices, so for
  * i < j every member of chunk i precedes every member of chunk j — cross
  * tiles emit all ca x cb pairs, diagonal tiles emit index-ordered in-chunk
  * pairs, and every unordered bucket pair appears in exactly one tile with
  * a < b in sort order. No dedupe step is added or removed.
  *
  * When to use WHICH pair generator: an in-bucket SELF-JOIN on
  * (band, bucket) enumerates the same pairs in whole-stage codegen with no
  * array materialization and gets mega-bucket splitting from AQE skew-join
  * — and a SHUFFLE_HASH hint makes both join sides identical shuffles so
  * ReuseExchange evaluates even an EXPENSIVE signature subplan once
  * (round 7: that plan replaced this operator in d_minhash_lsh, 2.29 s ->
  * 1.69 s at sf0.1). This operator remains the right shape when the two
  * sides CANNOT be identical subplans — pair generation between two
  * different relations, or a probe/index split where the sides carry
  * different filters — i.e. when exchange reuse is structurally
  * unavailable and a broadcast would re-evaluate the expensive side.
  */
object BandedPairs {

  /** Explode every (band, bucket) group of `banded` into its unordered
    * member pairs, tiled as documented above.
    *
    * @param banded    rows of (band, bucket, member-struct); the struct's
    *                  FIRST field must be the id that orders pairs (a < b)
    * @param member    the member struct column (e.g. struct(doc_id, simhash))
    * @param chunkSize tile edge: per-task pair work is <= chunkSize^2 per tile
    * @return one column `p` = named_struct(a, b) with a < b in member order
    */
  def pairs(banded: DataFrame, member: Column, chunkSize: Int = 256): DataFrame = {
    require(chunkSize > 1, s"chunkSize must be > 1, got $chunkSize")
    val c = chunkSize
    banded
      .groupBy("band", "bucket")
      .agg(sort_array(collect_set(member)).as("ids"))
      .filter(size(col("ids")) > 1)
      // one row per (chunk_i, chunk_j) tile, i <= j; cheap slicing only —
      // the quadratic work happens after the tile shuffle below
      .select(col("band"), col("bucket"), explode(expr(
        s"""flatten(transform(sequence(0, int(ceil(size(ids) / ${c}.0)) - 1), i ->
           |  transform(sequence(i, int(ceil(size(ids) / ${c}.0)) - 1), j ->
           |    named_struct('i', i, 'j', j,
           |      'ca', slice(ids, i * $c + 1, $c),
           |      'cb', slice(ids, j * $c + 1, $c)))))""".stripMargin)).as("t"))
      // tile-granular redistribution: a hot bucket's nc*(nc+1)/2 tiles land
      // on distinct reducers instead of one task owning the whole bucket
      .repartition(col("band"), col("bucket"), col("t.i"), col("t.j"))
      .select(explode(expr(
        """CASE WHEN t.i = t.j THEN
          |  flatten(transform(t.ca, (a, i) ->
          |    transform(slice(t.ca, i + 2, size(t.ca)), b2 -> named_struct('a', a, 'b', b2))))
          |ELSE
          |  flatten(transform(t.ca, a ->
          |    transform(t.cb, b2 -> named_struct('a', a, 'b', b2))))
          |END""".stripMargin)).as("p"))
  }
}
