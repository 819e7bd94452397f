package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** kb() addresses on-disk `kb=` directories, so it must be invariant to
  * the WIDTH the key happens to be presented at: xxhash64 hashes INT and
  * BIGINT of the same value differently, and before the canonical cast a
  * delta carrying `user_id` as INT against a BIGINT-written dimension
  * silently pruned the wrong buckets and dropped matches (ADVICE r11).
  */
class KeyBucketsSpec extends SparkSpec {

  test("bucket addressing is invariant to the key's presented integer width") {
    val df = spark.range(0, 1000).select(col("id"))
    val buckets = df.select(
        KeyBuckets.kb(col("id").cast("int")).as("kbInt"),
        KeyBuckets.kb(col("id").cast("bigint")).as("kbLong"),
        KeyBuckets.kb(col("id").cast("smallint")).as("kbShort"),
        KeyBuckets.kb(col("id").cast("string")).as("kbStr"))
    assert(buckets.filter(
      col("kbInt") =!= col("kbLong") || col("kbInt") =!= col("kbShort") ||
        col("kbInt") =!= col("kbStr")).count() == 0,
      "kb() must address the same bucket for every presentation of a key value")
    // and the buckets actually spread (the cast didn't degenerate the hash)
    assert(buckets.select("kbInt").distinct().count() == KeyBuckets.NB.toLong)
  }
}
