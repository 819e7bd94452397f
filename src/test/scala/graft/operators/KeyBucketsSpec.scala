package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** kb() addresses on-disk `kb=` directories, so it must be invariant to
  * HOW the key happens to be presented: xxhash64 hashes INT and BIGINT of
  * the same value differently (ADVICE r11), and a timestamp's string
  * rendering differs across session timezones (ADVICE r12) — either
  * would silently prune the wrong buckets and drop matches. The scheme
  * itself is versioned in the `_graft_buckets` marker so a scheme change
  * against a stored table fails loudly instead of silently mis-addressing
  * (ADVICE r12: r12's own hash change slipped past the count-only
  * marker).
  */
class KeyBucketsSpec extends SparkSpec {

  test("bucket addressing is invariant to the key's presented integer width") {
    val df = spark.range(0, 1000).select(col("id"))
    val buckets = df.select(
        KeyBuckets.kb(col("id").cast("int"), IntegerType).as("kbInt"),
        KeyBuckets.kb(col("id").cast("bigint"), LongType).as("kbLong"),
        KeyBuckets.kb(col("id").cast("smallint"), ShortType).as("kbShort"))
    assert(buckets.filter(
      col("kbInt") =!= col("kbLong") || col("kbInt") =!= col("kbShort"))
      .count() == 0,
      "kb() must address the same bucket for every integer width of a key value")
    // and the buckets actually spread (the cast didn't degenerate the hash)
    assert(buckets.select("kbInt").distinct().count() == KeyBuckets.NB.toLong)
  }

  test("timestamp keys address the same bucket under any session timezone") {
    val df = spark.range(0, 500)
      .select(timestamp_micros(col("id") * 987654321L).as("ts"))
    def bucketsUnder(tz: String): Array[Int] = {
      val prev = spark.conf.get("spark.sql.session.timeZone")
      spark.conf.set("spark.sql.session.timeZone", tz)
      try df.select(KeyBuckets.kb(col("ts"), TimestampType).as("kb"))
        .collect().map(_.getInt(0))
      finally spark.conf.set("spark.sql.session.timeZone", prev)
    }
    assert(bucketsUnder("UTC").sameElements(bucketsUnder("Asia/Kathmandu")),
      "a timestamp key must hash by instant (epoch micros), not by its " +
        "session-timezone-dependent string rendering")
  }

  test("validate fails loudly on a pre-versioning or foreign-scheme marker") {
    val root = java.nio.file.Files.createTempDirectory("graft_kb_marker_").toString
    val mp = new org.apache.hadoop.fs.Path(root, "_graft_buckets")
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())

    def writeMarker(contents: String): Unit = {
      val out = fs.create(mp, true)
      try out.write(contents.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }

    // current scheme round-trips
    KeyBuckets.publish(spark, root)
    KeyBuckets.validate(spark, root)

    // count-only marker (pre-r13 layout): the stored table was bucketed
    // under a hash this writer does not compute — must fail, not adopt
    writeMarker(KeyBuckets.NB.toString)
    val preVersioning = intercept[IllegalArgumentException] {
      KeyBuckets.validate(spark, root)
    }
    assert(preVersioning.getMessage.contains("Rebuild"))

    // explicit foreign scheme token
    writeMarker(s"${KeyBuckets.NB}\nhash=v2-string")
    val foreign = intercept[IllegalArgumentException] {
      KeyBuckets.validate(spark, root)
    }
    assert(foreign.getMessage.contains("v2-string") &&
      foreign.getMessage.contains(KeyBuckets.HashVersion))

    // bucket-count mismatch still fails first
    writeMarker(s"16\nhash=${KeyBuckets.HashVersion}")
    intercept[IllegalArgumentException] { KeyBuckets.validate(spark, root) }
  }
}
