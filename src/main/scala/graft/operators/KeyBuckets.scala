package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** THE key-bucket partition addressing shared by every operator that
  * persists a `kb=` layout ([[Scd2Dim]], [[JoinView]]): one hash, one
  * cast, one bucket count — two copies of a function that addresses
  * on-disk directories is a drift surface, not a style choice.
  *
  * The bucket count is PERSISTED with each table (`_graft_buckets`
  * marker) and validated at every writer entry: a key's stored rows live
  * under `kb = hash % NB`, so running a writer built with a different NB
  * against an existing table would prune to the WRONG bucket, miss the
  * key's history, and silently fork its timeline / drop its join matches.
  * With the marker, that misconfiguration fails loudly instead.
  */
private[operators] object KeyBuckets {

  /** Fixture-sized default — a production table picks thousands (and the
    * marker makes that a per-table property, not a recompile).
    */
  val NB = 8

  // int, matching what partition-column inference reads back from `kb=N`
  // directory names — keeps pass-through and rebuilt sides' types
  // identical with no set-operation widening.
  //
  // The key is CANONICALIZED to its string rendering before hashing:
  // xxhash64 hashes INT and BIGINT of the same value differently, so a
  // delta presenting the join/merge key at a different integer width than
  // the stored table was written with (INT events vs BIGINT history)
  // would otherwise address the WRONG kb= directories and silently drop
  // matches (ADVICE r11) — the NB marker validates the count but cannot
  // see the hashed type. The string form is width-invariant ("5" for
  // both), and the cast's per-row cost is noise next to the shuffle the
  // bucket addressing exists to avoid.
  def kb(c: Column, nb: Int = NB): Column =
    pmod(xxhash64(c.cast("string")), lit(nb)).cast("int")

  private def markerPath(root: String) =
    new org.apache.hadoop.fs.Path(root, "_graft_buckets")

  def publish(spark: SparkSession, root: String, nb: Int = NB): Unit = {
    val mp = markerPath(root)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(mp, true)
    try out.write(nb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Writer-entry guard: the stored bucket count must equal the one this
    * writer will address with. A marker-less table (pre-marker layout)
    * adopts the current value — correct as long as NB never changed,
    * which is exactly the pre-marker assumption being retired.
    */
  def validate(spark: SparkSession, root: String, nb: Int = NB): Unit = {
    val mp = markerPath(root)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mp)) { publish(spark, root, nb); return }
    val in = fs.open(mp)
    val stored = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
                 finally in.close()
    require(stored == nb,
      s"bucket count $nb does not match the table's persisted _graft_buckets " +
        s"$stored at $root — the kb= layout would be addressed wrongly; " +
        "rebuild the table to change its bucket count")
  }
}
