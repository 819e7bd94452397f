package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The persisted `_graft_tau` radius marker shared by the kernel-choice-
  * versioned entity indexes ([[FastSsIndex]], [[PassJoinIndex]]) — the
  * [[KeyBuckets]] versioning discipline applied to the KERNEL: an index
  * built at one radius probed or ingested at another would silently
  * return the wrong edit-distance contract (the two radii's signatures /
  * segment contexts never collide), so the radius persists at build and
  * every kerneling writer validates it. One copy so the marker wire
  * format and the loud-mismatch message cannot drift between the two
  * index families.
  */
private[operators] object RadiusMarker {

  def markerPath(path: String) = new Path(path, "_graft_tau")

  def write(spark: SparkSession, path: String, tau: Int): Unit = {
    val mp = markerPath(path)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(mp, true)
    try out.write(tau.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The persisted radius; `default` for a marker-less artifact (FastSS:
    * 1, the only radius that existed pre-marker; PassJoin indexes are
    * never marker-less — they postdate the discipline).
    */
  def stored(spark: SparkSession, path: String, default: Int): Int = {
    val mp = markerPath(path)
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mp)) default
    else {
      val in = fs.open(mp)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
      finally in.close()
    }
  }

  def validate(spark: SparkSession, path: String, tau: Int, default: Int): Unit = {
    val s = stored(spark, path, default)
    require(s == tau,
      s"index at $path was built with deletion/partition radius tau=$s but this " +
        s"writer kernels at tau=$tau — mixed radii would silently break the " +
        "edit-distance contract. Rebuild the index at the desired radius.")
  }
}
