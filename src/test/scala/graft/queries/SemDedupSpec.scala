package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the SemDeDup contract on a hand-built geometry where every case is
  * decidable by inspection:
  *  - within-cluster near-dups: the LOWER vec_id survives, higher drops;
  *  - near-dups split across clusters: BOTH survive (the published
  *    cluster-bounded approximation is a contract, not a bug);
  *  - chains: B~A (drop B) and C~B but C!~A still drops C — the drop rule
  *    is "any lower-id cluster-mate above threshold", resolved against the
  *    FULL membership, not the surviving set;
  *  - unrelated vectors survive untouched.
  */
class SemDedupSpec extends SparkSpec {

  // two orthogonal unit centroids: cluster 1 = x-axis, cluster 2 = y-axis
  private val centroids: Seq[Seq[Float]] = Seq(
    Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f))

  private def vecs(rows: (Long, Seq[Float])*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
  }

  private def survivors(df: DataFrame, t: Double): Map[Long, Long] =
    NorthStar.semdedup(df, centroids, t)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("within-cluster near-dups keep-first; cross-cluster near-dups both survive") {
    val e = 0.05f
    val docs = vecs(
      1L -> Seq(1f, e, 0f, 0f),      // cluster 1, near-dup of 2 -> survives (lowest)
      2L -> Seq(1f, -e, 0f, 0f),     // cluster 1, cos(1,2) ~ 0.995 -> dropped
      3L -> Seq(0.8f, 0.75f, 0f, 0f), // cluster 1 (x slightly wins)
      4L -> Seq(0.75f, 0.8f, 0f, 0f), // cluster 2 — near-dup of 3 ACROSS clusters
      5L -> Seq(0f, 1f, 0f, 0f),     // cluster 2, far from 4 at t=0.95
      6L -> Seq(0f, 0f, 1f, 0f))     // equidistant tie -> cluster 1, orthogonal
    val s = survivors(docs, 0.95)
    assert(s.keySet === Set(1L, 3L, 4L, 5L, 6L))
    assert(s(1L) == 1L && s(3L) == 1L && s(6L) == 1L, "cluster-1 assignments")
    assert(s(4L) == 2L && s(5L) == 2L, "cluster-2 assignments")
  }

  test("drop rule resolves against full membership, not survivors (chains)") {
    // A=1 and C=3 are ~37 deg apart (cos ~ 0.8); B=2 sits between, ~18.5 deg
    // from each (cos ~ 0.95 to both). At t=0.9: B drops via A, and C drops
    // via B even though B itself was dropped and cos(A,C) < t.
    val docs = vecs(
      1L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(0.95f, 0.32f, 0f, 0f),
      3L -> Seq(0.8f, 0.6f, 0f, 0f))
    val s = survivors(docs, 0.9)
    assert(s.keySet === Set(1L))
  }
}
