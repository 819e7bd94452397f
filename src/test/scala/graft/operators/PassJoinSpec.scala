package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PassJoin's exactness contract: the segment/probe candidate set must
  * contain EVERY true ed <= tau pair (pigeonhole + the position lemma),
  * on adversarial shapes — shared prefixes, length-boundary pairs, edits
  * concentrated at segment borders — with verification restoring
  * precision.
  */
class PassJoinSpec extends SparkSpec {

  private def ents(rows: Seq[(Long, String)]): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("key", "name")
  }

  private def brute(rows: Seq[(Long, String)], tau: Int): Set[(Long, Long, Long)] = {
    val df = ents(rows)
    df.as("a").join(df.as("b"), col("a.key") < col("b.key"))
      .select(col("a.key"), col("b.key"),
        levenshtein(col("a.name"), col("b.name")).cast("long").as("d"))
      .filter(col("d") <= tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def run(rows: Seq[(Long, String)], tau: Int): Set[(Long, Long, Long)] =
    PassJoin.matchPairs(ents(rows), tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("parity with brute force on a long-string corpus, tau = 1 and 2") {
    val base = Seq(
      "the quick brown fox jumps over the lazy dog near the riverbank at dawn",
      "a completely different sentence about distributed query engines and shuffles",
      "partition pruning keeps the scan bounded while the optimizer reorders joins",
      "columnar formats amortize decode cost across vectorized reader batches")
    val rows = base.zipWithIndex.flatMap { case (s, i) =>
      val k = i.toLong * 10
      Seq(
        (k, s),
        (k + 1, s.patch(5, "x", 0)),          // one insert: ed 1
        (k + 2, s.patch(10, "", 2)),          // two deletes: ed 2
        (k + 3, s.patch(3, "zz", 0)),         // two inserts: ed 2
        (k + 4, s.updated(7, 'Q')))           // one substitution: ed 1
    }
    for (tau <- Seq(1, 2))
      assert(run(rows, tau) == brute(rows, tau), s"tau=$tau diverged")
  }

  test("shared-prefix corpus: recall holds even where blocks degenerate") {
    // every string shares a 40-char prefix — the shape that made FastSS
    // the SHORT-string choice; PassJoin must stay exact here too (the
    // first segment becomes one big block: more candidates, same answer)
    val pre = "Customer#Record#CommonPrefix#Shared#40ch"
    val rows = (0L until 30L).map(i => (i, pre + s"-suffix-number-$i-padded-out")) ++
      Seq((100L, pre + "-suffix-number-7-padded-ouX"),  // sub of key 7's twin
        (101L, pre + "-suffix-number-12-padded-out-zz")) // two inserts on key 12's
    for (tau <- Seq(1, 2))
      assert(run(rows, tau) == brute(rows, tau), s"tau=$tau diverged")
  }

  test("edits at segment boundaries and length-range edges are caught") {
    val s0 = "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGH"
    val k = 3 // tau = 2 segments: boundary positions L/3, 2L/3
    val b1 = s0.length / k
    val rows = Seq(
      (1L, s0),
      (2L, s0.patch(b1 - 1, "", 1).patch(2 * b1 - 1, "", 1)), // deletes AT both borders
      (3L, s0.patch(b1, "XY", 0)),                            // insert straddling border
      (4L, s0 + "ZZ"),                                        // pure suffix growth: |len diff| = tau
      (5L, s0.drop(2)))                                       // pure prefix loss: |len diff| = tau
    assert(run(rows, 2) == brute(rows, 2))
  }

  test("mixed-length corpus: short strings route through the completion, full parity") {
    // r17 ADVICE: matchPairs must not silently lose pairs involving
    // strings shorter than tau + 1 — they ride the broadcast completion.
    // Covers short-short ((1,2) ed 0, (1,5) ed 1), short-long at the
    // length boundary ((5, "abc") vs k = 3 is main-path territory for
    // "abc" but completion for "a"), and long-long unchanged.
    val rows = Seq((1L, "ab"), (2L, "ab"), (3L, "a long enough string here"),
      (4L, "a long enough string hereX"), (5L, "a"), (6L, "abc"), (7L, "abcd"))
    for (tau <- Seq(1, 2))
      assert(run(rows, tau) == brute(rows, tau), s"tau=$tau diverged on mixed lengths")
  }
}
