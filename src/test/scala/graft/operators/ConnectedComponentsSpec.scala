package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Star-contraction correctness + the round-count claim that motivated it:
  * plain min-label propagation needs O(diameter) rounds (a 100-link chain =
  * 100 joins, which is why the old loop carried an abort-on-cap); large-star/
  * small-star contraction converges in O(log n).
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def labelsOf(pairs: Seq[(Long, Long)], maxRounds: Int = 48): (Map[Long, Long], Int) = {
    import spark.implicits._
    // smallGraphEdges = 0 forces the DISTRIBUTED contraction loop: these
    // tests exercise the star-contraction machinery and its round counts,
    // which the driver-side small-graph path (tested separately below)
    // would otherwise shortcut
    val (df, rounds) = ConnectedComponents.label(pairs.toDF("a", "b"), maxRounds,
      smallGraphEdges = 0L)
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1))
    val m = rows.toMap
    // a non-star-forest fixed point would emit duplicate/conflicting (id, lab)
    // rows that .toMap would silently collapse — fail instead
    assert(rows.length == m.size, s"duplicate labels: ${rows.length} rows for ${m.size} ids")
    (m, rounds)
  }

  /** Ground truth by union-find. */
  private def expected(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots must settle to the component minimum
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }
  }

  test("100-link chain converges in <= 10 rounds (the O(log n) claim)") {
    val chain = (0L until 100L).map(i => (i, i + 1))
    val (labels, rounds) = labelsOf(chain)
    // 7 contraction rounds reach the star forest; rounds run in batches of
    // two per signature check, so that rounds up to 8, plus one spare batch
    // observing the signature unchanged = 10 for a 100-link chain.
    assert(rounds <= 10, s"chain took $rounds rounds; contraction should be O(log n)")
    assert(labels.size == 101)
    assert(labels.values.forall(_ == 0L), "every chain node labels to the minimum (0)")
  }

  test("disjoint components each label to their own minimum") {
    val pairs = Seq((5L, 9L), (9L, 7L), (20L, 30L), (41L, 40L), (40L, 42L), (42L, 41L))
    val (labels, _) = labelsOf(pairs)
    assert(labels == expected(pairs))
    assert(labels(7L) == 5L && labels(30L) == 20L && labels(42L) == 40L)
  }

  test("self-pairs and duplicate edges are harmless") {
    val pairs = Seq((3L, 3L), (3L, 8L), (8L, 3L), (3L, 8L))
    val (labels, _) = labelsOf(pairs)
    assert(labels == Map(3L -> 3L, 8L -> 3L))
  }

  test("random graphs match union-find ground truth") {
    val rnd = new Random(42)
    for (trial <- 0 until 3) {
      val n = 60
      val pairs = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val (labels, rounds) = labelsOf(pairs)
      assert(labels == expected(pairs), s"trial $trial diverged from union-find")
      assert(rounds <= 12, s"trial $trial took $rounds rounds")
    }
  }

  test("hybrid small-graph path: identical labels to the contraction loop, rounds = 0") {
    import spark.implicits._
    val rnd = new Random(7)
    for (trial <- 0 until 3) {
      val n = 80
      val pairs = Seq.fill(90)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val df = pairs.toDF("a", "b")
      val (small, r0) = ConnectedComponents.label(df) // default budget: small path
      val (loop, _) = ConnectedComponents.label(df, smallGraphEdges = 0L)
      assert(r0 == 0, "small-graph path must report rounds = 0")
      val sm = small.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val lm = loop.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sm == lm, s"trial $trial: hybrid diverged from the loop")
      assert(sm == expected(pairs), s"trial $trial: hybrid diverged from ground truth")
    }
  }

  test("non-long endpoints always take the distributed loop") {
    import spark.implicits._
    val pairs = Seq((3, 8), (8, 5)).toDF("a", "b") // IntegerType
    val (labels, rounds) = ConnectedComponents.label(pairs)
    assert(rounds > 0, "int-typed pairs must not take the driver path")
    assert(labels.collect().map(r => (r.getInt(0), r.getInt(1))).toMap ==
      Map(3 -> 3, 8 -> 3, 5 -> 3))
  }
}
