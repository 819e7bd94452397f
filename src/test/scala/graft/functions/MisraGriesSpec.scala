package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.MisraGries.MisraGriesAgg

class MisraGriesSpec extends SparkSpec {

  private def agg = new MisraGriesAgg(4)

  test("reduce: exact while under capacity") {
    val b = Seq("a", "b", "a", "c", "a").foldLeft(agg.zero)(agg.reduce)
    assert(b == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("reduce: decrement step cancels k+1 distinct singletons") {
    val b = Seq("a", "a", "b", "c", "d", "e").foldLeft(agg.zero)(agg.reduce)
    // e arrives at capacity: all counters drop by 1, e discarded
    assert(b == Map("a" -> 1L))
  }

  test("merge obeys the union error bound and caps at k") {
    val x = Map("a" -> 10L, "b" -> 3L, "c" -> 2L, "d" -> 1L)
    val y = Map("a" -> 5L, "e" -> 4L, "f" -> 3L, "g" -> 2L)
    val m = agg.merge(x, y)
    assert(m.size <= 4)
    // summed: a=15 b=3 c=2 d=1 e=4 f=3 g=2 -> 5th largest (kth=3 idx sorted
    // desc: 15,4,3,3,2 -> index 4 = 2) subtracted, positives survive
    assert(m("a") == 13L)
    assert(m.values.forall(_ > 0))
  }

  test("planted heavy hitter: guaranteed present and within n/(k+1), any partitioning") {
    import spark.implicits._
    val k = 4
    // 1000 items: "hot" 400 times, 60 cold tokens 10 times each
    val items = Seq.fill(400)("hot") ++ (1 to 60).flatMap(i => Seq.fill(10)(s"c$i"))
    val n = items.size
    for (parts <- Seq(1, 3, 16)) {
      val df = spark.createDataset(items).repartition(parts).toDF("t")
      val mg = udaf(new MisraGriesAgg(k))
      val sk = df.agg(mg(col("t"))).head().getMap[String, Long](0)
      val est = sk.getOrElse("hot", 0L)
      // freq 400 > n/(k+1) = 200 -> presence guaranteed
      assert(est > 0, s"hot absent at parts=$parts: $sk")
      assert(est <= 400 && est >= 400 - n / (k + 1),
        s"bound violated at parts=$parts: est=$est")
      // every reported counter over-estimates nothing
      sk.foreach { case (t, c) =>
        val exact = if (t == "hot") 400L else 10L
        assert(c <= exact && c >= exact - n / (k + 1))
      }
    }
  }

  test("map-side partial aggregation: no per-item shuffle in the sketch plan") {
    import spark.implicits._
    val df = spark.createDataset(Seq("a", "b", "a")).toDF("t")
    val mg = udaf(new MisraGriesAgg(4))
    val plan = df.agg(mg(col("t"))).queryExecution.executedPlan.toString
    // ObjectHashAggregate runs partial then final: two aggregate nodes
    assert("ObjectHashAggregate|SortAggregate".r.findAllIn(plan).size >= 2,
      s"sketch did not plan partial aggregation:\n$plan")
  }
}
