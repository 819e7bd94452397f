package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** The prefix-filtered containment join must equal the brute-force
  * all-pairs directed containment relation — recall is claimed lossless,
  * so the comparison is exact equality, not containment.
  */
class ContainmentSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("prefix-filtered containment equals the all-pairs twin") {
    val docs = Tables.load(spark, sfDir, "documents")
    val sh = docs.select(col("doc_id"),
      graft.functions.CharNgrams.charNgrams(col("text"), 5).as("s"))
      .select(col("doc_id"), col("s"), size(col("s")).as("n"))
    val a = sh.as("a"); val b = sh.as("b")
    val ni = size(array_intersect(col("a.s"), col("b.s")))
    val brute = a.join(b, col("a.doc_id") =!= col("b.doc_id"))
      .filter(ni * 5 >= col("a.n") * 4)
      .select(col("a.doc_id").as("src_id"), col("b.doc_id").as("dst_id"),
        round(ni.cast("double") / col("a.n"), 3).as("cont"))
      .orderBy("src_id", "dst_id")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val got = graft.SparkEntry.queries("d_containment")(spark, sfDir)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty, "fixture should contain at least one contained pair")
    assert(got == brute)
  }

  test("collapse-first containment equals the direct join") {
    val direct = graft.SparkEntry.queries("d_containment")(spark, sfDir)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val collapsed = graft.SparkEntry.queries("d_containment_collapse")(spark, sfDir)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(collapsed == direct)
  }

  test("containment catches asymmetric overlap that Jaccard misses") {
    import spark.implicits._
    // a short doc fully quoted inside a much longer one: containment 1.0,
    // Jaccard far below any resemblance threshold
    val quote = "the quick brown fox jumps over the lazy dog again and again"
    // varied (not repeated) filler so the host's DISTINCT gram set dwarfs
    // the quote's — repetition would collapse to few distinct grams and
    // inflate Jaccard
    val host = (1 to 30).map(i => s"section $i covers topic number $i in detail")
      .mkString(" ", " ", " ") + quote +
      (31 to 60).map(i => s"afterwards chapter $i explores subject $i further")
        .mkString(" ", " ", " ")
    val docs = Seq((1L, quote), (2L, host)).toDF("doc_id", "text")
    docs.createOrReplaceTempView("cont_docs")
    val sh = docs.select(col("doc_id"),
      graft.functions.CharNgrams.charNgrams(col("text"), 5).as("s"),
      size(graft.functions.CharNgrams.charNgrams(col("text"), 5)).as("n"))
    val a = sh.as("a"); val b = sh.as("b")
    val pair = a.join(b, col("a.doc_id") === 1 && col("b.doc_id") === 2)
      .select(
        (size(array_intersect(col("a.s"), col("b.s"))).cast("double") / col("a.n")).as("cont"),
        (size(array_intersect(col("a.s"), col("b.s"))).cast("double") /
          size(array_union(col("a.s"), col("b.s")))).as("jac"))
      .collect()(0)
    assert(pair.getDouble(0) >= 0.95, s"quote should be ~fully contained: $pair")
    assert(pair.getDouble(1) < 0.3, s"Jaccard should miss the asymmetric pair: $pair")
  }

  test("candidate budget guard fails loudly before the join, and is overridable") {
    val key = "graft.containment.maxCandidates"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "10") // far below the fixture's gram-grain volume
      val ex = intercept[IllegalStateException] {
        graft.SparkEntry.queries("d_containment")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      assert(ex.getMessage.contains("d_containment_collapse"),
        s"guard must point at the production paths: ${ex.getMessage}")
      assert(ex.getMessage.contains(key))
      spark.conf.set(key, "0") // <= 0 disables the guard entirely
      val rows = graft.SparkEntry.queries("d_containment")(spark, sfDir).count()
      assert(rows > 0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
