package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** The banded/bucketed candidate generators must emit the IDENTICAL pair set
  * to a brute-force all-pairs scan — pigeonhole banding (SimHash, hyperplane
  * fingerprints) guarantees it mathematically; MinHash banding is tuned for
  * recall ~1-4e-10 at the corpus's similarity floor. The brute-force twins
  * here are test-only oracles (they ARE the O(n^2) plans the operators
  * replace).
  */
class BandedExactParitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def assertSameRows(got: DataFrame, want: DataFrame, name: String): Unit = {
    val extra = got.exceptAll(want).count()
    val missing = want.exceptAll(got).count()
    assert(extra == 0 && missing == 0,
      s"$name: $extra extra rows, $missing missing rows vs brute force")
  }

  test("d_simhash banded pairs == all-pairs hamming scan") {
    val got = NorthStar.d_simhash.run(spark, sfDir)
    // brute force: same simhash values, theta self-join
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), expr("transform(split(text, ' '), tk -> md5(tk))").as("hs"))
      .select(col("doc_id"), expr(
        s"""aggregate(sequence(62, 0, -1), CAST(0 AS BIGINT), (acc, i) ->
           |  acc * 2 + CASE WHEN aggregate(hs, 0, (a, h) ->
           |    a + CASE WHEN (shiftright((instr('0123456789abcdef', substring(h, (i div 4) + 1, 1)) - 1), i % 4) & 1) = 1
           |             THEN 1 ELSE -1 END) > 0
           |  THEN 1 ELSE 0 END)""".stripMargin).as("simhash"))
    val a = docs.as("a"); val b = docs.as("b")
    val want = a.join(b, col("a.doc_id") < col("b.doc_id"))
      .filter(expr("bit_count(a.simhash ^ b.simhash) <= 6"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").as("hamming"))
    assertSameRows(got, want, "d_simhash")
    assert(got.count() > 0, "parity vacuous: no qualifying pairs at this sf")
  }

  test("d_simhash_weighted banded pairs == all-pairs weighted hamming scan") {
    val got = NorthStar.d_simhash_weighted.run(spark, sfDir)
    // independent brute force: tf per distinct token via filter-count (the
    // operator computes it via explode+groupBy), then per-row bit assembly
    // and a theta self-join
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tks"))
      .select(col("doc_id"), expr(
        """transform(array_distinct(tks), tk -> named_struct(
          |  'h', md5(tk),
          |  'w', length(conv(size(filter(tks, x -> x = tk)), 10, 2))))""".stripMargin)
        .as("hws"))
      .select(col("doc_id"), expr(
        s"""aggregate(sequence(62, 0, -1), CAST(0 AS BIGINT), (acc, i) ->
           |  acc * 2 + CASE WHEN aggregate(hws, 0, (a, x) ->
           |    a + CASE WHEN (shiftright((instr('0123456789abcdef', substring(x.h, (i div 4) + 1, 1)) - 1), i % 4) & 1) = 1
           |             THEN x.w ELSE -x.w END) > 0
           |  THEN 1 ELSE 0 END)""".stripMargin).as("simhash"))
    val a = docs.as("a"); val b = docs.as("b")
    val want = a.join(b, col("a.doc_id") < col("b.doc_id"))
      .filter(expr("bit_count(a.simhash ^ b.simhash) <= 6"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").as("hamming"))
    assertSameRows(got, want, "d_simhash_weighted")
    assert(got.count() > 0, "parity vacuous: no qualifying pairs at this sf")
  }

  test("d_minhash_lsh banded pairs == exact jaccard >= 0.7 scan") {
    val got = NorthStar.d_minhash_lsh.run(spark, sfDir)
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(1, greatest(length(text)-4, 1))," +
          " i -> substring(text, i, 5)))").as("sh"))
    val a = docs.select(col("doc_id").as("id_a"), col("sh").as("sha"))
    val b = docs.select(col("doc_id").as("id_b"), col("sh").as("shb"))
    val jac = size(array_intersect(col("sha"), col("shb"))).cast("double") /
      size(array_union(col("sha"), col("shb")))
    val want = a.join(b, col("id_a") < col("id_b"))
      .filter(jac >= 0.7)
      .select(col("id_a"), col("id_b"), round(jac, 3).as("jac"))
    assertSameRows(got, want, "d_minhash_lsh")
    assert(got.count() > 0, "parity vacuous: no qualifying pairs at this sf")
  }

  test("d_embed_neardup tiled join == all-pairs cosine scan") {
    val got = NorthStar.d_embed_neardup.run(spark, sfDir)
    val emb = Tables.load(spark, sfDir, "embeddings")
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    val sim = graft.functions.Vectors.cosineSim(col("ea"), col("eb"))
    val want = a.join(b, col("id_a") < col("id_b"))
      .filter(sim >= 0.4)
      .select(col("id_a"), col("id_b"), round(sim, 3).as("sim"))
    assertSameRows(got, want, "d_embed_neardup")
    assert(got.count() > 0, "parity vacuous: no qualifying pairs at this sf")
  }

  test("d_embed_neardup_lsh finds planted near-duplicate vectors") {
    // The testdata has no pairs in the high-precision fingerprint regime, so
    // the sf oracle only proves emptiness; plant near-identical vectors and
    // prove the banded plan finds exactly the planted pairs.
    import spark.implicits._
    val dim = 64
    val base = Seq.tabulate(dim)(d => math.sin(d * 1.7).toFloat)
    val tweaked = base.updated(3, base(3) + 1e-4f) // same direction, epsilon off
    val far = Seq.tabulate(dim)(d => math.cos(d * 2.3).toFloat)
    val rows = Seq((1L, base), (2L, tweaked), (3L, far))
    val df = rows.toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft_lsh_").toString
    df.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = NorthStar.d_embed_neardup_lsh.run(spark, tmp).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)),
      s"expected exactly the planted pair (1,2), got ${got.mkString(", ")}")
    assert(got.head.getDouble(2) > 0.99)
  }
}
