package graft.engine

import graft.SparkSpec

/** The kernels must be reachable from plain SQL via the injected
  * FunctionRegistry entries (SparkSessionExtensions).
  */
class GraftExtensionsSpec extends SparkSpec {

  private def one(sql: String): Any =
    spark.sql(s"SELECT $sql AS v").collect()(0).get(0)

  test("char_ngrams from SQL") {
    assert(one("char_ngrams('abab', 2)").asInstanceOf[scala.collection.Seq[_]].toSeq
      == Seq("ab", "ba"))
  }

  test("min_hash_ngram_sig from SQL agrees with the array kernel") {
    val fused = spark.sql(
      "SELECT min_hash_ngram_sig('hello world', 5, 8).sig AS s").collect()(0).getSeq[Long](0)
    val viaArray = spark.sql(
      "SELECT min_hash_sig(char_ngrams('hello world', 5), 8) AS s").collect()(0).getSeq[Long](0)
    assert(fused == viaArray)
  }

  test("hyper_fp, cosine_sim, pg_bool from SQL") {
    assert(one("hyper_fp(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT)), 8)")
      .isInstanceOf[Long])
    assert(one("ROUND(cosine_sim(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))), 3)") == 1.0)
    assert(one("pg_bool('t')") == true && one("pg_bool('')") == null)
  }

  test("unload dialect kernels from SQL round-trip") {
    val parts = spark.sql(
      raw"SELECT unload_split(unload_escape('a|b\\c', '|') || '|' || 'x', '|', 2) AS v")
      .collect()(0).getSeq[String](0)
    assert(parts == Seq("a|b\\c", "x"))
  }

  test("simhash63 / simhash63_weighted / l2_sq from SQL") {
    // weight-1 weighted == unweighted on the same hash array
    val un = one("simhash63(array(md5('a'), md5('b')))").asInstanceOf[Long]
    val w1 = one("simhash63_weighted(array(md5('a'), md5('b')), array(1, 1))")
      .asInstanceOf[Long]
    assert(un == w1)
    // doubling every weight cannot change any vote sign
    val w2 = one("simhash63_weighted(array(md5('a'), md5('b')), array(2, 2))")
      .asInstanceOf[Long]
    assert(un == w2)
    assert(one("l2_sq(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
      " array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)))") == 5.0)
    // fused kernel == weight-1 path on a duplicate-free text (tf=1 -> w=1)
    val fused = one("simhash63_tf('a b')").asInstanceOf[Long]
    assert(fused == un)
  }

  test("band_hashes / rolling_window_hash from SQL agree with the Column kernels") {
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql(
      "SELECT band_hashes(min_hash_ngram_sig('the quick brown fox', 5, 192).sig, 32, 6) AS b")
      .collect().head.getSeq[Long](0)
    val viaCol = spark.range(1).select(
        graft.functions.BandHash.bandHashes(
          graft.functions.MinHash.ngramSig(lit("the quick brown fox"), 5, 192)
            .getField("sig"), 32, 6).as("b"))
      .collect().head.getSeq[Long](0)
    assert(viaSql == viaCol && viaSql.length == 32)

    val rh = spark.sql("SELECT rolling_window_hash('a b c a b c', 3) AS h")
      .collect().head.getSeq[Long](0)
    // 4 token windows of width 3; equal windows hash equal ('a b c' at 0 and 3)
    assert(rh.length == 4 && rh(0) == rh(3) && rh(0) != rh(1))
  }

  test("non-literal config args are rejected with a clear error") {
    val e = intercept[Exception](spark.sql("SELECT char_ngrams('x', length('ab'))").collect())
    assert(e.getMessage.contains("integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("integer literal")))
  }
}
