package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{MinHash, Vectors}
import graft.tables.Tables

/** North-star extensions (SURVEY.md §2.3 Q21–Q24 + the large-scale
  * training-data-pipeline operators): deduplication, similarity search,
  * text analysis, time bucketing / sessionization, multimodal plumbing.
  *
  * Oracle discipline: ops expressible in the SQL subset DuckDB shares get a
  * full differential oracle; hash-based ops (MinHash/SimHash/LSH use Spark's
  * xxhash64, which DuckDB does not implement) are deterministic but oracle-less
  * (driver records a rows-only check).
  *
  * Scale design:
  *  - exact dedup is a hash groupBy (shuffle on text hash — at 100 TB you'd
  *    first groupBy xxhash64(text) to avoid shuffling full documents);
  *  - MinHash-LSH banding turns O(n^2) pair search into a bucket join whose
  *    cost is sum over buckets of bucket_size^2 — the standard scale path;
  *  - brute-force cosine is the correctness baseline; the LSH variant
  *    (random hyperplanes -> bucket equi-join) is the scale path;
  *  - all similarity math uses array higher-order functions (zip_with /
  *    aggregate) over the embedding column — no explode, no extra shuffle.
  */
object NorthStar {

  private def q(name: String, oracle: Option[String], headline: Boolean = false)(
      body: (SparkSession, String) => DataFrame): Query =
    Query(name, body, oracle, headline)

  // ---------------------------------------------------------------- dedup

  val q21_dup_counts: Query = q("q21_dup_counts", Some(
    """SELECT text, COUNT(*) AS dupes FROM documents GROUP BY text
      |HAVING COUNT(*) > 1 ORDER BY dupes DESC, text""".stripMargin)) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .groupBy("text").agg(count(lit(1)).as("dupes"))
      .filter(col("dupes") > 1)
      .orderBy(col("dupes").desc, col("text"))
  }

  val q21_dedup_first: Query = q("q21_dedup_first", Some(
    """SELECT doc_id FROM (
      |  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      |  FROM documents) t
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin), headline = true) { (s, dir) =>
    val w = Window.partitionBy("text").orderBy("doc_id")
    Tables.load(s, dir, "documents")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id")
      .orderBy("doc_id")
  }

  /** Character n-gram (8-gram) Jaccard near-dup pairs, full oracle.
    * Shingle -> inverted-index join -> intersection counts -> |A u B| via
    * |A|+|B|-|A n B|. The shingle equi-join is the distributed plan: at scale
    * the join key (shingle) is shuffled, never the documents themselves.
    */
  val d_ngram_jaccard: Query = q("d_ngram_jaccard", Some(
    """WITH sh AS (
      |  SELECT DISTINCT doc_id, substring(text, i, 8) AS sh
      |  FROM (SELECT doc_id, text,
      |        UNNEST(generate_series(1, GREATEST(length(text)-7, 1))) AS i
      |        FROM documents WHERE doc_id < 200) g),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT i.id_a, i.id_b,
      |       ROUND(CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common), 3) AS jac
      |FROM inter i
      |JOIN sizes sa ON sa.doc_id = i.id_a
      |JOIN sizes sb ON sb.doc_id = i.id_b
      |WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= 0.25
      |ORDER BY id_a, id_b""".stripMargin), headline = true) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 200)
    val sh = docs.select(col("doc_id"), explode(expr(
      "array_distinct(transform(sequence(1, greatest(length(text)-7, 1))," +
        " i -> substring(text, i, 8)))")).as("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.as("a"); val b = sh.as("b")
    val inter = a.join(b, col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    val sa = sizes.as("sa"); val sb = sizes.as("sb")
    val jac = col("n_common").cast("double") /
      (col("sa.n") + col("sb.n") - col("n_common"))
    inter
      .join(broadcast(sa), col("sa.doc_id") === col("id_a"))
      .join(broadcast(sb), col("sb.doc_id") === col("id_b"))
      .filter(jac >= 0.25)
      .select(col("id_a"), col("id_b"), round(jac, 3).as("jac"))
      .orderBy("id_a", "id_b")
  }

  /** MinHash (32 permutations via seeded xxhash64) + LSH banding (4 bands x 8
    * rows, collision threshold (1/4)^(1/8) ~ 0.84) -> candidate pairs -> exact
    * Jaccard verification at 0.7. Deterministic but xxhash64 has no DuckDB
    * twin -> rows-only check.
    *
    * Scale shape: the bucket self-join carries ONLY doc_ids (never the shingle
    * arrays — at 100 TB that shuffle would dwarf everything else); shingle
    * arrays are re-joined per *surviving* candidate pair for verification.
    */
  val d_minhash_lsh: Query = q("d_minhash_lsh", None, headline = true) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(1, greatest(length(text)-4, 1))," +
          " i -> substring(text, i, 5)))").as("shingles"))
    val banded = docs
      .withColumn("sig", MinHash.minHashSig(col("shingles"), 32))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, 3), b -> xxhash64(slice(sig, b * 8 + 1, 8), b))"))
        .as(Seq("band", "bucket")))
    // One shuffle: bucket members -> in-bucket pairs. A self-join here would
    // recompute the signature scan on both sides.
    val cand = banded
      .groupBy("band", "bucket")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (a, i) ->
          |  transform(slice(ids, i + 2, size(ids)), b2 -> named_struct('id_a', a, 'id_b', b2))))"""
          .stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .dropDuplicates("id_a", "id_b")
    val sha = docs.select(col("doc_id").as("id_a"), col("shingles").as("sha"))
    val shb = docs.select(col("doc_id").as("id_b"), col("shingles").as("shb"))
    val jac = size(array_intersect(col("sha"), col("shb"))).cast("double") /
      size(array_union(col("sha"), col("shb")))
    cand.join(sha, "id_a").join(shb, "id_b")
      .filter(jac >= 0.7)
      .select(col("id_a"), col("id_b"), round(jac, 3).as("jac"))
      .orderBy("id_a", "id_b")
  }

  /** 64-bit SimHash over whitespace tokens; near-dup = Hamming distance <= 6.
    * xxhash64-based -> rows-only. bit_count(xor) is the codegen'd Hamming path.
    */
  val d_simhash: Query = q("d_simhash", None) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 62), CAST(0 AS BIGINT), (acc, i) -> acc * 2 +
          |  CASE WHEN aggregate(toks, 0, (a, tk) ->
          |    a + CASE WHEN (shiftright(xxhash64(tk), i) & 1) = 1 THEN 1 ELSE -1 END) > 0
          |  THEN 1 ELSE 0 END)""".stripMargin))
      .select("doc_id", "simhash")
    val a = docs.as("a"); val b = docs.as("b")
    a.join(b, col("a.doc_id") < col("b.doc_id"))
      .filter(expr("bit_count(a.simhash ^ b.simhash) <= 6"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").as("hamming"))
      .orderBy("id_a", "id_b")
  }

  // ----------------------------------------------------- similarity search


  /** Q24: exact cosine top-k against probe vec_id=1, element-wise on both
    * sides so the float algebra is order-identical (SURVEY §2.3 Q24).
    */
  val q24_cosine_topk: Query = q("q24_cosine_topk", Some(
    """WITH probe AS (
      |  SELECT UNNEST(embedding) AS pv, generate_subscripts(embedding, 1) AS i
      |  FROM embeddings WHERE vec_id = 1),
      |cand AS (
      |  SELECT vec_id, UNNEST(embedding) AS cv, generate_subscripts(embedding, 1) AS i
      |  FROM embeddings),
      |j AS (
      |  SELECT c.vec_id,
      |         SUM(CAST(c.cv AS DOUBLE) * CAST(p.pv AS DOUBLE)) AS dot,
      |         SUM(CAST(c.cv AS DOUBLE) * CAST(c.cv AS DOUBLE)) AS nc,
      |         SUM(CAST(p.pv AS DOUBLE) * CAST(p.pv AS DOUBLE)) AS np
      |  FROM cand c JOIN probe p ON c.i = p.i GROUP BY c.vec_id)
      |SELECT vec_id, ROUND(dot / (SQRT(nc) * SQRT(np)), 3) AS sim
      |FROM j ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin), headline = true) { (s, dir) =>
    val emb = Tables.load(s, dir, "embeddings")
    val probe = emb.filter(col("vec_id") === 1).select(col("embedding").as("pe"))
    emb.crossJoin(broadcast(probe))
      .select(col("vec_id"),
        round(Vectors.cosineSim(col("embedding"), col("pe")), 3).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** Embedding-cosine near-duplicate pairs (all-pairs baseline), full oracle.
    * zip_with/aggregate keeps the math in one pass per pair — no explode.
    */
  val d_embed_neardup: Query = q("d_embed_neardup", Some(
    """WITH u AS (
      |  SELECT vec_id, UNNEST(embedding) AS v, generate_subscripts(embedding, 1) AS i
      |  FROM embeddings),
      |p AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |         SUM(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS dot,
      |         SUM(CAST(a.v AS DOUBLE) * CAST(a.v AS DOUBLE)) AS na,
      |         SUM(CAST(b.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS nb
      |  FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, ROUND(dot / (SQRT(na) * SQRT(nb)), 3) AS sim
      |FROM p WHERE dot / (SQRT(na) * SQRT(nb)) >= 0.4
      |ORDER BY id_a, id_b""".stripMargin)) { (s, dir) =>
    val emb = Tables.load(s, dir, "embeddings")
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    val sim = Vectors.cosineSim(col("ea"), col("eb"))
    a.join(b, col("id_a") < col("id_b"))
      .filter(sim >= 0.4)
      .select(col("id_a"), col("id_b"), round(sim, 3).as("sim"))
      .orderBy("id_a", "id_b")
  }

  /** ANN, scale path: 8 random-hyperplane sign bits (deterministic pseudo-
    * random planes from xxhash64) -> bucket equi-join -> exact cosine inside
    * the probe's bucket. xxhash64-based -> rows-only.
    */
  val s_ann_lsh: Query = q("s_ann_lsh", None) { (s, dir) =>
    val planes = // plane(j, d) in [-0.5, 0.5], deterministic
      "(CAST(pmod(xxhash64(j * 64 + d), 1001) AS DOUBLE) / 1000.0 - 0.5)"
    val bucketExpr = expr(
      s"""aggregate(sequence(0, 7), CAST(0 AS BIGINT), (acc, j) -> acc * 2 +
         |  CASE WHEN aggregate(sequence(0, size(embedding) - 1), CAST(0.0 AS DOUBLE),
         |    (dot, d) -> dot + CAST(element_at(embedding, d + 1) AS DOUBLE) * $planes) > 0
         |  THEN 1 ELSE 0 END)""".stripMargin)
    val emb = Tables.load(s, dir, "embeddings").withColumn("bucket", bucketExpr)
    val probe = emb.filter(col("vec_id") === 1)
      .select(col("bucket").as("pbucket"), col("embedding").as("pe"))
    val sim = Vectors.cosineSim(col("embedding"), col("pe"))
    emb.join(broadcast(probe), col("bucket") === col("pbucket"))
      .select(col("vec_id"), round(sim, 3).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
  }

  // ------------------------------------------------------- text analysis

  val q22_text_stats: Query = q("q22_text_stats", Some(
    """SELECT lang, COUNT(*) AS docs, ROUND(AVG(n_chars), 2) AS avg_chars,
      |       MIN(n_chars) AS mn, MAX(n_chars) AS mx
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"), round(avg(col("n_chars")), 2).as("avg_chars"),
        min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"))
      .orderBy("lang")
  }

  /** Stopword-profile language ID (n-gram heuristic), full oracle: occurrence
    * counting via the length/replace identity, identical in both engines.
    */
  val t_langid: Query = {
    def occSql(kw: String): String =
      s"(length(p) - length(replace(p, ' $kw ', ''))) / CAST(${kw.length + 2} AS DOUBLE)"
    val scores = Map(
      "en" -> Seq("the", "and", "of"),
      "de" -> Seq("der", "und", "die"),
      "es" -> Seq("el", "la", "los"),
      "fr" -> Seq("le", "et", "les"))
    def scoreSql(lang: String): String = scores(lang).map(occSql).mkString(" + ")
    val caseSql =
      s"""CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         |     WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
         |     WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END""".stripMargin
    q("t_langid", Some(
      s"""WITH p0 AS (SELECT doc_id, CONCAT(' ', LOWER(text), ' ') AS p FROM documents),
         |sc AS (SELECT doc_id, ${scoreSql("en")} AS s_en, ${scoreSql("de")} AS s_de,
         |              ${scoreSql("es")} AS s_es, ${scoreSql("fr")} AS s_fr FROM p0)
         |SELECT doc_id, $caseSql AS pred_lang,
         |       ROUND(GREATEST(s_en, s_de, s_es, s_fr), 4) AS top_score
         |FROM sc ORDER BY doc_id""".stripMargin), headline = true) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("p", concat(lit(" "), lower(col("text")), lit(" ")))
        .withColumn("s_en", expr(scoreSql("en")))
        .withColumn("s_de", expr(scoreSql("de")))
        .withColumn("s_es", expr(scoreSql("es")))
        .withColumn("s_fr", expr(scoreSql("fr")))
        .select(col("doc_id"), expr(caseSql).as("pred_lang"),
          round(greatest(col("s_en"), col("s_de"), col("s_es"), col("s_fr")), 4).as("top_score"))
        .orderBy("doc_id")
    }
  }

  /** Quality scoring: token count, mean token length, punctuation ratio, and a
    * logistic composite score. The logistic keeps the score transcendental so
    * the ROUND boundary can't land on an exact terminating decimal (where
    * Spark's repr-based and DuckDB's binary-based rounding diverge).
    */
  val t_quality: Query = q("t_quality", Some(
    """WITH m AS (
      |  SELECT doc_id,
      |         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
      |         CAST(length(replace(text, ' ', '')) AS DOUBLE) /
      |           (length(text) - length(replace(text, ' ', '')) + 1) AS avg_tok_len,
      |         CAST(length(text) - length(replace(replace(text, '.', ''), ',', '')) AS DOUBLE) /
      |           GREATEST(length(text), 1) AS punct_ratio
      |  FROM documents)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |       ROUND(avg_tok_len, 4) AS avg_tok_len,
      |       ROUND(punct_ratio, 4) AS punct_ratio,
      |       ROUND(1.0 / (1.0 + EXP(-(avg_tok_len - 4.0 + n_tokens / 50.0))), 4) AS quality
      |FROM m ORDER BY doc_id""".stripMargin)) { (s, dir) =>
    val nTokens = length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1
    val avgTokLen = length(regexp_replace(col("text"), " ", "")).cast("double") / nTokens
    val punct = (length(col("text")) -
      length(regexp_replace(regexp_replace(col("text"), "\\.", ""), ",", ""))).cast("double") /
      greatest(length(col("text")), lit(1))
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), nTokens.cast("long").as("n_tokens"),
        round(avgTokLen, 4).as("avg_tok_len"), round(punct, 4).as("punct_ratio"),
        round(lit(1.0) / (lit(1.0) + exp(-(avgTokLen - 4.0 + nTokens / 50.0))), 4).as("quality"))
      .orderBy("doc_id")
  }

  /** Token counting per source: whitespace tokens + regex word tokens,
    * aggregated. DuckDB SUM(BIGINT) is HUGEINT -> cast back.
    */
  val t_tokens: Query = q("t_tokens", Some(
    """WITH m AS (
      |  SELECT source,
      |         length(text) - length(replace(text, ' ', '')) + 1 AS ws_tokens,
      |         len(regexp_extract_all(text, '[a-z]+')) AS word_tokens
      |  FROM documents)
      |SELECT source, COUNT(*) AS docs,
      |       CAST(SUM(ws_tokens) AS BIGINT) AS total_ws_tokens,
      |       CAST(SUM(word_tokens) AS BIGINT) AS total_word_tokens,
      |       ROUND(AVG(word_tokens), 2) AS avg_word_tokens
      |FROM m GROUP BY source ORDER BY source""".stripMargin)) { (s, dir) =>
    val ws = (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1).cast("long")
    val words = size(expr("regexp_extract_all(text, '[a-z]+', 0)")).cast("long")
    Tables.load(s, dir, "documents")
      .select(col("source"), ws.as("ws_tokens"), words.as("word_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(col("ws_tokens")).as("total_ws_tokens"),
        sum(col("word_tokens")).as("total_word_tokens"),
        round(avg(col("word_tokens")), 2).as("avg_word_tokens"))
      .orderBy("source")
  }

  /** Document fingerprinting: xxhash64 full-text fingerprint plus a positional
    * sample fingerprint (first/middle/last 8-gram). Deterministic; xxhash64
    * has no DuckDB twin -> rows-only.
    */
  val t_fingerprint: Query = q("t_fingerprint", None) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        xxhash64(col("text")).as("fp_full"),
        xxhash64(expr("substring(text, 1, 8)"),
          expr("substring(text, greatest(length(text) / 2, 1), 8)"),
          expr("substring(text, greatest(length(text) - 7, 1), 8)")).as("fp_sample"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------ time windows (events)

  val q23_time_bucket: Query = q("q23_time_bucket", Some(
    """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS h,
      |       event_type, COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sv
      |FROM events GROUP BY h, event_type ORDER BY h, event_type""".stripMargin),
    headline = true) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("h"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sv"))
      .orderBy("h", "event_type")
  }

  /** Sliding window (2h window, 1h slide) — batch twin of the Structured
    * Streaming window() operator; oracle enumerates the two covering windows.
    */
  val w_sliding_window: Query = q("w_sliding_window", Some(
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      |w AS (
      |  SELECT date_trunc('hour', ts) - k.k * INTERVAL 1 HOUR AS ws, event_type
      |  FROM e, (SELECT UNNEST([0, 1]) AS k) k)
      |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS ws, event_type, COUNT(*) AS cnt
      |FROM w GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin)) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("event_type"), col("cnt"))
      .orderBy("ws", "event_type")
  }

  /** Session windows (30 min gap) per user — batch twin of Structured
    * Streaming session_window; oracle is the gaps-and-islands formulation.
    * Spark starts a new session when gap >= the timeout (window end is
    * exclusive), hence >= in the oracle's break condition.
    */
  val w_session_window: Query = q("w_session_window", Some(
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      |x AS (
      |  SELECT *, CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |                   OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |                      >= INTERVAL 30 MINUTE
      |            THEN 1 ELSE 0 END AS brk FROM e),
      |y AS (
      |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      |            ROWS UNBOUNDED PRECEDING) AS sess FROM x)
      |SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sv
      |FROM y GROUP BY user_id, sess ORDER BY user_id, session_start""".stripMargin),
    headline = true) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sv"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("sv"))
      .orderBy("user_id", "session_start")
  }

  // ------------------------------------------------- multimodal plumbing

  /** Opaque-binary column plumbing: utf-8 encode -> byte length + SHA-256.
    * Proves the binary-column path end to end with a full oracle (DuckDB
    * sha256(VARCHAR) hashes the same utf-8 bytes).
    */
  val m_binary_meta: Query = q("m_binary_meta", Some(
    """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS nbytes,
      |       sha256(text) AS digest
      |FROM documents ORDER BY doc_id""".stripMargin)) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        length(encode(col("text"), "UTF-8")).cast("long").as("nbytes"),
        sha2(encode(col("text"), "UTF-8"), 256).as("digest"))
      .orderBy("doc_id")
  }

  val all: Seq[Query] = Seq(
    q21_dup_counts, q21_dedup_first, d_ngram_jaccard, d_minhash_lsh, d_simhash,
    q24_cosine_topk, d_embed_neardup, s_ann_lsh,
    q22_text_stats, t_langid, t_quality, t_tokens, t_fingerprint,
    q23_time_bucket, w_sliding_window, w_session_window, m_binary_meta)
}
