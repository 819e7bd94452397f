package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SparkSessionExtensions entry point: registers the engine's codegen
  * kernels as SQL functions, so the surface is reachable from plain
  * `spark.sql(...)` (not just the Column API):
  *
  *   char_ngrams(text, n)            distinct character n-grams
  *   min_hash_sig(shingles, k)       MinHash signature of an array
  *   min_hash_ngram_sig(text, n, k)  fused (count, signature) from text
  *   hyper_fp(embedding, nBits)      hyperplane sign fingerprint
  *   cosine_sim(a, b)                exact cosine over float arrays
  *   pg_bool(s)                      't'/'f'/'' Postgres bool parse
  *   unload_split(line, delim, n)    UNLOAD ESCAPE field split
  *   unload_escape(s, delim)         UNLOAD ESCAPE writer-side escape
  *   band_hashes(sig, b, r)          LSH band bucket hashes
  *   rolling_window_hash(text, w)    Rabin-Karp w-token window hashes
  *
  * Enable with `spark.sql.extensions=graft.engine.GraftExtensions` (set by
  * [[Sessions.builder]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal, got $other")
  }

  private def charArg(e: Expression, fn: String, pos: Int): Char = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) if s.numChars() == 1 =>
      s.toString.charAt(0)
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a single-character string literal, got $other")
  }

  private def register(ext: SparkSessionExtensions, name: String, usage: String)
                      (builder: FunctionBuilder): Unit =
    ext.injectFunction((new FunctionIdentifier(name),
      new ExpressionInfo("graft", name, usage), builder))

  override def apply(ext: SparkSessionExtensions): Unit = {
    // session-policy sketch rewrite (default off) — see ApproxDistinctRewrite
    ext.injectOptimizerRule(graft.plans.ApproxDistinctRewrite)
    // native as-of join: plans graft.plans.AsofJoinPlan -> AsofJoinExec
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)

    register(ext, "char_ngrams", "char_ngrams(text, n) - distinct character n-grams") {
      args => CharNgrams(args(0), intArg(args(1), "char_ngrams", 1))
    }
    register(ext, "min_hash_sig", "min_hash_sig(shingles, k) - MinHash signature") {
      args => MinHashSig(args(0), intArg(args(1), "min_hash_sig", 1))
    }
    register(ext, "min_hash_ngram_sig",
      "min_hash_ngram_sig(text, n, k) - fused (distinct count, MinHash signature)") {
      args => MinHashNgramSig(args(0), intArg(args(1), "min_hash_ngram_sig", 1),
        intArg(args(2), "min_hash_ngram_sig", 2))
    }
    register(ext, "hyper_fp", "hyper_fp(embedding, nBits) - hyperplane sign fingerprint") {
      args => HyperFp(args(0), intArg(args(1), "hyper_fp", 1))
    }
    register(ext, "cosine_sim", "cosine_sim(a, b) - exact cosine similarity") {
      args => CosineSim(args(0), args(1))
    }
    register(ext, "pg_bool", "pg_bool(s) - 't'/'f'/'' Postgres boolean parse") {
      args => PgBoolParse(args(0))
    }
    register(ext, "unload_split",
      "unload_split(line, delim, numFields) - UNLOAD ESCAPE field split") {
      args => UnloadSplit(args(0), charArg(args(1), "unload_split", 1),
        intArg(args(2), "unload_split", 2))
    }
    register(ext, "unload_escape", "unload_escape(s, delim) - UNLOAD ESCAPE writer escape") {
      args => UnloadEscape(args(0), charArg(args(1), "unload_escape", 1))
    }
    register(ext, "simhash63", "simhash63(md5_hashes) - 63-bit SimHash, weight 1 per entry") {
      args => SimHash63(args(0))
    }
    register(ext, "simhash63_weighted",
      "simhash63_weighted(md5_hashes, weights) - 63-bit weighted SimHash") {
      args => SimHash63Weighted(args(0), args(1))
    }
    register(ext, "simhash63_tf",
      "simhash63_tf(text) - fused tokenize + tf-weighted 63-bit SimHash") {
      args => SimHash63Tf(args(0))
    }
    register(ext, "l2_sq", "l2_sq(a, b) - squared L2 distance of float vectors") {
      args => L2Sq(args(0), args(1))
    }
    register(ext, "band_hashes",
      "band_hashes(sig, nBands, rowsPerBand) - LSH band bucket hashes of a MinHash signature") {
      args => BandHash(args(0), intArg(args(1), "band_hashes", 1),
        intArg(args(2), "band_hashes", 2))
    }
    register(ext, "rolling_window_hash",
      "rolling_window_hash(text, w) - O(n) Rabin-Karp hashes of every w-TOKEN window") {
      args => RollingWindowHash(args(0), intArg(args(1), "rolling_window_hash", 1))
    }
  }
}
