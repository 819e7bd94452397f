package graft.queries

import graft.SparkEntry
import graft.SparkSpec

/** Scale-plan regression guard: the dedup/similarity operators must never
  * plan an all-pairs join (BroadcastNestedLoopJoin collects a whole side to
  * every executor; CartesianProduct shuffles n^2 rows). Round 1 shipped two
  * such plans (d_simhash, d_embed_neardup) — this spec keeps them dead.
  *
  * q24_cosine_topk is exempt by design: its cross join broadcasts a single
  * probe row, which is the correct plan for probe-vs-corpus scoring.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val banned = Seq("BroadcastNestedLoopJoin", "CartesianProduct")
  // exempt: q24/s_ann_* broadcast a single probe row/vector by design;
  // streaming + pipeline-execution queries run side effects on plan access
  // t_bm25 cross-joins a SINGLE corpus-stats row (broadcast by design,
  // like q24's probe row); e_gapfill crosses a 1-row-bounds-derived hour
  // spine with the tiny type dimension — both sides bounded by design
  // t_heavy_hitters crosses the exact top-5 with a ONE-row sketch aggregate
  // s_knn_batch broadcasts a 20-row bounded-by-construction probe batch;
  // t_unigram_surprise crosses a ONE-row corpus-total aggregate (like t_bm25)
  // p_domain_mix / p_mixture_sample cross a ONE-row normalizer aggregate
  // (like t_bm25); s_ann_pq_rerank crosses a ONE-row probe vector with its
  // 32-id broadcast shortlist (q24's probe-row pattern, both sides bounded)
  // s_ann_filtered: q24's broadcast-1-row-probe pattern over the filtered scan
  private val exempt = Set("q24_cosine_topk", "s_ann_filtered", "s_ann_lsh", "s_ann_ivf",
    "s_ann_ivf_trained", "t_bm25", "s_knn_batch", "t_unigram_surprise",
    "t_heavy_hitters", "p_domain_mix", "p_mixture_sample",
    "s_ann_pq_rerank",
    "e_gapfill", "st_tumbling", "st_session", "st_user_totals",
    "r_unload_roundtrip", "r_jdbc_roundtrip")
  private val audited =
    graft.SparkEntry.catalog.map(_.name).filterNot(exempt)

  for (name <- audited) test(s"$name plans without an all-pairs join") {
    val plan = SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString
    banned.foreach(b => assert(!plan.contains(b), s"$b found in $name plan:\n$plan"))
  }

  test("filters reach the parquet scan (PushedFilters)") {
    for (name <- Seq("q2_filter", "q4_date_range")) {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]".r // non-empty filter list
      assert(pushed.findFirstIn(plan).isDefined,
        s"$name scan lost its pushed filters:\n$plan")
    }
  }

  test("q21_dedup_first reads the corpus exactly once (single-pass dedup)") {
    // the old plan re-scanned documents to resolve h1 collisions on text;
    // distinct h2 already witnesses distinct texts, so one scan suffices
    val plan = SparkEntry.queries("q21_dedup_first")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 corpus scan, found $scans:\n$plan")
  }

  for (name <- Seq("d_ngram_jaccard_prefix", "d_simhash", "d_simhash_weighted",
    "d_minhash_lsh", "d_embed_neardup_lsh"))
  test(s"$name evaluates its signature scan once via ReusedExchange") {
    // every banded pair generator self-joins two IDENTICAL subplans with a
    // SHUFFLE_HASH hint (prefix join: identical window shuffle) precisely
    // so ReuseExchange materializes the signature scan once; if a plan
    // change (dropped hint, diverged sides) breaks that, the kernel pass
    // runs per join side again (final ADAPTIVE plan — reuse is decided at
    // runtime, so the query must execute first)
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"no ReusedExchange in $name final plan:\n$plan")
  }

  test("fused kernels evaluate inside WholeStageCodegen spans") {
    // the custom Expressions implement doGenCode precisely so the hot scans
    // stay in generated code; a kernel falling out of codegen (e.g. a
    // CodegenFallback regression) shows up as its expression line losing
    // the "*(" whole-stage marker in the executed plan
    val kernelIn = Seq(
      "d_simhash" -> "simhash63_occ",
      "d_simhash_weighted" -> "simhash63_tf",
      "d_minhash_lsh" -> "min_hash_ngram_sig",
      "t_decontam" -> "char_ngrams",
      "d_substring_dedup" -> "rolling_window_hash")
    for ((name, kernel) <- kernelIn) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // AQE: codegen spans only appear in the FINAL plan
      val plan = df.queryExecution.executedPlan.toString
      val lines = plan.linesIterator.filter(_.contains(kernel)).toSeq
      assert(lines.nonEmpty, s"$kernel not found in $name plan:\n$plan")
      assert(lines.exists(l => l.contains("*(")),
        s"$kernel runs OUTSIDE WholeStageCodegen in $name:\n${lines.mkString("\n")}")
    }
  }

  test("q41_multi_exists decorrelates both subqueries to semi/anti joins") {
    // the EXISTS must become a LEFT SEMI join and the NOT EXISTS a LEFT
    // ANTI join on l_orderkey (RewritePredicateSubquery), each carrying
    // the <> correlation as a join condition — never a per-row subquery
    // (no SubqueryExec over lineitem, no nested-loop fallback)
    val plan = SparkEntry.queries("q41_multi_exists")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"no LeftSemi join in q41 plan:\n$plan")
    assert(plan.contains("LeftAnti"), s"no LeftAnti join in q41 plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop fallback in q41 plan:\n$plan")
  }

  test("q43_scd2_lookup plans the temporal lookup as an equi hash join") {
    // custkey equality is the join key; the valid_from <= d < valid_to
    // bounds must ride as a residual condition on that hash join — the
    // point-in-time lookup is NOT a range join and must never fall back
    // to a nested-loop over the version rows
    val plan = SparkEntry.queries("q43_scd2_lookup")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashJoin"), s"no hash join in q43 plan:\n$plan")
    val joinLine = plan.linesIterator.find(_.contains("HashJoin")).get
    assert(joinLine.contains(">=") && joinLine.contains("<"),
      s"date bounds not a residual on the hash join:\n$joinLine")
  }

  test("d_ngram_jaccard does not broadcast the per-doc sizes side") {
    // sizes is one row per document — a broadcast hint on it is a driver OOM
    // at scale. AQE may still *choose* to broadcast at this sf; the guard is
    // that no explicit hint forces it: the optimized logical plan must not
    // contain a ResolvedHint over the aggregated sizes subtree.
    val df = SparkEntry.queries("d_ngram_jaccard")(spark, sfDir)
    val hinted = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hinted.isEmpty, "explicit broadcast hint found in d_ngram_jaccard")
  }
}
