package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** Behavioral contract of the substring-removal rewrite (p_cut_spans)
  * against the detection relation (d_substring_dedup) on the same corpus.
  */
class CutSpansSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("rewrite invariants: verbatim untouched docs, consistent counts, real cuts") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_orig"))
    val out = graft.SparkEntry.queries("p_cut_spans")(spark, sfDir)
    val spanDocs = graft.SparkEntry.queries("d_substring_dedup")(spark, sfDir)
      .select("doc_id").distinct()

    val j = out.join(docs, "doc_id")
      .join(spanDocs.withColumn("marked", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_kept"), col("text_out"), col("text"),
        col("n_orig"), coalesce(col("marked"), lit(false)).as("marked"))
      .collect()

    assert(j.length == docs.count(), "one output row per document")
    for (r <- j) {
      val (nKept, textOut, text, nOrig, marked) =
        (r.getLong(1), r.getString(2), r.getString(3), r.getLong(4), r.getBoolean(5))
      // token count of the rewritten text matches n_kept (empty = 0 tokens)
      val outToks = if (textOut.isEmpty) 0L else textOut.split(" ", -1).length.toLong
      assert(outToks == nKept, s"doc ${r.getLong(0)}: $outToks tokens vs n_kept=$nKept")
      assert(nKept <= nOrig)
      // a document with no duplicated span passes through verbatim
      if (!marked) assert(textOut == text,
        s"unmarked doc ${r.getLong(0)} was rewritten")
    }
    // the cut is real: some marked doc lost tokens (first-occurrence
    // holders may legitimately keep everything)
    assert(j.exists(r => r.getBoolean(5) && r.getLong(1) < r.getLong(4)),
      "no marked document lost any token — the rewrite did nothing")
  }
}
