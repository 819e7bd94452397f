package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.SparkSpec
import graft.tables.Tables

/** The composed exact-collapse -> near-dup pipeline must produce EXACTLY
  * the direct transitive closure over all hamming<=6 pairs — the whole
  * point of the composition is that collapsing exact duplicates first
  * changes the COST (pair-gen over distinct texts, not raw docs), never
  * the result.
  */
class CollapseNeardupSpec extends SparkSpec {

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir).collect().toSeq

  test("composed pipeline equals the direct cluster resolution (sf0.01)") {
    val dir = "/root/testdata/sf0.01"
    assert(run("p_collapse_neardup", dir) == run("d_dup_clusters", dir))
  }

  test("fan-out is exact on a duplication-heavy corpus (5x exact copies)") {
    // the crawl-shaped adversary: every doc repeated 5x under fresh ids.
    // Exercises the fan-out branches the plain corpus barely hits — multi-
    // doc exact groups whose rep is near-novel (cluster = rep), and labels
    // fanning out to every copy. The direct resolution recomputes from the
    // duplicated corpus via its own (index-fed) path, so equality here is
    // a genuine two-path differential.
    val src = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dup = (0 until 5).map(i =>
        src.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
    val dir = Files.createTempDirectory("graft_collapse_dup_").toString
    dup.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val composed = run("p_collapse_neardup", dir)
    val direct = run("d_dup_clusters", dir)
    assert(composed == direct)
    // every doc is an exact dup here, so every doc must be clustered and
    // each original doc's 5 copies share one cluster
    assert(composed.size == dup.count())

    // the collapse-first MinHash must emit the identical exact pair set the
    // direct LSH+verify emits on the duplicated corpus — within-group 1.0
    // pairs, cross-group inherited-jac pairs, nothing else
    assert(run("d_minhash_collapse", dir) == run("d_minhash_lsh", dir))
  }

  test("collapse-first MinHash equals direct LSH+verify (sf0.01)") {
    val dir = "/root/testdata/sf0.01"
    assert(run("d_minhash_collapse", dir) == run("d_minhash_lsh", dir))
  }
}
