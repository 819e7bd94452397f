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

  test("capstone near-dup pipeline: survivor set equals the brute-force closure (sf0.01)") {
    val dir = "/root/testdata/sf0.01"
    // the cleaning pass (independently differentially gated) defines the
    // kept set the capstone's near-dup stage starts from
    val kept = SparkEntry.queries("p_clean_corpus")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // brute force: ALL-pairs hamming<=6 over kept docs' simhashes (no
    // banding), transitive closure via union-find, non-minimum members drop
    val sigs = Tables.load(spark, dir, "documents")
      .filter(col("doc_id").isInCollection(kept))
      .select(col("doc_id"), graft.functions.SimHash.simhash63Occ(col("text")).as("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map(sigs.map(s => s._1 -> s._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      if java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) <= 6
    } parent(find(sigs(i)._1)) = find(sigs(j)._1)
    val byRoot = sigs.map(_._1).groupBy(find)
    val drops = byRoot.values.filter(_.length > 1).flatMap(g => g.sorted.tail).toSet
    assert(drops.nonEmpty,
      "kept corpus produced no near-dup clusters; the prune path went untested")
    val got = SparkEntry.queries("p_pipeline_neardup")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == kept -- drops)
  }
}
