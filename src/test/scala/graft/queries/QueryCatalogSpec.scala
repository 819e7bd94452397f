package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Smoke + invariants for the full query catalog at sf0.001. The value-level
  * gate is the DuckDB differential (tools/compare.py / the driver); this spec
  * pins cheap structural invariants per query.
  */
class QueryCatalogSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // r10: the formerly-vacuous contracts (q21_dup_counts, q11_anti_join,
  // q17_except, d_embed_neardup_lsh) now emit rows at every SF — planted
  // re-crawl slices / filtered operands, see their scaladoc — so EVERY
  // catalog entry must return rows here
  private val mayBeEmpty = Set.empty[String]

  test("every catalog entry has a unique name and runnable plan") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.length == names.length)
    assert(SparkEntry.queries.keySet == names.toSet)
  }

  SparkEntry.catalog.foreach { q =>
    test(s"${q.name}: executes at sf0.001 with stable schema and rows") {
      val df = q.run(spark, sfDir)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
      // column names are lowercase and non-empty (oracle compare sorts by name)
      assert(df.columns.nonEmpty && df.columns.forall(c => c == c.toLowerCase))
    }
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle map only references declared queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
