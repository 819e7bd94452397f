package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** JVM-level memo of persisted-artifact parquet SCHEMAS (r18).
  *
  * Every `spark.read.parquet(p).schema` is a footer-inference pass — a
  * driver job per call — and the lifecycle operators consult their
  * schema sidecars and mode markers constantly: one e_pipeline_cdc
  * execution was measured at 184 jobs with none over 0.8 s, a large
  * share of them exactly these single-task schema reads. A subtable's
  * schema changes ONLY when its writer rebuilds it (build / sidecar
  * overwrite), so the writers invalidate and every other consult is a
  * map hit.
  *
  * Scope/safety: per-JVM, keyed by path string. The artifacts are
  * single-writer by contract; a rebuild in ANOTHER JVM while this one
  * holds readers was already unsound (the uncached read would race the
  * root delete), so the memo narrows no guarantee. Streamed appends
  * never change a schema (append-only under a fixed sidecar).
  */
private[operators] object SchemaCache {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** The parquet schema at `path`, memoized. */
  def parquetSchema(spark: SparkSession, path: String): StructType =
    cache.computeIfAbsent(path, p => spark.read.parquet(p).schema)

  /** Drop `path`'s entry — call after (re)writing the file(s) at it. */
  def invalidate(path: String): Unit = cache.remove(path)

  /** Drop every entry under `prefix` — call after deleting a root. */
  def invalidatePrefix(prefix: String): Unit =
    cache.keySet.removeIf(_.startsWith(prefix))
}
