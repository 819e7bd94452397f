package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Shared delete-vector machinery for the persisted indexes — the
  * right-to-be-forgotten lifecycle step ([[SignatureIndex.forget]] is the
  * canonical user; [[MinHashIndex]] and [[SubstringIndex]] share it).
  *
  * Design (the Delta/Iceberg deletion-vector pattern applied to the index
  * artifacts): a forget request APPENDS the forgotten ids to an
  * underscore-prefixed `_tombstones` table inside the index directory —
  * invisible to plain parquet reads, O(deletes) per request — and every
  * query-path read goes through [[live]], which anti-joins the tombstones
  * out. Physical reclamation rides [[IndexMaintenance.compact]] (it
  * anti-joins on the tombstone table's own columns and retires the table
  * with the directory swap). Until compaction, deleted rows stay
  * physically present, so `nextBatch` never shrinks and no batch id is
  * reused. Writer contract: forget is an appender — serialize with
  * ingest under the index's single-writer discipline.
  */
private[graft] object Tombstones {

  def dir(path: String): String = path + "/_tombstones"

  /** Append forgotten ids (distinct projection of `idCol`). */
  def forget(spark: SparkSession, path: String, ids: DataFrame,
             idCol: String = "doc_id"): Unit =
    ids.select(col(idCol)).distinct()
      .write.mode("append").parquet(dir(path))

  /** Anti-join an ALREADY-READ relation against `path`'s tombstones —
    * the one copy of the delete-vector read, shared by callers whose base
    * read is pre-filtered (partition-pruned, schema-sidecar'd) and by
    * [[live]].
    */
  def applyTo(df: DataFrame, spark: SparkSession, path: String,
              idCol: String): DataFrame = {
    val td = new org.apache.hadoop.fs.Path(dir(path))
    val fs = td.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(td)) df
    else df.join(spark.read.parquet(dir(path)).select(idCol).distinct(),
      Seq(idCol), "left_anti")
  }

  /** The live view: stored rows minus tombstoned ids. */
  def live(spark: SparkSession, path: String, idCol: String = "doc_id"): DataFrame =
    applyTo(spark.read.parquet(path), spark, path, idCol)
}
