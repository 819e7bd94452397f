package graft.operators

import org.apache.spark.sql.DataFrame

/** Plan-only probes shared by the persisted-artifact writers (r18). */
private[operators] object PlanProbes {

  /** Whether the OPTIMIZER reduced `df` to an empty local relation — true
    * for the `.limit(0)` / empty-slice frames callers pass for untouched
    * sides. Plan-only (never executes a job), conservatively false for
    * any frame that would need running to know — so it can only ever SKIP
    * work that is provably a no-op (an empty-side append still costs a
    * full write-job round trip per subtable per batch).
    */
  def provablyEmpty(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        l.data.isEmpty
      case _ => false
    }
}
