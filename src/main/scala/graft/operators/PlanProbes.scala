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

  /** Cluster `df` by its bucket column before a partitionBy write so each
    * bucket directory receives a BOUNDED file count, without capping the
    * writer's parallelism at the bucket count (r18): a bare
    * `repartition(bucketCol)` is AQE-coalescable (measured collapsing the
    * parquet encode to 1-4 tasks); `repartition(nBuckets, bucketCol)`
    * pins the count but serializes the encode when nBuckets < cores
    * (fixture-sized NB = 8 on a 32-core box). The salted form keeps every
    * core busy: rows are hashed into `nBuckets x s` partitions on
    * (bucket, salt-of-key), so each partition holds rows of exactly one
    * bucket — files per (bucket, batch) directory <= s = cores/buckets,
    * write parallelism ~ cores. The salt derives DETERMINISTICALLY from
    * `saltSrc` (never rand() — retried tasks must reproduce the same
    * row-to-partition map, SPARK-38388).
    */
  def clusteredBy(df: org.apache.spark.sql.DataFrame,
                  bucketCol: org.apache.spark.sql.Column, nBuckets: Int,
                  saltSrc: org.apache.spark.sql.Column)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val s = math.max(1, df.sparkSession.sparkContext.defaultParallelism / nBuckets)
    if (s == 1) df.repartition(nBuckets, bucketCol)
    else df.repartition(nBuckets * s,
      bucketCol * lit(s) + pmod(xxhash64(lit(1), saltSrc), lit(s)))
  }
}
