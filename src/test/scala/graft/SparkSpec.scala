package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session (one per suite, lazily created). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  /** The FINAL physical plan with any AQE wrapper unwrapped — plan-shape
    * assertions against `executedPlan` silently see only an
    * AdaptiveSparkPlanExec leaf otherwise (collectLeaves on the wrapper
    * finds no FileSourceScanExec, turning <=-style assertions vacuous).
    * Executes the frame first so AQE has finalized.
    */
  def finalPlan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.execution.SparkPlan = {
    df.collect() // noop-write would spawn a SEPARATE QueryExecution; collect
    // drives THIS one, so the adaptive wrapper below is finalized
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** Every FileSourceScanExec in the FINAL plan, descending through AQE
    * query-stage boundaries — QueryStageExec nodes are LEAVES whose
    * subtree (where the actual scans live) `collect` never enters, so a
    * naive `plan.collect { case f: FileSourceScanExec => f }` silently
    * returns empty on any adaptive plan.
    */
  def fileScans(df: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.FileSourceScanExec
    def go(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case f: FileSourceScanExec => Seq(f)
        case q: QueryStageExec => go(q.plan)
      }.flatten
    go(finalPlan(df))
  }
}

object SparkTestSession {
  lazy val get: SparkSession = {
    val s = graft.engine.Sessions.builder(master = "local[4]", shufflePartitions = 4)
      // per-JVM warehouse (r19): `sbt test` now runs suites in PARALLEL
      // forked JVM groups (build.sbt testGrouping) — catalog writes
      // (saveAsTable / CREATE DATABASE without LOCATION) from two groups
      // would otherwise race on the shared cwd ./spark-warehouse
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_test_wh_").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
