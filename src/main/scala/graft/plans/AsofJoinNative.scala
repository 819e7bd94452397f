package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.DataFrame

/** Native as-of join — the full custom-operator ladder (SURVEY §7 step c):
  * a logical node ([[AsofJoinPlan]]), a planner strategy
  * ([[AsofJoinStrategy]], injected by [[graft.engine.GraftExtensions]]) and a
  * physical sort-merge operator ([[AsofJoinExec]]).
  *
  * Semantics are identical to [[graft.operators.AsofJoin.leftAsof]] (DuckDB
  * `ASOF LEFT JOIN ... ON p.key = b.key AND p.ts >= b.ts`, build row AT the
  * probe timestamp visible): every probe row is emitted once, carrying the
  * payload of the latest build row at-or-before its timestamp within the same
  * key, or NULLs when no build row precedes.
  *
  * Why a physical operator when the union+window rewrite already works: the
  * rewrite shuffles probe AND build rows through one exchange, padding each
  * side with the other's columns (union schema alignment), then runs a window
  * whose frame machinery buffers rows per key. This node declares
  * `ClusteredDistribution(key)` + `(key, ts)` ordering per child, so each side
  * is exchanged in ITS OWN schema (no null padding) and the merge is a single
  * forward pass holding exactly ONE build payload in memory per task — the
  * plan a purpose-built time-series engine runs, expressed as a first-class
  * Spark operator. Probe-side filters still push to the scan because the probe
  * plan below the node is untouched Catalyst territory.
  *
  * Scale contract: one hash exchange per side on the join key, per-partition
  * sort (both spillable), merge pass is O(left + right) per partition with
  * O(1) state. No BroadcastNestedLoopJoin, no quadratic per-key candidate
  * expansion, no row padding.
  */
object AsofJoinNative {

  /** Left as-of join via the native operator. The build side must be unique
    * per (key, ts) — pre-aggregate it if not (same contract as the rewrite).
    * Output: all probe columns, then `asof_ts` (the matched build timestamp)
    * and the payload columns, NULL where no build row precedes.
    */
  def leftAsof(probe: DataFrame, build: DataFrame, key: String, ts: String,
               payload: Seq[String]): DataFrame = {
    val spark = probe.sparkSession
    // Every right-side column the node references is re-ALIASED at the right
    // subtree's root. Probe and build often derive from the same base
    // DataFrame (self-as-of), so the analyzer's DeduplicateRelations re-ids
    // the right subtree's relation attributes — a node expression holding the
    // shared original exprId would silently re-resolve against the LEFT
    // child. Alias exprIds are minted fresh here and survive dedup, so the
    // node's right references stay unambiguous. (Also prunes the build scan
    // to key+ts+payload and keeps output names collision-free.)
    val buildSel = build.select(
      col(key).as("__asof_key") +: col(ts).as("asof_ts") +:
        payload.map(p => col(p).as(p)): _*)
    val lPlan = Bridge.analyzed(probe)
    val rPlan = Bridge.analyzed(buildSel)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asof join: column '$n' not in ${p.output.map(_.name).mkString(", ")}"))
    val rTs = attr(rPlan, "asof_ts")
    val pay = rTs +: payload.map(attr(rPlan, _))
    Bridge.ofRows(spark, AsofJoinPlan(
      lPlan, rPlan,
      Seq(attr(lPlan, key)), Seq(attr(rPlan, "__asof_key")),
      attr(lPlan, ts), rTs, pay))
  }
}

/** Logical as-of join node. `payload` are right-side attributes carried to the
  * output (nullable there — unmatched probe rows emit NULL payload).
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] to [[AsofJoinExec]]. Injected via
  * `injectPlannerStrategy` in [[graft.engine.GraftExtensions]].
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lts, rts, pay) =>
      AsofJoinExec(lk, rk, lts, rts, pay, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Requires both children clustered on the join key
  * and sorted by (key, ts); EnsureRequirements inserts the exchanges/sorts.
  * The merge keeps one copied build payload per task — O(1) state.
  */
case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  private def payloadOut: Seq[Attribute] = payload.map(_.withNullability(true))

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  // probe rows pass through in their clustered/sorted order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsTypes = Seq(leftTs.dataType)
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTsB = leftTs
    val rTsB = rightTs
    val payB = payload
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsB), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsB), rOut)
      val payProj = UnsafeProjection.create(payB, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(tsTypes)
      val result = UnsafeProjection.create(outAttrs, lOut ++ payB.map(_.withNullability(true)))
      val nullPay = new GenericInternalRow(payB.length)
      val joined = new JoinedRow
      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      // latest build row consumed: key copy + payload copy (O(1) task state)
      var lastKey: UnsafeRow = null
      var lastPay: UnsafeRow = null
      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTs = lTsProj(lRow)
        var advance = rRow != null
        while (advance) {
          val rKey = rKeyProj(rRow)
          val c = keyOrd.compare(rKey, lKey)
          if (c < 0 || (c == 0 && tsOrd.compare(rTsProj(rRow), lTs) <= 0)) {
            if (c == 0) { lastKey = rKey.copy(); lastPay = payProj(rRow).copy() }
            rRow = if (rIter.hasNext) rIter.next() else null
            advance = rRow != null
          } else advance = false
        }
        val pay =
          if (lastKey != null && keyOrd.compare(lastKey, lKey) == 0) lastPay
          else nullPay
        result(joined(lRow, pay))
      }
    }
  }
}
