package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The whole-operator extension point (SURVEY §7.3 (c)): a NATIVE as-of
  * join as a custom LogicalPlan + SparkStrategy + SparkPlan, registered
  * through `SparkSessionExtensions.injectPlannerStrategy`
  * (`graft.functions.GraftExtensions`).
  *
  * Semantics (identical to `graft.join.AsofJoin.asof`): each left row
  * picks up the latest right row with `right.ts <= left.ts` for its key,
  * left-outer (NULL payload when no earlier right row exists). Key and
  * timestamp are any ORDERABLE types (compared via interpreted
  * orderings); the right side is unique per (key, ts) by the same
  * contract as the window formulation.
  *
  * Why a physical operator when the window composition exists: the
  * window plan UNIONS both sides through one exchange and sorts the
  * combined timeline, materializing a carried-forward payload struct for
  * every row of BOTH sides. This operator is the engine-native shape —
  * each side exchanges and sorts separately (EnsureRequirements inserts
  * exactly those from `requiredChildDistribution/Ordering`, same as a
  * sort-merge join), and a streaming per-partition merge holds ONE
  * buffered right row of state: no union blow-up, no window buffer, no
  * backfill pass. At 100 TB that is the difference between sorting
  * |L|+|R| unioned wide rows and sorting each side at its own width.
  */
case class AsofMergeJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    rightPayload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofMergeJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: the one-case strategy mapping the logical node to its
  * exec. Unmatched plans fall through to Spark's built-in strategies. */
object AsofMergeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofMergeJoin(l, r, lk, lt, rk, rt, rp) =>
      AsofMergeJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, rp) :: Nil
    case _ => Nil
  }
}

/** Per-partition streaming merge. Both children are hash-clustered on
  * the key and sorted by (key, ts) — declared, not hand-built: Spark's
  * EnsureRequirements plants the exchanges and sorts, AQE still
  * re-plans them. The merge advances the right iterator past every row
  * at-or-before the current left row's (key, ts), remembering only the
  * LAST right row of the current key — O(1) state, single forward pass,
  * no per-key buffering. */
case class AsofMergeJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    rightPayload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTsOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rKeyOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(lKeyOrd >= 0 && lTsOrd >= 0 && rKeyOrd >= 0 && rTsOrd >= 0,
      "asof key/ts attributes not found in child output")
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val outAttrs = output
    val leftOut = left.output
    val rightOut = right.output
    val nRightCols = rightOut.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter0) =>
      // interpreted orderings: any orderable type works (long, string,
      // timestamp, decimal...) — the merge is iterator-bound, not
      // comparison-bound, so the virtual call costs nothing measurable
      val keyOrdering =
        org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(keyType)
      val tsOrdering =
        org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(tsType)
      // bind against the right side RELAXED to nullable: unmatched left
      // rows substitute a null-filled row, and a projection bound to a
      // non-nullable child attribute would read those nulls as 0
      val proj = UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight: InternalRow = new GenericInternalRow(nRightCols)
      val rIter = rIter0.buffered
      var bestRow: InternalRow = null
      var bestKey: Any = null
      lIter.map { l =>
        val k = l.get(lKeyOrd, keyType)
        val t = l.get(lTsOrd, tsType)
        while (rIter.hasNext && {
          val h = rIter.head
          val c = keyOrdering.compare(h.get(rKeyOrd, keyType), k)
          c < 0 || (c == 0 && tsOrdering.compare(h.get(rTsOrd, tsType), t) <= 0)
        }) {
          val r = rIter.next()
          if (keyOrdering.compare(r.get(rKeyOrd, keyType), k) == 0) {
            // iterator rows are reused buffers — copy the one we keep
            bestRow = r.copy()
            bestKey = bestRow.get(rKeyOrd, keyType)
          } // rows of keys already passed are simply discarded
        }
        val matched = bestRow != null && keyOrdering.compare(bestKey, k) == 0
        proj(joined(l, if (matched) bestRow else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofMergeJoinExec =
    copy(left = newLeft, right = newRight)
}
