package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class Catalyst operator.
  *
  * For every left row, attach the latest right row of the same key
  * whose time is <= the left row's time (the reference's "state valid
  * at time T" question — bugzilla_etl/parse_bug_history.py's
  * [modified_ts, expires_on) intervals answer exactly this).
  *
  * Spark has no built-in as-of join; composing it from a range join
  * explodes (every left row matches every earlier right row before the
  * argmax). This operator instead requires both children clustered on
  * the key and sorted by (key, time) — Catalyst's EnsureRequirements
  * inserts the one co-partitioning exchange per side — and then a
  * single forward merge scan per partition emits each left row exactly
  * once. At 100 TB: one shuffle each side, O(left+right) scan, no
  * intermediate blowup.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoin = copy(left = l, right = r)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst
      .expressions.Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, org.apache.spark.sql.catalyst
      .expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKey = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTime = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val rTime = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(
        lKeyExprs.map(_.dataType))
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(output, output)
      val nullRight = new GenericInternalRow(rightOut.length)
      val rBuf = rIter.buffered

      var matchRow: InternalRow = null
      var matchKey: InternalRow = null

      lIter.map { lRow =>
        // SQL join semantics: null keys never match (NOT natural-
        // ordering NULL==NULL), and a null time never matches either —
        // mirrors DuckDB's ASOF, where such left rows get the
        // null-padded right side.
        val lkP = lKey(lRow)
        val ltP = lTime(lRow)
        if (lkP.anyNull || ltP.isNullAt(0)) {
          outProj(joined(lRow, nullRight))
        } else {
          val lk = lkP.copy()
          val lt = ltP.getLong(0)
          // advance the right side up to (key, time) — keep the last
          // row at or before the left row's time; right rows with null
          // key/time are consumed but never recorded as matches
          var continue = rBuf.hasNext
          while (continue) {
            val head = rBuf.head
            val rk = rKey(head)
            if (rk.anyNull || rTime(head).isNullAt(0)) {
              rBuf.next()
              continue = rBuf.hasNext
            } else {
              val cmp = keyOrd.compare(rk, lk)
              if (cmp < 0 || (cmp == 0 && rTime(head).getLong(0) <= lt)) {
                matchRow = head.copy()
                matchKey = rKey(matchRow).copy()
                rBuf.next()
                continue = rBuf.hasNext
              } else {
                continue = false
              }
            }
          }
          if (matchRow != null && keyOrd.compare(matchKey, lk) == 0) {
            outProj(joined(lRow, matchRow))
          } else {
            outProj(joined(lRow, nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)
}

/** Plans the logical AsOfJoin into its physical merge-scan. */
object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}
