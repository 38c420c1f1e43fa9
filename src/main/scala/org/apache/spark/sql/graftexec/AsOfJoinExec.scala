package org.apache.spark.sql.graftexec

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native AS-OF join — the full custom-operator ladder: LogicalPlan node →
  * SparkStrategy → SparkPlan, registered via SparkSessionExtensions
  * (GraftExtensions).
  *
  * Physical algorithm: both sides hash-clustered on the join keys and
  * sorted by (keys, ts); one streaming merge pass per partition carries
  * the latest right row ≤ the left timestamp. Versus the union+window
  * formulation (`AsOfJoin.asOf`): no union materialization, no window
  * buffering — O(1) state per partition, and right payloads are never
  * widened onto non-matching rows.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(lk, rk, lts, rts, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val lKeyExprs = leftKeys; val rKeyExprs = rightKeys
    val lTsExpr = leftTs; val rTsExpr = rightTs
    val lOut = left.output; val rOut = right.output
    val numRightCols = rOut.size
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val nullRight = new GenericInternalRow(numRightCols)
      val joined = new JoinedRow

      // right-side lookahead
      var rRow: InternalRow = null
      var rKey: InternalRow = null
      var rTs: InternalRow = null
      def advanceRight(): Unit =
        if (rIt.hasNext) {
          rRow = rIt.next().copy()
          rKey = rKeyProj(rRow).copy()
          rTs = rTsProj(rRow).copy()
        } else { rRow = null; rKey = null; rTs = null }
      advanceRight()

      // most recent right row whose (key, ts) ≤ the current left (key, ts)
      var heldRow: InternalRow = null
      var heldKey: InternalRow = null

      lIt.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTs = lTsProj(lRow)
        // consume right rows that are at-or-before this left position
        while (rRow != null && {
          val c = keyOrd.compare(rKey, lKey)
          c < 0 || (c == 0 && tsOrd.compare(rTs, lTs) <= 0)
        }) {
          heldRow = rRow; heldKey = rKey
          advanceRight()
        }
        val matches = heldRow != null && keyOrd.compare(heldKey, lKey) == 0
        joined(lRow, if (matches) heldRow else nullRight)
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

/** Public entry: build the logical node from analyzed child plans. */
object NativeAsOf {
  def asOf(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // self-contained even without GraftExtensions: the planner strategy can
    // also ride the public experimental hook
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // both sides may derive from the same base plan and share exprIds (the
    // self-join problem Spark's Join gets fixed by DeduplicateRelations);
    // re-alias the right side with fresh ids
    val rPlan: LogicalPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rPlan0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rPlan0)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in ${plan.output.map(_.name).mkString(", ")}"))
    val node = AsOfJoinPlan(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, leftTs), attr(rPlan, rightTs))
    // expose left columns + right payload only (right keys/ts duplicate
    // the left side and would make unqualified references ambiguous)
    val rightPayload = rPlan.output
      .filterNot(a => keys.exists(_.equalsIgnoreCase(a.name)) ||
        a.name.equalsIgnoreCase(rightTs))
      .map(_.withNullability(true))
    val projected = org.apache.spark.sql.catalyst.plans.logical.Project(
      lPlan.output ++ rightPayload, node)
    Dataset.ofRows(spark, projected).toDF()
  }
}
