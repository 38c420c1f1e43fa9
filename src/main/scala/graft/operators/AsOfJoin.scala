package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for each left row, the latest right row with
  * `rightTs <= leftTs` within the same key group. Spark has no native
  * as-of join; a naive range join is quadratic per key. This is the
  * union + ordered-window formulation: one shuffle on the key columns,
  * then a running `last(_, ignoreNulls)` carries the most recent right
  * values forward onto left rows.
  *
  * Scale: shuffle budget = |left| + |right| rows, keyed by the join
  * columns (the same partitioning both inputs would need anyway); no
  * per-key quadratic blowup, no broadcast requirement. Skewed keys
  * behave like any windowed aggregation (one key's rows sort together).
  *
  * Ties: a right row at exactly `leftTs` matches (`<=` semantics — right
  * rows sort before left rows at equal timestamps). Dedupe right rows
  * sharing (keys, rightTs) beforehand if deterministic output matters.
  */
object AsOfJoin {

  /** @param left  (keys..., leftTs, left payload columns)
    * @param right (keys..., rightTs, right payload columns) — right
    *              payload names must not collide with left's columns
    * @return all left columns plus right payload columns (null when no
    *         right row precedes the left row)
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String): DataFrame = {
    val leftPayload = left.columns.filterNot(keys.contains).toSeq
    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    require(rightPayload.intersect(left.columns.toSeq).isEmpty,
      s"right payload columns collide with left: ${rightPayload.intersect(left.columns.toSeq).mkString(", ")}")
    val l = left.select(
      (keys.map(col) :+ col(leftTs).as("_ts") :+ lit(1).as("_side")) ++
        leftPayload.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("_ts") :+ lit(0).as("_side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1).drop("_side", "_ts")
  }
}
