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
    * @param forward match the EARLIEST right row with `rightTs >= leftTs`
    *                instead of the latest preceding one (pandas
    *                merge_asof's `direction='forward'`)
    * @param toleranceSeconds when set, a match farther than this from
    *                `leftTs` is nulled out (nearest-then-check, matching
    *                merge_asof's tolerance semantics — NOT
    *                "nearest within tolerance"). Seconds for timestamp
    *                columns; the column's own units for numeric ts.
    * @return all left columns plus right payload columns (null when no
    *         right row precedes/follows the left row, or the nearest one
    *         is outside the tolerance)
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      forward: Boolean = false,
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftPayload = left.columns.filterNot(keys.contains).toSeq
    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    require(rightPayload.intersect(left.columns.toSeq).isEmpty,
      s"right payload columns collide with left: ${rightPayload.intersect(left.columns.toSeq).mkString(", ")}")
    val rtsType = right.schema(rightTs).dataType
    val ltsType = left.schema(leftTs).dataType
    // The tolerance gate compares _ts and _rts in one unit; a numeric ts on
    // one side and a timestamp on the other would silently cast the numeric
    // column to a timestamp (interpreted as seconds) and gate on garbage.
    locally {
      import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
      val tsFlavors: Set[org.apache.spark.sql.types.DataType] =
        Set(TimestampType, TimestampNTZType)
      require(ltsType == rtsType ||
          (tsFlavors.contains(ltsType) && tsFlavors.contains(rtsType)),
        s"asOf ts columns must agree in type (or both be timestamp flavors): " +
          s"$leftTs is $ltsType, $rightTs is $rtsType")
    }
    val l = left.select(
      (keys.map(col) :+ col(leftTs).as("_ts") :+ lit(1).as("_side")) ++
        leftPayload.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
        lit(null).cast(rtsType).as("_rts"): _*)
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("_ts") :+ lit(0).as("_side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(col) :+ col(rightTs).as("_rts"): _*)
    // right rows (_side=0) sort before left rows at equal _ts in BOTH
    // directions, so a right row exactly at leftTs matches (<= / >=)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (forward) col("_ts").desc else col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (rightPayload :+ "_rts").foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val matched = carried.filter(col("_side") === 1)
    val gated = toleranceSeconds match {
      case None => matched
      case Some(tol) =>
        // timestamps (either zone flavor) compare at microsecond precision;
        // numeric ts columns take the tolerance in their own units
        val isTs = rtsType == org.apache.spark.sql.types.TimestampType ||
          rtsType == org.apache.spark.sql.types.TimestampNTZType
        def tick(c: org.apache.spark.sql.Column) =
          if (isTs) unix_micros(c.cast("timestamp")) else c
        val diff =
          if (forward) tick(col("_rts")) - tick(col("_ts"))
          else tick(col("_ts")) - tick(col("_rts"))
        val ok = col("_rts").isNotNull && diff <= (if (isTs) tol * 1000000L else tol)
        rightPayload.foldLeft(matched) { (df, c) =>
          df.withColumn(c, when(ok, col(c)))
        }
    }
    gated.drop("_side", "_ts", "_rts")
  }
}
