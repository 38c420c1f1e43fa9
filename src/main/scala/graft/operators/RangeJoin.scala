package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded time-range join: left rows matched to right rows with
  * `rightTs ∈ [leftTs + lo, leftTs + hi]` on equal keys.
  *
  * A naive `l.join(r, keys && between)` keeps only the equi-part for
  * hashing when keys exist — fine — but with no keys (or one hot key) it
  * degenerates to a nested-loop over the key group. The scalable
  * formulation buckets BOTH sides by `ceil(span)`-sized time buckets and
  * joins on (keys, bucket) for the 2–3 buckets a span can touch, turning
  * the range predicate into an equi-join + residual filter: shuffle is
  * hash-distributed over (key, bucket), so a single key's timeline no
  * longer lands on one task.
  */
object RangeJoin {

  /** @param loSec,hiSec window bounds in seconds relative to leftTs
    *                    (lo <= hi; e.g. 0 and 86400 = "within a day after")
    */
  def range(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      loSec: Long, hiSec: Long): DataFrame = {
    require(loSec <= hiSec, "lo must be <= hi")
    val spanSec = math.max(1L, hiSec - loSec)
    // left emits every bucket its window [leftTs+lo, leftTs+hi] overlaps
    val lSecs = unix_timestamp(col(leftTs))
    val rSecs = unix_timestamp(col(rightTs))
    val l = left.withColumn("_bkt",
      explode(sequence(
        floor((lSecs + loSec) / spanSec).cast("long"),
        floor((lSecs + hiSec) / spanSec).cast("long"))))
    val r = right.withColumn("_bkt", floor(rSecs / spanSec).cast("long"))
    l.join(r, keys :+ "_bkt")
      .filter(unix_timestamp(col(rightTs)).between(
        unix_timestamp(col(leftTs)) + loSec, unix_timestamp(col(leftTs)) + hiSec))
      .drop("_bkt")
  }
}
