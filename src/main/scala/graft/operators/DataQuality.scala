package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit: expectations compile into ONE
  * conditional-aggregate pass over the table (plus one distinct-count
  * aggregate per uniqueness check), returning a row per check —
  * violations, total, passed. The ingest-gate primitive: run between
  * transform and publish, fail the batch on any `passed = false`.
  *
  * Scale: all row-level checks share a single scan (conditional sums are
  * map-side partial aggregates — the audit costs one job regardless of
  * how many checks it carries); uniqueness is a hash aggregate on the key
  * columns only.
  */
object DataQuality {

  sealed trait Check { def name: String }
  final case class NotNull(column: String) extends Check {
    val name = s"not_null:$column"
  }
  final case class InRange(column: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range:$column"
  }
  final case class AcceptedValues(column: String, values: Seq[String]) extends Check {
    val name = s"accepted:$column"
  }
  final case class Unique(columns: Seq[String]) extends Check {
    val name = s"unique:${columns.mkString("+")}"
  }
  final case class Matches(column: String, regex: String) extends Check {
    val name = s"matches:$column"
  }

  private def violation(c: Check): Column = c match {
    case NotNull(col0)        => col(col0).isNull
    case InRange(col0, lo, hi) =>
      col(col0).isNull || col(col0) < lo || col(col0) > hi
    case AcceptedValues(col0, vs) => !col(col0).isin(vs: _*)
    case Matches(col0, re)    => !col(col0).rlike(re)
    case _: Unique => throw new IllegalStateException("handled separately")
  }

  /** One row per check: (check, violations, total, passed). */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val (uniques, rowChecks) = checks.partition(_.isInstanceOf[Unique])
    val rowAgg: Option[DataFrame] = if (rowChecks.nonEmpty) Some {
      val aggs = rowChecks.map(c =>
        sum(when(violation(c), 1L).otherwise(0L)).as(c.name)) :+
        count(lit(1)).as("__total")
      val one = df.agg(aggs.head, aggs.tail: _*)
      val stacked = rowChecks.map { c =>
        one.select(lit(c.name).as("check"),
          coalesce(col(c.name), lit(0L)).as("violations"),
          col("__total").as("total"))
      }
      stacked.reduce(_ unionAll _)
    } else None
    val uniqueDfs = uniques.collect { case u @ Unique(cols) =>
      // rows with a null key are not "duplicates" (NotNull is its own
      // check): violations = non-null-key rows beyond the first per key
      val keyed = cols.map(col(_).isNotNull).reduce(_ && _)
      df.agg(sum(when(keyed, 1L).otherwise(0L)).as("nk"),
          countDistinct(cols.head, cols.tail: _*).as("nd"),
          count(lit(1)).as("n"))
        .select(lit(u.name).as("check"),
          (coalesce(col("nk"), lit(0L)) - col("nd")).as("violations"),
          col("n").as("total"))
    }
    (rowAgg.toSeq ++ uniqueDfs).reduce(_ unionAll _)
      .withColumn("passed", col("violations") === 0L)
  }
}
