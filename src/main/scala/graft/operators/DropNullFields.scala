package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{count, col}
import org.apache.spark.sql.types.NullType

/** P2/A2 — drop columns that are null in EVERY record of the current batch
  * (Glue `DropNullFields.apply`, jdbc_incremental.py:205-208).
  *
  * Semantics pinned by AWS's public Glue docs: a field is dropped when its
  * resolved type is NullType, i.e. no record carries a value. Spark has no
  * per-record schemas, so this needs one aggregation action over the batch:
  * a single job computing `count(col)` for all columns at once (partial +
  * final hash agg — one pass over the data, map-side combined, output is
  * one row). Columns already typed NullType in the schema are dropped
  * without scanning.
  *
  * Callers should persist `df` first when the result feeds further actions
  * (the reference instead re-reads the source per action,
  * jdbc_incremental.py:194,216,222 — see SURVEY §3.3).
  */
object DropNullFields {

  def apply(df: DataFrame): DataFrame = {
    val (nullTyped, candidates) =
      df.schema.fields.partition(_.dataType == NullType)
    val allNull: Seq[String] =
      if (candidates.isEmpty) Seq.empty
      else {
        val counts =
          df.agg(count(col(candidates.head.name)),
                 candidates.tail.map(f => count(col(f.name))).toSeq: _*)
            .head()
        candidates.zipWithIndex.collect {
          case (f, i) if counts.getLong(i) == 0L => f.name
        }.toSeq
      }
    val toDrop = nullTyped.map(_.name).toSeq ++ allNull
    if (toDrop.isEmpty) df else df.drop(toDrop: _*)
  }

  /** The column names that would be dropped — exposed for tests/catalog. */
  def allNullColumns(df: DataFrame): Seq[String] = {
    val before = df.columns.toSet
    before.diff(apply(df).columns.toSet).toSeq.sorted
  }
}
