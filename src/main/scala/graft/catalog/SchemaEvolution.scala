package graft.catalog

import org.apache.spark.sql.types.{StructField, StructType}

/** Order-preserving schema merge — the reference's `update_table` semantics
  * (jdbc_incremental.py:424-478, constraint comments at 436-439):
  *
  *  1. existing target column ORDER never changes;
  *  2. columns dropped at the source are KEPT in the target (old data stays
  *     queryable, jdbc_incremental.py:445-450);
  *  3. a column whose type changed keeps its position, type updated in place;
  *  4. new source columns are APPENDED at the end, excluding partition columns
  *     (jdbc_incremental.py:453-460).
  *
  * Pure function over StructTypes; the catalog client applies the result.
  */
object SchemaEvolution {

  def merge(target: StructType, source: StructType, partitionCols: Seq[String]): StructType = {
    // name matching is CASE-INSENSITIVE, like Spark's default resolver: a
    // case-only rename at the source ('id' -> 'ID') is the same column —
    // treating it as new would append a case-duplicate that Spark's
    // duplicate-column validation rejects on every later run. The target's
    // original casing is kept (rule 1: the target never changes shape).
    def k(name: String) = name.toLowerCase(java.util.Locale.ROOT)
    val pset = partitionCols.map(k).toSet
    val sourceMap: Map[String, StructField] = source.fields.map(f => k(f.name) -> f).toMap
    // rules 1-3: walk the target in order; update types in place; keep dropped
    val updated = target.fields.map { tf =>
      sourceMap.get(k(tf.name)) match {
        case Some(sf) if sf.dataType != tf.dataType => tf.copy(dataType = sf.dataType)
        case _                                      => tf
      }
    }
    // rule 4: append new source columns (source order), minus partition cols
    val existing = target.fields.map(f => k(f.name)).toSet
    val appended = source.fields.filter(f => !existing.contains(k(f.name)) && !pset.contains(k(f.name)))
    StructType(updated ++ appended)
  }
}
