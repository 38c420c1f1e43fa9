package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DataType

/** P1 — project + rename + cast, the Spark-native ApplyMapping
  * (reference: Glue `ApplyMapping.apply` over `(src, dst, type)` triples
  * built from the catalog schema, jdbc_incremental.py:111-112,199-203).
  *
  * Purely declarative: a single `select` of `cast` columns, so Catalyst
  * folds it into the scan (column pruning + codegen'd casts) — at 100 TB
  * this costs nothing beyond the projection itself, and unreferenced
  * source columns are never read from parquet.
  */
object ApplyMapping {

  final case class Mapping(src: String, dst: String, ddlType: String)

  def apply(df: DataFrame, mappings: Seq[Mapping]): DataFrame = {
    val cols: Seq[Column] = mappings.map { m =>
      col(m.src).cast(DataType.fromDDL(m.ddlType)).as(m.dst)
    }
    df.select(cols: _*)
  }

  /** Identity mappings from a catalog schema — `(name, name, type)` per
    * column, as the reference builds them (jdbc_incremental.py:111-112).
    */
  def identityMappings(schema: org.apache.spark.sql.types.StructType): Seq[Mapping] =
    schema.fields.toSeq.map(f => Mapping(f.name, f.name, f.dataType.sql))
}
