package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Enforces the driver-gate type rules as an invariant over the whole
  * query registry, instead of reviewer lore (SURVEY §9–10):
  *
  *   1. no DECIMAL output column — DuckDB renders DECIMAL/HUGEINT with
  *      different scale/precision than Spark, so exact decimal math must
  *      end in CAST AS DOUBLE (or BIGINT for exact counts);
  *   2. no array/map/struct output column — the driver's pandas harness
  *      lexsorts result frames and cannot hash/factorize list values
  *      (the round-3 q44 red row), so collections are joined to scalars
  *      (concat_ws) before crossing the boundary.
  *
  * Deliberately NOT enforced: "no NULLs in ORDER BY keys". A data-level
  * sweep at sf0.001 found ten green queries with NULLs in their output
  * sort keys (q16/q23/q40 grouping rows, q66's null-safe key, the
  * st10/st17 outer-join sides) — green because the harness re-sorts both
  * frames itself before hashing, so output-ORDER-BY null placement never
  * reaches the hash. The lore rule ("Spark sorts NULLs first, DuckDB
  * last — add a side key") is about order-SENSITIVE computation inside a
  * query (row_number/rank/lag frames), which no schema walk can check;
  * those stay covered by the per-query gate itself.
  *
  * The walk CONSTRUCTS every query at sf0.001 — for most queries that is
  * plan analysis only; write/readback and streaming twins execute, which
  * is exactly what the driver gate does anyway.
  */
class SchemaInvariantSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def typeViolations(name: String, df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[DecimalType] =>
        s"$name.${f.name}: DECIMAL output (${f.dataType.simpleString})"
      case f if f.dataType.isInstanceOf[ArrayType] ||
                f.dataType.isInstanceOf[MapType] ||
                f.dataType.isInstanceOf[StructType] =>
        s"$name.${f.name}: collection output (${f.dataType.simpleString})"
    }.toSeq

  test("every registry query obeys the driver-gate type rules") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) => typeViolations(name, fn(spark, sfDir))
    }
    assert(violations.isEmpty,
      s"\n${violations.size} driver-gate type-rule violations:\n" +
        violations.mkString("\n"))
  }
}
