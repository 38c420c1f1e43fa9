package graft.sources

import graft.config.TableConfig
import graft.operators.Bookmarks
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1 — incremental scan contract. Implementations must arrange for the
  * bookmark predicate to reach the storage layer (parquet `PushedFilters`,
  * JDBC WHERE clause) — never a post-scan filter over a full read.
  */
trait IncrementalSource {
  /** Full (non-incremental) read of a table. */
  def read(spark: SparkSession, table: String): DataFrame

  /** Incremental read: only rows beyond `bookmark` per `cfg.sortOrder`. */
  def readIncremental(
      spark: SparkSession,
      cfg: TableConfig,
      bookmark: Map[String, String]
  ): DataFrame =
    Bookmarks.filterNew(read(spark, cfg.tableName), cfg, bookmark)
}

/** File-backed source over the testdata layout (`dir/<table>.parquet`).
  * The bookmark filter lands in the parquet scan's `PushedFilters`, so
  * row groups whose min/max exclude the bookmark range are skipped — the
  * file-source analogue of the pushed JDBC predicate.
  */
class ParquetSource(dir: String) extends IncrementalSource {
  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")
}

/** JDBC source with the reference's parallel-read surface
  * (jdbc_incremental.py:175-192):
  *
  *  - bookmark predicate: composed by `readIncremental`; Spark's JDBC scan
  *    builder pushes `>`/`=`/`AND`/`OR` into the remote query, so the
  *    database only ships the delta;
  *  - `hashfield`/`hashpartitions` (jdbc_incremental.py:181-184,291-297):
  *    realized as `predicates: Array[String]` of `MOD(<hash>, N) = i`
  *    clauses — one JDBC partition per clause. Numeric columns could use
  *    partitionColumn/bounds instead; the mod-hash split is uniform
  *    regardless of key range skew, matching the reference (which
  *    md5-hashes the value server-side in Glue).
  *
  * The hash expression defaults to `ABS(col)` — NUMERIC COLUMNS ONLY. For
  * string keys (UUID PKs etc.) pass `hashExpr`: a SQL fragment with `%s`
  * placeholders for the column that evaluates to a non-negative integer on
  * the target database — e.g. [[JdbcSource.asciiStringHash]] for databases
  * with ASCII()/SUBSTR()/LENGTH() (MySQL, Postgres, Oracle, SQL Server,
  * DB2). Rows with a NULL hash key match the i=0 predicate explicitly —
  * with plain `MOD(...) = i` clauses they would match none and be silently
  * dropped from the read.
  */
class JdbcSource(
    url: String,
    connProps: Map[String, String] = Map.empty,
    hashField: Option[String] = None,
    hashPartitions: Int = 1,
    hashExpr: Option[String] = None
) extends IncrementalSource {

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    connProps.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  def read(spark: SparkSession, table: String): DataFrame =
    hashField match {
      case Some(h) if hashPartitions > 1 =>
        val hx = hashExpr.map(_.replace("%s", h)).getOrElse(s"ABS($h)")
        val preds = (0 until hashPartitions).map { i =>
          val p = s"MOD($hx, $hashPartitions) = $i"
          if (i == 0) s"($p OR $h IS NULL)" else p // NULL keys land in split 0
        }.toArray
        spark.read.jdbc(url, table, preds, props)
      case _ =>
        spark.read.jdbc(url, table, props)
    }
}

object JdbcSource {
  /** Portable string-key hash template for `hashExpr`: mixes the first two
    * characters and the length. Works on any database with ASCII, SUBSTR
    * and LENGTH; COALESCE guards short strings (ASCII('') is NULL on most
    * engines, and a NULL hash would silently drop the row's predicate
    * match). Derby lacks ASCII — use a LOCATE-based template there.
    */
  val asciiStringHash: String =
    "(COALESCE(ASCII(SUBSTR(%s, 1, 1)), 0) * 961 + " +
      "COALESCE(ASCII(SUBSTR(%s, 2, 1)), 0) * 31 + LENGTH(%s))"
}
