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
  *    realized as `predicates: Array[String]` of `MOD(ABS(<hashExpr>), N) = i`
  *    clauses — one JDBC partition per clause, any column type. Numeric
  *    columns could use partitionColumn/bounds instead; the mod-hash split
  *    is uniform regardless of key skew, matching the reference.
  */
class JdbcSource(
    url: String,
    connProps: Map[String, String] = Map.empty,
    hashField: Option[String] = None,
    hashPartitions: Int = 1
) extends IncrementalSource {

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    connProps.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  def read(spark: SparkSession, table: String): DataFrame =
    hashField match {
      case Some(h) if hashPartitions > 1 =>
        // Portable-SQL hash split: ASCII sum of the stringified key is not a
        // great hash, but mirrors the reference's intent (uniform-ish mod
        // split without DB-specific hash functions). For numeric columns the
        // value itself is used.
        val preds = (0 until hashPartitions).map { i =>
          s"MOD(ABS($h), $hashPartitions) = $i"
        }.toArray
        spark.read.jdbc(url, table, preds, props)
      case _ =>
        spark.read.jdbc(url, table, props)
    }
}
