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

  /** Turnkey MySQL `hashExpr` for any-type keys — the server-side md5
    * split the reference's Glue `hashfield` performs
    * (jdbc_incremental.py:181-184): first 8 hex chars of MD5 as an
    * unsigned 32-bit integer, so `MOD(…, N)` is uniform regardless of
    * key-range skew. MySQL's CONV(str, 16, 10) yields a non-negative
    * value; MD5(NULL) is NULL, which the split-0 `OR … IS NULL` clause
    * catches. Value semantics pinned by [[md5Prefix32]].
    */
  val mysqlMd5Hash: String = "CONV(SUBSTR(MD5(%s), 1, 8), 16, 10)"

  /** Turnkey Postgres `hashExpr` computing the SAME value as
    * [[mysqlMd5Hash]]: the hex prefix is cast through a 32-char bit
    * string ('x' || hex is Postgres's documented hex-to-bit idiom) and
    * zero-extended into BIGINT, so the result is always non-negative —
    * `abs(hashtext(…))` would be shorter but is signed, version-varying,
    * and Int.MinValue-unsafe. md5(NULL) is NULL → split-0 clause.
    */
  val postgresMd5Hash: String = "(('x' || SUBSTR(MD5(%s), 1, 8))::bit(32)::BIGINT)"

  /** Reference semantics of both md5 templates, JVM-side: the first 8 hex
    * chars of md5(utf8(key)) as an unsigned 32-bit integer. Tests compare
    * database-evaluated splits against this value.
    */
  def md5Prefix32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) | ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }
}
