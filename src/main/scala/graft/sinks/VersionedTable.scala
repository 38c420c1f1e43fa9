package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot table: every write lands as a NEW immutable version
  * directory (`v00000001`, `v00000002`, …), and readers pin any committed
  * version — the minimal time-travel contract a lakehouse table offers
  * (snapshot isolation, reproducible reads, instant rollback) without a
  * transaction-log dependency.
  *
  * Commit protocol: a writer stages into `_staging-<v>-<nonce>` and makes
  * the version visible with ONE atomic directory rename to `v<v>`. Readers
  * list only `v*` directories, so a torn write is never observable; a
  * crashed writer leaves a `_staging-*` orphan that the next write sweeps.
  * Concurrent writers race on the rename — the loser's rename fails (the
  * destination exists) and it retries at the next version number, so
  * version history is linear without any lock service.
  *
  * Scale notes: the version listing is ONE namenode/object-store `ls` of
  * the table root (versions are directories, not a manifest scan), and a
  * read plans exactly the files of its pinned version — no
  * list-then-filter over the whole history. Old versions are reclaimed by
  * `vacuum`, keeping the newest `keep` snapshots.
  */
object VersionedTable {

  private val VersionDir = "^v(\\d{8})$".r

  private def fs(spark: SparkSession, root: Path) =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed version numbers, ascending (one directory listing). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val rootPath = new Path(root)
    val f = fs(spark, rootPath)
    if (!f.exists(rootPath)) return Seq.empty
    f.listStatus(rootPath).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case VersionDir(n) => Some(n.toLong)
          case _             => None
        }
    }.flatten.sorted
  }

  private def dirName(v: Long): String = f"v$v%08d"

  /** Write `df` as the next version; returns the committed version number.
    * Retries the staging+rename under writer races (bounded attempts).
    */
  def write(spark: SparkSession, df: DataFrame, root: String,
      maxAttempts: Int = 5): Long = {
    val rootPath = new Path(root)
    val f = fs(spark, rootPath)
    f.mkdirs(rootPath)
    // sweep orphans from crashed writers (best-effort; never a committed v*)
    f.listStatus(rootPath).foreach { st =>
      if (st.getPath.getName.startsWith("_staging-")) f.delete(st.getPath, true)
    }
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val next = versions(spark, root).lastOption.getOrElse(0L) + 1
      val nonce = java.util.UUID.randomUUID().toString.take(8)
      val staging = new Path(rootPath, s"_staging-$next-$nonce")
      df.write.mode("overwrite").parquet(staging.toString)
      // the ONE atomic visibility point: rename fails (returns false) if a
      // racing writer committed this version first — clean up and retry at
      // the next number
      if (f.rename(staging, new Path(rootPath, dirName(next)))) return next
      f.delete(staging, true)
    }
    sys.error(s"versioned write lost the commit race $maxAttempts times at $root")
  }

  /** Read a pinned version (time travel) or the latest committed one. */
  def read(spark: SparkSession, root: String, version: Option[Long] = None): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no committed versions at $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not committed at $root (have $vs)")
    spark.read.parquet(new Path(new Path(root), dirName(v)).toString)
  }

  /** Drop all but the newest `keep` versions; returns the dropped ones.
    * Readers of a dropped version fail fast on the `require` in [[read]]
    * rather than seeing partial data (deletion starts with a rename to a
    * non-version name, so a version is never half-listed).
    */
  def vacuum(spark: SparkSession, root: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "must keep at least the latest version")
    val rootPath = new Path(root)
    val f = fs(spark, rootPath)
    val drop = versions(spark, root).dropRight(keep)
    drop.foreach { v =>
      val dir = new Path(rootPath, dirName(v))
      val tomb = new Path(rootPath, s"_dropped-$v")
      if (f.rename(dir, tomb)) f.delete(tomb, true)
    }
    drop
  }
}
