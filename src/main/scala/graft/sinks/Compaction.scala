package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction for partitioned targets. Incremental appends
  * (the engine's write mode, matching the reference) accumulate one file
  * per batch per partition; at high batch cadence the target degrades
  * into millions of tiny files — the classic lake problem.
  *
  * `compact` rewrites the table with one task per Hive partition
  * (`repartition(partitionCols)` → each partition's rows co-locate), with
  * `maxRecordsPerFile` as the roll-over bound for oversized partitions.
  * The rewrite lands in a sibling directory and swaps in via two renames
  * (read-path-overwrite is illegal in Spark, and the swap keeps the
  * window where readers see a half-written table to the rename itself).
  */
object Compaction {

  final case class Result(rowCount: Long, filesBefore: Int, filesAfter: Int)

  private def dataFiles(spark: SparkSession, dir: Path): Seq[Path] = {
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return Seq.empty
    val it = fs.listFiles(dir, true)
    val out = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) out += f.getPath
    }
    out.toSeq
  }

  /** Data-file paths relative to `dir` — comparable across a directory
    * rename (the same listing under `loc` and under `_precompact`). */
  private def relativeFiles(spark: SparkSession, dir: Path): Set[String] = {
    val prefix = dir.toUri.getPath.stripSuffix("/") + "/"
    dataFiles(spark, dir).map(_.toUri.getPath.stripPrefix(prefix)).toSet
  }

  def compact(
      spark: SparkSession,
      location: String,
      format: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Result = {
    val loc = new Path(location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = dataFiles(spark, loc)

    // a CLONED session scopes two read-side settings to this rewrite:
    // partition-column type inference must be OFF (a string partition
    // value like '00123' would otherwise be re-inferred as int 123 and
    // rewritten as part=123, orphaning the registered catalog location)
    val sess = spark.newSession()
    sess.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    val df = PartitionedSink.configureRead(sess.read, format).load(location)
    val arranged =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
      else df.coalesce(1)
    val tmp = new Path(loc.getParent, loc.getName + "_compacting")
    fs.delete(tmp, true)
    val writer = PartitionedSink.configureFormat(
        arranged.write.mode("overwrite").option("maxRecordsPerFile", maxRecordsPerFile),
        format)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .save(tmp.toString)

    // writer-concurrency guard: the rewrite read pinned its file listing
    // at load time, so any batch APPENDED to the table while the rewrite
    // ran is not in the rewrite output — swapping now would silently
    // delete those committed rows. Relist and abort instead (the caller
    // re-runs compaction in a quiet window); readers racing the swap are
    // covered by the rename itself.
    val after = dataFiles(spark, loc)
    if (after.map(_.toString).toSet != before.map(_.toString).toSet) {
      fs.delete(tmp, true)
      throw new java.io.IOException(
        s"$location changed during compaction (${before.size} -> ${after.size} files); aborting swap")
    }

    val rows = PartitionedSink.configureRead(spark.read, format).load(tmp.toString).count()
    val old = new Path(loc.getParent, loc.getName + "_precompact")
    fs.delete(old, true)
    if (!fs.rename(loc, old)) throw new java.io.IOException(s"rename $loc -> $old failed")
    // The pre-swap relist above is check-then-act: a batch appended between
    // it and the rename would still be swapped away. The rename FREEZES the
    // live listing (appenders can no longer reach it under `loc`), so
    // re-verify now and roll back if anything slipped in. Residual window:
    // a writer that STARTS after the rename recreates `loc` fresh and
    // collides with the swap/rollback renames — concurrent compaction and
    // brand-new appends remain the caller's scheduling contract, as with
    // any non-transactional lake table.
    if (relativeFiles(spark, old) != before.map { p =>
          p.toUri.getPath.stripPrefix(loc.toUri.getPath.stripSuffix("/") + "/")
        }.toSet) {
      if (!fs.rename(old, loc)) throw new java.io.IOException(
        s"$location changed during compaction AND rollback rename failed; data is at $old")
      fs.delete(tmp, true)
      throw new java.io.IOException(
        s"$location changed between relist and swap; rolled back")
    }
    if (!fs.rename(tmp, loc)) {
      fs.rename(old, loc) // roll back
      throw new java.io.IOException(s"rename $tmp -> $loc failed")
    }
    fs.delete(old, true)
    Result(rows, before.size, dataFiles(spark, loc).size)
  }
}
