package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming CDC upsert sink: `foreachBatch` merges each micro-batch into
  * a keyed parquet state table with latest-wins semantics (`max_by` on
  * the version column). This is the streaming twin of the batch CDC
  * upsert (q25/q43) — the reference's bookmark loop replays *appends*
  * only (jdbc_incremental.py:291-297); real change streams carry updates
  * and need a merge, not an append.
  *
  * Scale: the merge is a single hash aggregation over state ∪ batch keyed
  * by the upsert key — exactly the shuffle an engine-native MERGE INTO
  * performs. No window, no sort, no driver-side state: partitions scale
  * with the key space. The state swap is write-to-side + rename, so a
  * crash mid-merge leaves the previous state intact; the checkpoint then
  * replays the batch, and re-merging the same rows is a no-op —
  * latest-wins is associative, commutative and idempotent, which is what
  * makes foreachBatch's at-least-once contract effectively exactly-once
  * here.
  */
object StreamingUpsert {

  /** Drain `inputDir` (file source) into the keyed parquet state at
    * `stateDir/data`, merging each batch by `keyCols` with the highest
    * `verCol` winning.
    */
  def start(
      spark: SparkSession,
      inputDir: String,
      sourceSchema: StructType,
      keyCols: Seq[String],
      verCol: String,
      stateDir: String,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val dataPath = s"$stateDir/data"
    spark.readStream
      .schema(sourceSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", s"$stateDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(stateDir), s.sparkContext.hadoopConfiguration)
        val cur = new org.apache.hadoop.fs.Path(dataPath)
        val retired = new org.apache.hadoop.fs.Path(s"$stateDir/_retired")
        // crash recovery: a previous run may have died between
        // rename(cur→retired) and rename(tmp→cur) — the good state is
        // then sitting at _retired with no cur. Restore it BEFORE reading,
        // or the replayed merge would start from empty and every key not
        // in this batch would be lost.
        if (!fs.exists(cur) && fs.exists(retired) &&
            !fs.rename(retired, cur))
          sys.error(s"upsert recovery failed: cannot restore $retired to $cur")
        val existing =
          if (fs.exists(cur)) s.read.parquet(dataPath) else batch.limit(0)
        val merged = merge(existing, batch, keyCols, verCol)
        val tmp = new org.apache.hadoop.fs.Path(s"$stateDir/tmp-$batchId")
        merged.write.mode("overwrite").parquet(tmp.toString)
        // swap AFTER the side write fully committed, and NEVER delete the
        // live state before its replacement is in place: retire-then-
        // rename leaves a recoverable _retired copy through the entire
        // non-atomic window. Rename failures on Hadoop filesystems report
        // as `false`, not exceptions — treat them as fatal so the
        // checkpoint does not commit a batch whose state swap didn't land.
        if (fs.exists(retired) && !fs.delete(retired, true))
          sys.error(s"upsert swap failed: cannot clear $retired")
        if (fs.exists(cur) && !fs.rename(cur, retired))
          sys.error(s"upsert swap failed: cannot retire $cur")
        if (!fs.rename(tmp, cur))
          sys.error(s"upsert swap failed: cannot install $tmp as $cur")
        fs.delete(retired, true) // best-effort; leftovers recovered above
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Latest-wins merge of `updates` into `state`: one hash aggregation on
    * the key, `max_by` over the version column picking the surviving row.
    */
  def merge(
      state: DataFrame, updates: DataFrame,
      keyCols: Seq[String], verCol: String): DataFrame = {
    val payload = state.columns.filterNot(keyCols.contains).toSeq
    val all = state.unionByName(updates)
    all
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), col(verCol)).as("_w"))
      .select(keyCols.map(col) ++ payload.map(c => col(s"_w.$c").as(c)): _*)
  }
}
