package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** DSv2 write-side contract (rowlog connector): staged nonce commit,
  * snapshot versions, time travel, two-phase task commit, append
  * rejection, and the V2 write plan shape.
  */
class RowLogSpec extends SparkSpec {

  private val fmt = "graft.sources.RowLogDataSource"

  test("rowlog: V2 overwrite commits versions; reads pin or follow latest") {
    import spark.implicits._
    val root = tmpDir("rowlog_rt")
    val df1 = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("k", "s", "x")
    df1.write.format(fmt).mode("overwrite").save(root)
    val df2 = Seq((10L, "z", 0.0)).toDF("k", "s", "x")
    df2.write.format(fmt).mode("overwrite").save(root)

    val latest = spark.read.format(fmt).load(root)
    assert(latest.collect().map(_.getLong(0)).toSet == Set(10L))
    val v1 = spark.read.format(fmt).option("version", "1").load(root)
    assert(v1.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))

    // commit hygiene: two v* dirs, each with a nonce marker + schema, no staging orphans
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = f.listStatus(new Path(root)).map(_.getPath.getName).toSet
    assert(names == Set("v00000001", "v00000002"), names)
    Seq("v00000001", "v00000002").foreach { v =>
      val inner = f.listStatus(new Path(root, v)).map(_.getPath.getName)
      assert(inner.contains("_schema.json"), inner.toSeq)
      assert(inner.exists(_.startsWith("_commit-")), inner.toSeq)
      assert(inner.exists(_.endsWith(".rowlog")), inner.toSeq)
    }
  }

  test("rowlog: append mode is rejected (versions are immutable snapshots)") {
    import spark.implicits._
    val root = tmpDir("rowlog_append")
    Seq((1L, 2L)).toDF("a", "b").write.format(fmt).mode("overwrite").save(root)
    val e = intercept[Exception] {
      Seq((3L, 4L)).toDF("a", "b").write.format(fmt).mode("append").save(root)
    }
    assert(e.getMessage.contains("overwrite"), e.getMessage)
    // the failed append committed nothing
    assert(spark.read.format(fmt).load(root).count() == 1)
  }

  test("rowlog: commit drops staged files no committed task reported") {
    import graft.sources.{RowLogBatchWrite, RowLogCommit}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val root = tmpDir("rowlog_2pc")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType)))
    val bw = new RowLogBatchWrite(root, schema)
    val factory = bw.createBatchWriterFactory(null)
    val w0 = factory.createWriter(0, 100L)
    w0.write(InternalRow(1L, UTF8String.fromString("x")))
    val m0 = w0.commit()
    // a speculative attempt for the same partition writes too, but its
    // message is never delivered to the driver
    val w1 = factory.createWriter(0, 999L)
    w1.write(InternalRow(2L, UTF8String.fromString("dup")))
    w1.commit()
    bw.commit(Array(m0))
    val rows = spark.read.format(fmt).load(root).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L), rows.toSeq)
    assert(m0.asInstanceOf[RowLogCommit].rows == 1L)
  }

  test("rowlog streaming sink: one version per epoch; final version = batch result") {
    import org.apache.spark.sql.functions._
    val root = tmpDir("rowlog_stream")
    val ckpt = tmpDir("rowlog_stream_ckpt")
    val stream = spark.readStream.format("graft.sources.FixtureDataSource")
      .option("rows", "900").option("slices", "3").option("batchRows", "300").load()
    val q = stream.groupBy("grp").agg(count(lit(1)).as("n"))
      .writeStream.format(fmt)
      .option("path", root).option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val versions = graft.sinks.VersionedTable.versions(spark, root)
    assert(versions == Seq(1L, 2L, 3L), versions) // 900/300 = 3 epochs
    // final snapshot equals the one-shot batch aggregate
    val got = spark.read.format(fmt).load(root)
      .orderBy("grp").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val want = (0 until 32).map(g => g -> (900 / 32 + (if (g < 900 % 32) 1 else 0)).toLong)
    assert(got == want)
    // intermediate epochs are time-travelable partial snapshots
    val v1 = spark.read.format(fmt).option("version", "1").load(root)
      .agg(sum("n")).head().getLong(0)
    assert(v1 == 300L, v1)
  }

  test("rowlog streaming sink: a replayed epoch commits exactly once") {
    import graft.sources.{RowLogCommit, RowLogStreamingWrite}
    import org.apache.spark.sql.catalyst.InternalRow
    val root = tmpDir("rowlog_epoch")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))
    def commitEpoch(w: RowLogStreamingWrite, epoch: Long, v: Long): Unit = {
      val writer = w.createStreamingWriterFactory(null).createWriter(0, v, epoch)
      writer.write(InternalRow(v))
      w.commit(epoch, Array(writer.commit()))
    }
    val w1 = new RowLogStreamingWrite(root, schema)
    commitEpoch(w1, 7L, 1L)
    // restart: a FRESH StreamingWrite (new nonce) replays the same epoch
    val w2 = new RowLogStreamingWrite(root, schema)
    commitEpoch(w2, 7L, 2L)
    commitEpoch(w2, 8L, 3L)
    val versions = graft.sinks.VersionedTable.versions(spark, root)
    assert(versions == Seq(1L, 2L), versions) // epoch 7 committed ONCE
    val vals = spark.read.format(fmt).option("version", "1").load(root)
      .collect().map(_.getLong(0)).toSeq
    assert(vals == Seq(1L), vals) // the FIRST commit of epoch 7 won
    // no staging leftovers from the dropped replay
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphans = f.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("_staging"))
    assert(orphans.isEmpty, orphans.toSeq)
  }

  test("rowlog streaming sink: retain auto-vacuums to the newest k versions") {
    val root = tmpDir("rowlog_retain")
    val ckpt = tmpDir("rowlog_retain_ckpt")
    val stream = spark.readStream.format("graft.sources.FixtureDataSource")
      .option("rows", "900").option("slices", "3").option("batchRows", "300").load()
    val q = stream.groupBy("grp").agg(count(lit(1)).as("n"))
      .writeStream.format(fmt)
      .option("path", root).option("checkpointLocation", ckpt)
      .option("retain", "1")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    // 3 epochs committed, each commit vacuumed to the newest 1 — only the
    // final (complete) snapshot survives, and it equals the batch result
    val versions = graft.sinks.VersionedTable.versions(spark, root)
    assert(versions == Seq(3L), versions)
    val total = spark.read.format(fmt).load(root).agg(sum("n")).head().getLong(0)
    assert(total == 900L, total)
  }

  test("rowlog streaming sink: replay stays exactly-once after vacuum deletes the epoch markers") {
    import graft.sources.{RowLogCommit, RowLogStreamingWrite}
    import org.apache.spark.sql.catalyst.InternalRow
    val root = tmpDir("rowlog_retain_replay")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def commitEpoch(w: RowLogStreamingWrite, epoch: Long, v: Long): Unit = {
      val writer = w.createStreamingWriterFactory(null).createWriter(0, v, epoch)
      writer.write(InternalRow(v))
      w.commit(epoch, Array(writer.commit()))
    }
    // epochs 1..2 commit as v1..v2 (markers + root _epoch-hwm)
    val w1 = new RowLogStreamingWrite(root, schema)
    commitEpoch(w1, 1L, 1L)
    commitEpoch(w1, 2L, 2L)
    // adversarial marker loss WITHIN the lineage: vacuum to the newest
    // version, then strip its _epoch marker (a foreign cleanup tool) —
    // marker-scan detection is blind, the root high-water file must
    // still drop the restart replay
    graft.sinks.VersionedTable.vacuum(spark, root, keep = 1)
    val v2dir = new org.apache.hadoop.fs.Path(root, f"v${2L}%08d")
    f.listStatus(v2dir).map(_.getPath).filter(_.getName.startsWith("_epoch-"))
      .foreach(p => f.delete(p, false))
    val w2 = new RowLogStreamingWrite(root, schema)
    commitEpoch(w2, 2L, 9L) // replayed tail epoch: DROPPED
    assert(graft.sinks.VersionedTable.versions(spark, root) == Seq(2L))
    commitEpoch(w2, 3L, 10L) // genuinely new epoch: lands
    assert(graft.sinks.VersionedTable.versions(spark, root) == Seq(2L, 3L))
    val vals = spark.read.format(fmt).option("version", "3").load(root)
      .collect().map(_.getLong(0)).toSeq
    assert(vals == Seq(10L), vals)
  }

  test("rowlog streaming sink: a batch overwrite resets the lineage — no stale replay drops") {
    import graft.sources.{RowLogCommit, RowLogStreamingWrite}
    import org.apache.spark.sql.catalyst.InternalRow
    val root = tmpDir("rowlog_lineage_reset")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def commitEpoch(w: RowLogStreamingWrite, epoch: Long, v: Long): Unit = {
      val writer = w.createStreamingWriterFactory(null).createWriter(0, v, epoch)
      writer.write(InternalRow(v))
      w.commit(epoch, Array(writer.commit()))
    }
    // an old streaming lineage advances the high-water to epoch 7
    val w1 = new RowLogStreamingWrite(root, schema)
    commitEpoch(w1, 7L, 1L)
    assert(f.exists(new org.apache.hadoop.fs.Path(root, "_epoch-hwm")))
    // a batch truncate/overwrite starts a NEW lineage: the hwm file must
    // go with it (ADVICE r7: leaving it made every later commit with
    // epoch ≤ 7 vanish as a 'replay' — permanently, beyond vacuum's reach)
    import spark.implicits._
    Seq(99L).toDF("k").write.format(fmt).mode("overwrite").save(root)
    assert(!f.exists(new org.apache.hadoop.fs.Path(root, "_epoch-hwm")),
      "batch overwrite must clear the stale epoch high-water")
    graft.sinks.VersionedTable.vacuum(spark, root, keep = 1)
    // a fresh streaming query (epochs restarting low) against the
    // overwritten root: its commits must LAND, not vanish
    val w2 = new RowLogStreamingWrite(root, schema)
    commitEpoch(w2, 0L, 20L)
    commitEpoch(w2, 1L, 21L)
    assert(graft.sinks.VersionedTable.versions(spark, root) == Seq(2L, 3L, 4L))
    // and within the new lineage, replay detection works from scratch
    commitEpoch(new RowLogStreamingWrite(root, schema), 1L, 22L)
    assert(graft.sinks.VersionedTable.versions(spark, root) == Seq(2L, 3L, 4L),
      "replayed epoch 1 of the new lineage must still be dropped")
  }

  test("rowlog: roundtrips nulls, arrays, structs, decimals, timestamps") {
    val root = tmpDir("rowlog_types")
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, CAST(NULL AS STRING), array(1, NULL, 3),
        |   named_struct('a', 1.5D, 'b', 'x'),
        |   TIMESTAMP'2026-01-02 03:04:05', CAST(12.345 AS DECIMAL(10,3))),
        |  (2L, 'y', array(CAST(NULL AS INT)),
        |   named_struct('a', CAST(NULL AS DOUBLE), 'b', CAST(NULL AS STRING)),
        |   CAST(NULL AS TIMESTAMP), CAST(NULL AS DECIMAL(10,3)))
        |  AS t(k, s, arr, st, ts, dec)""".stripMargin)
    df.write.format(fmt).mode("overwrite").save(root)
    val back = spark.read.format(fmt).load(root)
    assert(back.schema == df.schema, back.schema.treeString)
    assert(back.orderBy("k").collect().map(_.toString).toSeq ==
      df.orderBy("k").collect().map(_.toString).toSeq)
  }

  test("rowlog: an empty overwrite commits a readable empty snapshot") {
    import spark.implicits._
    val root = tmpDir("rowlog_empty")
    Seq((1L, "a")).toDF("k", "s").write.format(fmt).mode("overwrite").save(root)
    Seq.empty[(Long, String)].toDF("k", "s")
      .write.format(fmt).mode("overwrite").save(root)
    val latest = spark.read.format(fmt).load(root)
    assert(latest.count() == 0)
    assert(latest.schema.fieldNames.toSeq == Seq("k", "s")) // schema survives
    assert(spark.read.format(fmt).option("version", "1").load(root).count() == 1)
  }

  test("rowlog: concurrent V2 writers both commit; version history stays linear") {
    import spark.implicits._
    val root = tmpDir("rowlog_race")
    val writers = (1 to 4).map { i =>
      new Thread {
        override def run(): Unit =
          Seq((i.toLong, i * 10L)).toDF("w", "x")
            .write.format(fmt).mode("overwrite").save(root)
      }
    }
    writers.foreach(_.start()); writers.foreach(_.join())
    val versions = graft.sinks.VersionedTable.versions(spark, root)
    assert(versions == Seq(1L, 2L, 3L, 4L), versions) // all four landed, linear
    // every version is a complete committed snapshot of exactly one writer
    val seen = versions.map { v =>
      val rows = spark.read.format(fmt).option("version", v.toString).load(root).collect()
      assert(rows.length == 1)
      rows.head.getLong(0)
    }
    assert(seen.toSet == Set(1L, 2L, 3L, 4L), seen)
    // no staging orphans survived the race
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftovers = f.listStatus(new Path(root)).map(_.getPath.getName)
      .filterNot(_.startsWith("v0"))
    assert(leftovers.isEmpty, leftovers.toSeq)
  }

  test("rowlog: VersionedTable.vacuum applies to rowlog roots (same layout)") {
    import spark.implicits._
    val root = tmpDir("rowlog_vacuum")
    (1 to 3).foreach { i =>
      Seq((i.toLong, "a")).toDF("k", "s").write.format(fmt).mode("overwrite").save(root)
    }
    val dropped = graft.sinks.VersionedTable.vacuum(spark, root, keep = 1)
    assert(dropped == Seq(1L, 2L))
    // latest still reads; a vacuumed version fails fast
    assert(spark.read.format(fmt).load(root).collect().map(_.getLong(0)).toSeq == Seq(3L))
    val e = intercept[IllegalArgumentException] {
      spark.read.format(fmt).option("version", "1").load(root).collect()
    }
    assert(e.getMessage.contains("not committed"), e.getMessage)
  }

  test("rowlog: column prune reaches the scan and values survive the projection") {
    import spark.implicits._
    val root = tmpDir("rowlog_prune")
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "x")
      .write.format(fmt).mode("overwrite").save(root)
    val df = spark.read.format(fmt).load(root).select("x", "k") // reordered subset
    val p = df.queryExecution.executedPlan.toString
    // Spark prunes in table order; the reorder happens in the Project above
    assert(p.contains("ReadSchema: struct<k:bigint,x:double>"), p)
    assert(df.orderBy("k").collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq ==
      Seq((10.0, 1L), (20.0, 2L)))
  }

  test("rowlog: pushed filters evaluate in the reader; residuals stay above the scan") {
    import spark.implicits._
    val root = tmpDir("rowlog_pushdown")
    (1L to 100L).map(i => (i, s"s$i")).toDF("k", "s")
      .write.format(fmt).mode("overwrite").save(root)
    val df = spark.read.format(fmt).load(root)
      .filter(col("k") > 90 && col("s").startsWith("s9") && col("k") % 2 === 0)
    val p = df.queryExecution.executedPlan.toString
    // the comparable predicates push; the modulo is honestly residual
    assert(p.contains("PushedFilters: [") && p.contains("GreaterThan(k,90)"), p)
    assert(p.contains("StringStartsWith(s,s9)"), p)
    assert(p.contains("% 2"), s"residual modulo must stay a Spark Filter:\n$p")
    assert(df.collect().map(_.getLong(0)).toSet == Set(92L, 94L, 96L, 98L))
  }

  test("rowlog: fully-pushed predicates leave no post-scan Filter") {
    import spark.implicits._
    val root = tmpDir("rowlog_fullpush")
    (1L to 50L).map(i => (i, i * 2)).toDF("k", "v")
      .write.format(fmt).mode("overwrite").save(root)
    val df = spark.read.format(fmt).load(root)
      .filter(col("k") >= 40 && col("v") < 90)
    val filters = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(filters.isEmpty,
      s"source claims pushed filters as fully applied:\n${df.queryExecution.executedPlan}")
    assert(df.collect().map(_.getLong(0)).toSet == Set(40L, 41L, 42L, 43L, 44L))
    // a pushed filter referencing a PRUNED column still applies (it
    // evaluates against the full stored row, before the prune projection)
    val pruned = spark.read.format(fmt).load(root)
      .filter(col("v") === 60).select("k")
    assert(pruned.collect().map(_.getLong(0)).toSeq == Seq(30L))
  }

  test("rowlog streaming sink: a zero-task epoch commits an empty snapshot") {
    import graft.sources.RowLogStreamingWrite
    val root = tmpDir("rowlog_zerotask")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))
    val w = new RowLogStreamingWrite(root, schema)
    w.commit(0L, Array.empty) // no task ran, so nothing mkdir'd the staging
    assert(graft.sinks.VersionedTable.versions(spark, root) == Seq(1L))
    val back = spark.read.format(fmt).load(root)
    assert(back.count() == 0)
    assert(back.schema.fieldNames.toSeq == Seq("k"))
  }

  test("rowlog: an unpinned read resolves its version ONCE, at table creation") {
    import spark.implicits._
    val root = tmpDir("rowlog_pin")
    Seq((1L, "a"), (2L, "b")).toDF("k", "s")
      .write.format(fmt).mode("overwrite").save(root)
    val df = spark.read.format(fmt).load(root) // pins latest = v1 here
    // a concurrent writer commits v2 with a DIFFERENT schema before the
    // read executes — the pinned read must still serve v1's rows with
    // v1's schema (pre-fix, execution re-resolved latest and would have
    // reinterpreted v2's UnsafeRow bytes under v1's schema: garbage)
    Seq((9.5, true)).toDF("x", "y").write.format(fmt).mode("overwrite").save(root)
    assert(df.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // and a fresh unpinned read follows the new latest
    val fresh = spark.read.format(fmt).load(root).collect()
    assert(fresh.map(r => (r.getDouble(0), r.getBoolean(1))).toSeq == Seq((9.5, true)))
  }

  test("rowlog: the write runs through the V2 OverwriteByExpression plan") {
    import spark.implicits._
    val seen = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        seen.add(s"[$funcName]\n${qe.executedPlan}")
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val root = tmpDir("rowlog_plan")
      Seq((1L, 2L)).toDF("a", "b").write.format(fmt).mode("overwrite").save(root)
      // listener delivery is async — poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      def hit = seen.toArray.map(_.toString).find(_.contains("OverwriteByExpression"))
      while (hit.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(hit.isDefined, seen.toArray.mkString("\n---\n"))
    } finally spark.listenerManager.unregister(listener)
  }
}
