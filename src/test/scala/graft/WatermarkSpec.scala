package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Watermark semantics on windowed streaming aggregation: append mode
  * emits a window only once the watermark passes it, and late rows beyond
  * the watermark are dropped.
  */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("append-mode window finalizes past the watermark; later-than-watermark rows drop") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = in.toDF().toDF("ts", "value")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
      .select(col("w.start").as("h"), col("n"), col("sv"))
    val name = "wm_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two rows in the 10:00 window — nothing emitted yet
      in.addData((ts("2024-01-01 10:00:00"), 1.0), (ts("2024-01-01 10:30:00"), 2.0))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0, "window must be withheld until watermark passes")

      // batch 2: event at 13:00 pushes the watermark to 12:00 → 10:00 emits
      in.addData((ts("2024-01-01 13:00:00"), 5.0))
      q.processAllAvailable()
      val emitted = spark.table(name).collect()
      assert(emitted.length == 1)
      assert(emitted.head.getLong(1) == 2 && emitted.head.getDouble(2) == 3.0)

      // batch 3: a 10:15 straggler is beyond the watermark → dropped forever
      in.addData((ts("2024-01-01 10:15:00"), 99.0))
      in.addData((ts("2024-01-01 15:00:00"), 1.0)) // push watermark further
      q.processAllAvailable()
      val after = spark.table(name).collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      assert(after(ts("2024-01-01 10:00:00")) == 2, "late row must not resurrect the window")
      assert(after.contains(ts("2024-01-01 13:00:00")))
    } finally q.stop()
  }

  test("transformWithState event-time timers close sessions when the watermark passes") {
    import graft.streaming.{Event, StreamingOps}
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Event]
      def ev(id: Long, user: Long, t: String) =
        Event(id, ts(t), user, "click", 1.0, "{}")
      val out = StreamingOps.sessionCloseTws(spark,
        in.toDS().withWatermark("ts", "10 minutes").toDF(),
        gapMs = 30 * 60 * 1000).toDF("user_id", "n")
      val name = "tws_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        // batch 1: user 1's whole session — timer set for 10:40, nothing out
        in.addData(ev(1, 1, "2024-01-01 10:00:00"),
          ev(2, 1, "2024-01-01 10:05:00"), ev(3, 1, "2024-01-01 10:10:00"))
        q.processAllAvailable()
        assert(spark.table(name).count() == 0,
          "session must stay open until the watermark passes its gap")

        // batches 2-3: user 2 activity pushes the watermark far past
        // 10:40 — user 1's timer fires, emits (1, 3), state clears;
        // user 2's own timer never fires (watermark stops at 13:50)
        in.addData(ev(4, 2, "2024-01-01 12:00:00"))
        q.processAllAvailable()
        in.addData(ev(5, 2, "2024-01-01 14:00:00"))
        q.processAllAvailable()
        val rows = spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(rows.toSeq == Seq((1L, 3L)), rows.mkString(","))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("approximate sketches: approx_count_distinct and approx_percentile within bounds") {
    val ev = SparkEntry.normalizeTs(spark.read.parquet(sf("events")))
    val exact = ev.select(countDistinct("user_id")).head.getLong(0)
    val approx = ev.select(approx_count_distinct("user_id")).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05)
    val med = ev.select(percentile_approx(col("value"), lit(0.5), lit(10000))).head.getDouble(0)
    val exactMed = ev.select(expr("percentile(value, 0.5)")).head.getDouble(0)
    assert(math.abs(med - exactMed) / math.max(1.0, exactMed) <= 0.05)
  }
}
