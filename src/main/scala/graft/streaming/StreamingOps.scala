package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, MapState, OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

final case class Event(
    event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Structured-Streaming operators over the `events` shape (north-star
  * surface). Batch parity: every streaming pipeline here has a batch twin
  * with identical results once the stream is drained, which is what the
  * DuckDB oracle checks.
  *
  * Scale notes: windowed aggregation state is bounded by (windows ×
  * event_types) per watermark horizon; `mapGroupsWithState` state is one
  * counter per user key, hash-partitioned across executors.
  */
object StreamingOps {

  /** Tumbling 1-hour window × event_type counts and value sums. Works on a
    * streaming OR batch DataFrame (same plan — Spark unifies them).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .select(col("event_type"), col("w.start").as("h"), col("n"), col("sv"))

  /** Per-user running event count via mapGroupsWithState — the canonical
    * custom-state operator. In update mode the LAST emitted row per user
    * is the total count.
    */
  def runningUserCounts(spark: SparkSession, events: DataFrame): Dataset[(Long, Long)] = {
    import spark.implicits._
    events.as[Event]
      .groupByKey(_.user_id)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + batch.size
          state.update(n)
          (user, n)
      }
  }

  /** Per-user running (count, exact cents) via the Spark 4 arbitrary-
    * state API: `transformWithState` + a typed `ValueState` on the
    * RocksDB state store — the successor to mapGroupsWithState (typed
    * named state variables, TTL support, timers). State is one
    * (long, long) pair per user, hash-partitioned; math.round on the
    * strictly-positive values matches the oracle's round-half-up.
    */
  class UserAggProcessor extends StatefulProcessor[Long, Event, (Long, Long, Long)] {
    @transient private var agg: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[(Long, Long)]("agg",
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[(Long, Long, Long)] = {
      var (n, cents) = if (agg.exists()) agg.get() else (0L, 0L)
      rows.foreach { e => n += 1; cents += math.round(e.value * 100) }
      agg.update((n, cents))
      Iterator.single((key, n, cents))
    }
  }

  def runningUserAggTws(
      spark: SparkSession, events: DataFrame): Dataset[(Long, Long, Long)] = {
    import spark.implicits._
    events.as[Event].groupByKey(_.user_id)
      .transformWithState(new UserAggProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Per-(user, event_type) running counts via a typed `MapState` — the
    * multi-entry state variable of the arbitrary-state API (one keyed
    * map per user instead of a composite grouping key, the layout a
    * per-entity feature store keeps). Emits the full map each batch;
    * update-mode last-write per (user, type) is the final count.
    */
  class UserTypeCountsProcessor
      extends StatefulProcessor[Long, Event, (Long, String, Long)] {
    @transient private var counts: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[(Long, String, Long)] = {
      rows.foreach { e =>
        val cur = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, cur + 1)
      }
      counts.iterator().map { case (t, n) => (key, t, n) }
    }
  }

  def runningUserTypeCountsTws(
      spark: SparkSession, events: DataFrame): Dataset[(Long, String, Long)] = {
    import spark.implicits._
    events.as[Event].groupByKey(_.user_id)
      .transformWithState(new UserTypeCountsProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Top-k cents per user via a typed `ListState` — the ordered-collection
    * state variable of the arbitrary-state API (ValueState st12, MapState
    * st13, ListState here). The list is TRIMMED to k on every update, so
    * state stays O(k) per user no matter how long the stream runs; the
    * emitted (rank, cents) pairs are order-independent in the input, so a
    * replayed drain is deterministic. Each rank's value is monotone
    * non-decreasing across batches (top-k of a superset dominates
    * element-wise), which is what lets the drain's consumer take max per
    * (user, rank) as the final state.
    */
  class UserTopCentsProcessor(k: Int)
      extends StatefulProcessor[Long, Event, (Long, Int, Long)] {
    @transient private var top: org.apache.spark.sql.streaming.ListState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      top = getHandle.getListState[Long]("top",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[(Long, Int, Long)] = {
      val merged = (top.get().toSeq ++
        rows.map(e => math.round(e.value * 100)))
        .sorted(Ordering[Long].reverse).take(k)
      top.put(merged.toArray)
      merged.iterator.zipWithIndex.map { case (c, i) => (key, i + 1, c) }
    }
  }

  def runningUserTopCentsTws(
      spark: SparkSession, events: DataFrame, k: Int): Dataset[(Long, Int, Long)] = {
    import spark.implicits._
    events.as[Event].groupByKey(_.user_id)
      .transformWithState(new UserTopCentsProcessor(k), TimeMode.None(), OutputMode.Update())
  }

  /** Event-time TIMER usage of the arbitrary-state API: a session-close
    * detector. Every input row extends the user's session (count +
    * last-seen) and re-registers a timer at last_ts + gap; when the
    * WATERMARK passes the timer, [[handleExpiredTimer]] fires, emits the
    * closed session's count, and clears state — the push-based
    * equivalent of session_window's emission rule, with state freed the
    * moment the watermark proves no extension can arrive.
    */
  class SessionCloseProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, (Long, Long)] {
    @transient private var sess: ValueState[(Long, Long)] = _ // (count, lastMs)
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[(Long, Long)]("sess",
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[(Long, Long)] = {
      var (n, last) = if (sess.exists()) sess.get() else (0L, Long.MinValue)
      val hadTimer = n > 0
      rows.foreach { e =>
        n += 1
        last = math.max(last, e.ts.getTime)
      }
      if (hadTimer) getHandle.deleteTimer(sess.get()._2 + gapMs)
      sess.update((n, last))
      getHandle.registerTimer(last + gapMs)
      Iterator.empty
    }
    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[(Long, Long)] = {
      val out = if (sess.exists()) Iterator.single((key, sess.get()._1))
        else Iterator.empty
      sess.clear()
      out
    }
  }

  def sessionCloseTws(
      spark: SparkSession, events: DataFrame, gapMs: Long): Dataset[(Long, Long)] = {
    import spark.implicits._
    events.as[Event].groupByKey(_.user_id)
      .transformWithState(new SessionCloseProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Drain a parquet-file stream through `pipeline` into an in-memory
    * table and return its final contents. `outputMode` must match the
    * pipeline (complete for aggregations, update for stateful map).
    *
    * `statePartitions` sizes the state-store layout (shuffle partitions
    * at checkpoint creation — FIXED for the life of a real streaming
    * job, so it is a deliberate knob, not a default): one state store
    * instance per partition per stateful operator means the partition
    * count should track state volume, not the batch-side core count.
    * Results never depend on it.
    */
  def drainToMemory(
      spark: SparkSession,
      inputDir: String,
      schema: org.apache.spark.sql.types.StructType,
      pipeline: DataFrame => DataFrame,
      outputMode: OutputMode,
      readerOptions: Map[String, String] = Map.empty,
      statePartitions: Int = 8,
      extraConf: Map[String, String] = Map.empty): DataFrame = {
    val name = "mem_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // a cloned session scopes the state-partition override to this drain —
    // the caller's session (and anything running on it concurrently)
    // keeps its own shuffle-partition setting
    val sess = spark.newSession()
    sess.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    extraConf.foreach { case (k, v) => sess.conf.set(k, v) }
    val stream = sess.readStream.schema(schema).options(readerOptions).parquet(inputDir)
    val q = pipeline(stream).writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    try q.processAllAvailable() finally q.stop()
    sess.table(name)
  }
}
