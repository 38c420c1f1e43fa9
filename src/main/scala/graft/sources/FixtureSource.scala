package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A full DataSource V2 connector (TableProvider → Table → ScanBuilder →
  * Scan/Batch → PartitionReader) serving a deterministic generated table
  * — the engine's reference implementation of the two scan-side
  * contracts that matter at 100 TB:
  *
  *  - **filter pushdown** (`SupportsPushDownFilters`): range predicates
  *    on `id` narrow the generated [lo, hi) interval INSIDE the source —
  *    the rows a pushed filter excludes are never materialized at all,
  *    the exact behavior a JDBC/parquet source gives via WHERE clauses /
  *    row-group stats. Consumed filters are not re-evaluated by Spark
  *    (they return as fully pushed), and `description()` reports them so
  *    plans show `PushedFilters: [...]` — plan-pinned in PlanSpec.
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): readers
  *    emit exactly the pruned schema in its requested order; an
  *    aggregate over (grp, v) never pays for `id`.
  *
  * The table itself: `rows` rows of (id BIGINT, grp INT = id % 32,
  * v BIGINT = id·2654435761 mod 1000003) split into `slices` equal
  * input partitions — a Knuth-style multiplicative mix the DuckDB
  * oracle replays arithmetically (q95).
  */
class FixtureDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FixtureTable.fullSchema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new FixtureTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt,
      properties.getOrDefault("batchRows", "1000").toLong)
}

object FixtureTable {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", IntegerType, nullable = false),
    StructField("v", LongType, nullable = false)))
  def grpOf(id: Long): Int = (id % 32).toInt
  def vOf(id: Long): Long = (id * 2654435761L) % 1000003L
}

class FixtureTable(rows: Long, slices: Int, batchRows: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_fixture($rows)"
  override def schema(): StructType = FixtureTable.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FixtureScanBuilder(rows, slices, batchRows)
}

class FixtureScanBuilder(rows: Long, slices: Int, batchRows: Long = 1000L)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownOffset {
  private var lo = 0L
  private var hi = rows // generated interval [lo, hi)
  private var consumed = Array.empty[Filter]
  private var required = FixtureTable.fullSchema
  private var aggValues: Option[Seq[() => Any]] = None
  private var limit: Option[Int] = None
  private var offset: Option[Int] = None

  // ---- limit/offset pushdown: the scan-side contract that makes LIMIT
  // probes cheap at 100 TB (the reference's empty-source `take(1)` probe
  // reads ONE row, not a partition). The generated interval is ordered,
  // so both clauses collapse to interval arithmetic. Spark's contract
  // (V2ScanRelationPushDown.pushDownLimitAndOffset): the pushed LIMIT is
  // always relative to the START of the post-filter stream — for
  // `df.offset(n).limit(m)` Spark pushes limit n+m, then offset n — so
  // LIMIT truncates [lo, hi) first and OFFSET skips the prefix of the
  // truncated interval. Both fully applied (isPartiallyPushed = false),
  // letting Spark drop its own Limit/Offset operators. Applied at
  // build() so the outcome is independent of push-call order.
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed(): Boolean = false
  override def pushOffset(o: Int): Boolean = { offset = Some(o); true }
  private def limitedInterval(): (Long, Long) = {
    // saturating add: lo near Long.MaxValue (a pushed `id >= MaxValue-k`
    // filter) must not wrap negative and invert the interval
    def sat(a: Long, b: Long): Long = { val s = a + b; if (s < a) Long.MaxValue else s }
    val top = limit.map(l => math.min(sat(lo, l.toLong), hi)).getOrElse(hi)
    val base = math.min(sat(lo, offset.getOrElse(0).toLong), top)
    (base, top)
  }

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = Array.newBuilder[Filter]
    val taken = Array.newBuilder[Filter]
    filters.foreach { f =>
      // boundary literals need care: x + 1 at Long.MaxValue wraps negative
      // and would turn e.g. `id <= MaxValue` (all rows) into an empty scan.
      // `id > MaxValue` is unsatisfiable (empty interval); `<= MaxValue`
      // saturates (no-op narrowing); `= MaxValue` needs only the lo bound
      // (no representable row exceeds it).
      val handled = f match {
        case GreaterThan("id", v) => asLong(v).map(x =>
          lo = if (x == Long.MaxValue) hi else math.max(lo, x + 1))
        case GreaterThanOrEqual("id", v) => asLong(v).map(x => lo = math.max(lo, x))
        case LessThan("id", v) => asLong(v).map(x => hi = math.min(hi, x))
        case LessThanOrEqual("id", v) => asLong(v).map(x =>
          if (x != Long.MaxValue) hi = math.min(hi, x + 1))
        case EqualTo("id", v) =>
          asLong(v).map { x =>
            lo = math.max(lo, x)
            if (x != Long.MaxValue) hi = math.min(hi, x + 1)
          }
        case _ => None
      }
      if (handled.isDefined) taken += f else residual += f
    }
    consumed = taken.result()
    residual.result() // only these get re-evaluated by Spark
  }
  override def pushedFilters(): Array[Filter] = consumed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ---- aggregate pushdown: COUNT/MIN/MAX/SUM over id have CLOSED FORMS
  // on the generated interval [lo, hi) — a multi-billion-row "scan"
  // aggregates without materializing a single row. Filters push before
  // aggregates in V2ScanRelationPushDown, so lo/hi are already narrowed.
  private def isId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: NamedReference => r.fieldNames.sameElements(Array("id"))
      case _ => false
    }
  private def closedForm(f: AggregateFunc): Option[() => Any] = f match {
    case _: CountStar => Some(() => math.max(0L, hi - lo))
    case c: Count if !c.isDistinct && isId(c.column) =>
      Some(() => math.max(0L, hi - lo)) // id is non-null
    case m: Min if isId(m.column) => Some(() => if (hi > lo) lo else null)
    case m: Max if isId(m.column) => Some(() => if (hi > lo) hi - 1 else null)
    case s: Sum if !s.isDistinct && isId(s.column) =>
      // Σ [lo, hi) = (lo + hi − 1)(hi − lo)/2; one factor is even
      Some(() => if (hi <= lo) null
      else {
        val n = hi - lo
        if (n % 2 == 0) (lo + hi - 1) * (n / 2) else ((lo + hi - 1) / 2) * n
      })
    case _ => None
  }
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    aggregation.groupByExpressions.isEmpty &&
      aggregation.aggregateExpressions.forall(closedForm(_).isDefined)
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (!supportCompletePushDown(aggregation)) return false
    aggValues = Some(aggregation.aggregateExpressions.toSeq.map(closedForm(_).get))
    true
  }

  override def build(): Scan = aggValues match {
    case Some(vs) =>
      // closed forms evaluate NOW (lo/hi are final after filter pushdown);
      // the scan ships plain values, never a closure over this builder.
      // Spark never pushes limit/offset below a pushed aggregate, so the
      // unlimited interval is the right one here.
      new FixtureAggScan(lo, math.max(lo, hi), vs.map(_()))
    case None =>
      val (s, e) = limitedInterval()
      new FixtureScan(s, e, slices, required, consumed, batchRows,
        limit, offset)
  }
}

/** Completely-pushed aggregate: ONE partition, ONE closed-form row. */
class FixtureAggScan(lo: Long, hi: Long, values: Seq[Any])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(values.indices.map(i =>
    StructField(s"agg_$i", LongType, nullable = true)))
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_fixture [$lo, $hi) PushedAggregates: [${values.length} closed-form]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(FixtureRange(0, 1))
  override def createReaderFactory(): PartitionReaderFactory =
    FixtureAggReaderFactory(values.toArray)
}

case class FixtureAggReaderFactory(values: Array[Any]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var served = false
      override def next(): Boolean = { val r = !served; served = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(values.toSeq)
      override def close(): Unit = ()
    }
}

class FixtureScan(
    lo: Long, hi: Long, slices: Int, schema: StructType, pushed: Array[Filter],
    batchRows: Long = 1000L,
    pushedLimit: Option[Int] = None, pushedOffset: Option[Int] = None)
    extends Scan with Batch with SupportsRuntimeFiltering
    with SupportsReportStatistics {
  override def readSchema(): StructType = schema

  // ---- statistics: exact post-pushdown cardinality, so the optimizer
  // sizes joins against this source from REAL numbers instead of
  // defaultSizeInBytes (which silently forces every join partner to
  // broadcast-or-bust). estimateStatistics runs after filter/limit
  // pushdown per the DSv2 contract — report the truncated interval.
  override def estimateStatistics(): Statistics = new Statistics {
    // lo/hi arrive already filter- AND limit/offset-truncated (build()
    // collapses the interval before constructing the scan)
    private val rows = math.max(0L, hi - lo)
    // 8B id + 4B grp + 8B v + row overhead ≈ 28B per full-width row;
    // scale by the pruned column fraction
    private val bytesPerRow = math.max(8L, 28L * schema.size / 3)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * bytesPerRow)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_fixture [$lo, $hi) PushedFilters: [${pushed.mkString(", ")}], " +
      pushedLimit.map(l => s"PushedLimit: $l, ").getOrElse("") +
      pushedOffset.map(o => s"PushedOffset: $o, ").getOrElse("") +
      s"ReadSchema: ${schema.simpleString}"

  // ---- runtime filtering: the DSv2 analogue of dynamic partition
  // pruning. When this scan is the probe side of a join on `id`, Spark
  // executes the build side first, collects the joinable id values, and
  // hands them back here as an In filter BEFORE planInputPartitions —
  // a 100 TB fact scan then materializes only the ids a filtered
  // dimension can actually match. Pruning-only contract: the join above
  // still re-evaluates the condition, so dropping to the exact id runs
  // is safe (and maximally effective — non-matching ids never exist).
  @volatile private var runtimeIds: Option[Array[Long]] = None
  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case _ => None
  }
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("id"))
  override def filter(filters: Array[Filter]): Unit = {
    // A pushed LIMIT/OFFSET already truncated the interval counting every
    // id in it; pruning ids after the fact would change which rows the
    // (already-dropped) Limit operator saw. The cases can't legally
    // co-occur today (limit pushdown never crosses a join) — guard anyway.
    if (pushedLimit.isDefined || pushedOffset.isDefined) return
    val sets = filters.collect {
      case In("id", vs) => vs.iterator.flatMap(asLong).toSet
      case EqualTo("id", v) => asLong(v).toSet
    }
    if (sets.nonEmpty) runtimeIds = Some(sets.reduce(_ intersect _).toArray.sorted)
  }

  override def planInputPartitions(): Array[InputPartition] = runtimeIds match {
    case Some(ids) =>
      // Exact contiguous runs of surviving ids, then runs CHUNKED into at
      // most `slices` partitions (round-robin by run, balancing row
      // counts). One-partition-per-run would schedule a task per id for a
      // sparse In-set — at DPP scale (millions of joinable ids) the task
      // overhead would dwarf the pruning win.
      val inRange = ids.filter(id => id >= lo && id < hi)
      val runs = Array.newBuilder[FixtureRange]
      var i = 0
      while (i < inRange.length) {
        var j = i
        while (j + 1 < inRange.length && inRange(j + 1) == inRange(j) + 1) j += 1
        runs += FixtureRange(inRange(i), inRange(j) + 1)
        i = j + 1
      }
      val all = runs.result()
      val n = math.max(1, math.min(slices, all.length))
      if (all.isEmpty) Array.empty
      else {
        // greedy fill by rows: runs are similar-sized in practice; a
        // simple least-loaded bin keeps partitions balanced
        val bins = Array.fill(n)(Vector.empty[FixtureRange])
        val load = Array.fill(n)(0L)
        all.sortBy(r => r.start - r.end).foreach { r => // largest first
          val k = load.indices.minBy(load)
          bins(k) :+= r
          load(k) += r.end - r.start
        }
        bins.filter(_.nonEmpty).map(rs => FixtureRuns(rs): InputPartition)
      }
    case None =>
      val n = math.max(1, slices)
      val span = hi - lo
      (0 until n).map { k =>
        FixtureRange(lo + span * k / n, lo + span * (k + 1) / n)
      }.filter(p => p.end > p.start).toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new FixtureReaderFactory(schema)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FixtureMicroBatchStream(lo, hi, slices, schema, math.max(1L, batchRows))
}

case class FixtureRange(start: Long, end: Long) extends InputPartition

/** Several disjoint [start, end) runs served by ONE task — the shape a
  * runtime-filtered scan plans (id runs chunked into `slices` bins).
  */
case class FixtureRuns(runs: Seq[FixtureRange]) extends InputPartition

/** Offset = the exclusive upper bound of rows served so far. */
case class FixtureOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

/** The streaming half of the DSv2 contract: the same generated table
  * served `batchRows` per micro-batch. `latestOffset` advances one batch
  * step per trigger until the table is exhausted (so
  * `processAllAvailable` terminates after ⌈span/batchRows⌉ batches);
  * `planInputPartitions(start, end)` re-slices exactly the offset range
  * the engine asks for — a restarted query replays identical batches
  * from its checkpointed offsets, which is the whole exactly-once
  * contract a source owes Structured Streaming.
  */
class FixtureMicroBatchStream(
    lo: Long, hi: Long, slices: Int, schema: StructType, batchRows: Long)
    extends MicroBatchStream {
  // Planning cursor. A restarted query constructs a FRESH stream with
  // planned = lo; without clamping, latestOffset would then return offsets
  // BEHIND the checkpoint, and under Trigger.AvailableNow the query could
  // declare itself caught up before serving [checkpoint, hi). Every offset
  // Spark hands back — the deserialized checkpoint, or a replayed batch's
  // end — advances the cursor, so latestOffset always moves forward from
  // recovered progress.
  private var planned = lo
  private def clampForward(pos: Long): Unit = synchronized {
    planned = math.max(planned, pos)
  }
  override def initialOffset(): Offset = FixtureOffset(lo)
  override def latestOffset(): Offset = synchronized {
    planned = math.min(hi, planned + batchRows)
    FixtureOffset(planned)
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FixtureOffset].pos
    val e = end.asInstanceOf[FixtureOffset].pos
    clampForward(e)
    val n = math.max(1, slices)
    val span = e - s
    (0 until n).map(k => FixtureRange(s + span * k / n, s + span * (k + 1) / n))
      .filter(p => p.end > p.start).toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new FixtureReaderFactory(schema)
  override def deserializeOffset(json: String): Offset = {
    val pos = json.toLong
    clampForward(pos) // checkpointed progress read back on restart
    FixtureOffset(pos)
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class FixtureReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val runs: Seq[FixtureRange] = partition match {
      case r: FixtureRange => Seq(r)
      case FixtureRuns(rs) => rs
      case other => throw new IllegalArgumentException(s"unknown partition $other")
    }
    // pre-resolve the projection once per partition, not per row
    val cols: Array[Long => Any] = schema.fields.map(_.name match {
      case "id" => (id: Long) => id
      case "grp" => (id: Long) => FixtureTable.grpOf(id)
      case "v" => (id: Long) => FixtureTable.vOf(id)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    })
    new PartitionReader[InternalRow] {
      private var runIdx = 0
      private var cur = if (runs.isEmpty) 0L else runs.head.start - 1
      override def next(): Boolean = {
        if (runIdx >= runs.length) return false
        cur += 1
        if (cur < runs(runIdx).end) true
        else {
          runIdx += 1
          if (runIdx >= runs.length) false
          else { cur = runs(runIdx).start; true }
        }
      }
      override def get(): InternalRow = InternalRow.fromSeq(cols.map(_(cur)).toSeq)
      override def close(): Unit = ()
    }
  }
}
