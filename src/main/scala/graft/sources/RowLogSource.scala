package graft.sources

import java.io.{DataInputStream, DataOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sinks.VersionedTable

/** The WRITE half of the DSv2 connector ladder: a versioned snapshot
  * table whose batch writes run through Spark's V2 write path
  * (`WriteBuilder` → `BatchWrite` → executor `DataWriter`s) and commit
  * with the SAME race-proof nonce-rename protocol as
  * [[graft.sinks.VersionedTable]] — stage part files under
  * `_staging-<nonce>`, then one visibility rename to `v<N>` verified by
  * the nonce marker. Torn writes are never observable; a crashed task's
  * leftover files are dropped at commit (only files named in committed
  * `WriterCommitMessage`s survive — the two-phase commit a speculative
  * or retried task requires); a crashed JOB leaves an orphan staging dir
  * the next writer sweeps.
  *
  * Data format: one `.rowlog` file per write task, length-prefixed
  * `UnsafeRow` bytes — the engine's own columnar-free row format, so the
  * connector demonstrates the contract without borrowing Spark's parquet
  * writer. Schema travels in the version directory (`_schema.json`),
  * making every committed version self-describing; reads pin a version
  * (`option("version", n)` — time travel) or serve the latest, one input
  * partition per part file.
  *
  * Semantics: each write is a full snapshot (`mode("overwrite")` /
  * truncate). Append is rejected — a versioned snapshot table's "append"
  * is a new version written by the reader of the old one, which keeps
  * version history linear and every version immutable.
  */
class RowLogDataSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true // writes pass df.schema

  private def root(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "rowlog source needs a path")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RowLogTable.schemaAt(root(options),
      Option(options.get("version")).map(_.toLong))

  /** An unpinned read resolves `latest` HERE, exactly once — schema and
    * data then come from the same committed version no matter how long
    * analysis-to-execution takes or what a concurrent writer commits in
    * between (UnsafeRow bytes are schema-blind, so a version/schema split
    * would misread silently, not fail). A write-only table with no
    * committed versions stays unpinned (reads on it fail loudly in
    * `versionDir`; the writer never consults the pin).
    */
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    val pinned = Option(properties.get("version")).map(_.toLong)
      .orElse(RowLogTable.latestVersion(path))
    new RowLogTable(path, schema, pinned)
  }
}

object RowLogTable {
  /** Driver-side FileSystem resolution uses the ACTIVE session's Hadoop
    * configuration (credentials, filesystem impls — `new Configuration()`
    * would silently drop S3/HDFS settings on a real cluster); executor
    * code gets the same conf shipped through [[HadoopConfMap]].
    */
  private[sources] def conf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
  private[sources] def fs(root: String) =
    new Path(root).getFileSystem(conf())

  /** Latest committed version, if any (None for a not-yet-written root). */
  private[sources] def latestVersion(root: String): Option[Long] =
    try VersionedTable.versionsOf(fs(root), new Path(root)).lastOption
    catch { case _: Exception => None }

  /** Resolve the version directory to read: pinned or latest committed. */
  private[sources] def versionDir(root: String, version: Option[Long]): Path = {
    val f = fs(root)
    val vs = VersionedTable.versionsOf(f, new Path(root))
    require(vs.nonEmpty, s"no committed rowlog versions at $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not committed at $root (have $vs)")
    new Path(new Path(root), VersionedTable.dirName(v))
  }

  private[sources] def schemaAt(root: String, version: Option[Long]): StructType = {
    val dir = versionDir(root, version)
    val in = fs(root).open(new Path(dir, "_schema.json"))
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    DataType.fromJson(json).asInstanceOf[StructType]
  }
}

class RowLogTable(root: String, schema0: StructType, version: Option[Long])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_rowlog($root)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns
        with SupportsPushDownFilters {
      // rowlog is row-major, so pruning can't skip bytes on disk — but
      // honoring it still shrinks every downstream exchange/operator row
      // and keeps the scan's contract honest (ReadSchema shows the prune)
      private var required = schema0
      private var pushed: Array[sources.Filter] = Array.empty
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      // rowlog can't skip bytes either, but a pushed predicate evaluates
      // ROW-LOCALLY in the reader against the full stored row — excluded
      // rows never reach the prune projection, the exchange, or any
      // operator above the scan. Accepted filters are fully applied
      // (exact evaluation), so only residuals go back to Spark.
      override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
        val (ok, residual) =
          filters.partition(RowLogFilters.translate(schema0, _).isDefined)
        pushed = ok
        residual
      }
      override def pushedFilters(): Array[sources.Filter] = pushed
      override def build(): Scan =
        new RowLogScan(root, schema0, required, version, pushed)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // `retain` (streaming writes only): auto-vacuum to the newest N
    // versions after every epoch commit. Complete-mode streams commit one
    // version per micro-batch — unbounded history until someone vacuums,
    // which a long-running query has no natural hook to do (ADVICE r5).
    val retain = Option(info.options.get("retain")).map { r =>
      val n = r.toInt
      require(n >= 1, s"retain must be >= 1, got $n")
      n
    }
    new RowLogWriteBuilder(root, info.schema(), retain)
  }
}

class RowLogWriteBuilder(root: String, schema: StructType,
    retain: Option[Int] = None)
    extends WriteBuilder with SupportsTruncate {
  private var truncated = false
  override def truncate(): WriteBuilder = { truncated = true; this }
  override def build(): Write = {
    require(truncated,
      "rowlog is a versioned snapshot table: append would mutate an " +
        "immutable version — write with mode(\"overwrite\") (batch) or " +
        "outputMode(\"complete\") (streaming)")
    new Write {
      override def description(): String = s"graft_rowlog overwrite -> $root"
      override def toBatch: BatchWrite = new RowLogBatchWrite(root, schema)
      override def toStreaming: StreamingWrite =
        new RowLogStreamingWrite(root, schema, retain)
    }
  }
}

/** Shared staging finalization: keep only committed files, stamp schema +
  * markers, then the VersionedTable nonce-rename.
  */
private[sources] object RowLogCommitOps {
  def finalizeStaging(root: String, staging: Path, nonce: String,
      schemaJson: String, committedFiles: Set[String],
      extraMarkers: Seq[String]): Long = {
    val f = RowLogTable.fs(root)
    // a zero-task micro-batch never ran a writer, so nothing created the
    // staging dir (the streaming path mkdirs executor-side) — an empty
    // snapshot must still commit as a version, not throw FileNotFound
    f.mkdirs(staging)
    // two-phase commit: only files a committed task reported survive —
    // a speculative/retried attempt's leftovers are dropped here
    f.listStatus(staging).foreach { st =>
      val n = st.getPath.getName
      if (n.endsWith(".rowlog") && !committedFiles.contains(n)) f.delete(st.getPath, false)
    }
    val out = new DataOutputStream(f.create(new Path(staging, "_schema.json"), true))
    try out.write(schemaJson.getBytes("UTF-8")) finally out.close()
    extraMarkers.foreach(m => f.create(new Path(staging, m), false).close())
    f.create(new Path(staging, s"_commit-$nonce"), false).close()
    VersionedTable.commitStaged(f, new Path(root), staging, nonce, maxAttempts = 20)
  }
}

/** The STREAMING half of the write contract: one committed version per
  * micro-batch epoch (complete-mode snapshots), same staging + nonce
  * rename as the batch writer. Exactly-once: every version records its
  * epoch in an `_epoch-<id>` marker; a replayed epoch (post-restart
  * re-commit of a batch whose commit already landed) is detected there
  * and dropped, so the version history never double-counts a batch.
  */
class RowLogStreamingWrite(root: String, schema: StructType,
    retain: Option[Int] = None) extends StreamingWrite {
  private val nonce = java.util.UUID.randomUUID().toString.take(8)
  private def staging(epochId: Long) =
    new Path(new Path(root), s"_staging-$nonce-e$epochId")
  private def hwmFile = new Path(new Path(root), "_epoch-hwm")

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    RowLogStreamingWriterFactory(root, nonce, schema.json, HadoopConfMap.capture())

  /** Epoch high-water recorded at the table root, SEPARATE from the
    * per-version `_epoch-<id>` markers: auto-vacuum deletes marker-bearing
    * versions, and replay detection must survive that (a dropped marker
    * would let a post-restart replay of an already-committed epoch land
    * twice). Single-writer by the streaming contract, so an overwrite
    * create is safe. Failure semantics are deliberate: file ABSENT or
    * torn content → -1 (no recorded high-water — the marker scan is
    * authoritative, and the hwm is only ever written after its version
    * is visible); an unexpected READ failure → propagate, FAILING the
    * commit — in the vacuumed-marker configuration `retain` exists for,
    * silently degrading on a transient filesystem error would let an
    * already-committed epoch land twice during a restart replay.
    *
    * Lineage note: the hwm belongs to the table's CURRENT streaming
    * lineage. A batch truncate/overwrite deletes it (new lineage — see
    * [[RowLogBatchWrite.commit]]); pointing a brand-new streaming query
    * (fresh checkpoint, epochs restarting at 0) at a root a PREVIOUS
    * query populated requires removing `_epoch-hwm` (and any surviving
    * `_epoch-*` marker versions) first, or the old high-water silently
    * drops every new commit as a replay.
    */
  private def hwmFromFile(f: org.apache.hadoop.fs.FileSystem): Long = {
    if (!f.exists(hwmFile)) return -1L
    val in = f.open(hwmFile)
    val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    try s.toLong catch { case _: NumberFormatException => -1L } // torn write
  }

  private def epochCommitted(epochId: Long): Boolean = {
    val f = RowLogTable.fs(root)
    val rootPath = new Path(root)
    // Committed epochs are MONOTONE: structured streaming commits batches
    // in order and only ever replays the tail one after a restart, so the
    // newest version carrying an epoch marker is the high-water mark —
    // committed iff epochId ≤ it. Scanning newest-first and stopping at
    // the first marker makes this O(1) listings per commit at micro-batch
    // cadence (batch-write versions without markers are skipped), instead
    // of one exists() probe per version per epoch — O(n²) cumulative over
    // a long-running query. The root-level `_epoch-hwm` file is taken as
    // a second witness (max of both wins): with auto-vacuum retention the
    // marker versions themselves are transient.
    val scanHwm = VersionedTable.versionsOf(f, rootPath).reverseIterator
      .map { v =>
        f.listStatus(new Path(rootPath, VersionedTable.dirName(v)))
          .map(_.getPath.getName).collectFirst {
            case n if n.startsWith("_epoch-") => n.stripPrefix("_epoch-").toLong
          }
      }
      .collectFirst { case Some(hwm) => hwm }
      .getOrElse(-1L)
    epochId <= math.max(scanHwm, hwmFromFile(f))
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val stg = staging(epochId)
    val f = RowLogTable.fs(root)
    if (epochCommitted(epochId)) { // replayed epoch — exactly-once drop
      f.delete(stg, true)
      return
    }
    RowLogCommitOps.finalizeStaging(root, stg, nonce, schema.json,
      messages.collect { case RowLogCommit(file, _) => file }.toSet,
      extraMarkers = Seq(s"_epoch-$epochId"))
    // record the high-water AFTER the version is visible (a crash between
    // the two leaves the marker scan authoritative, never a false replay
    // drop), THEN vacuum — so replay detection no longer depends on the
    // markers retention is about to delete
    if (hwmFromFile(f) < epochId) {
      val out = f.create(hwmFile, true)
      try out.write(epochId.toString.getBytes("UTF-8")) finally out.close()
    }
    retain.foreach(k =>
      VersionedTable.vacuumFs(f, new Path(root), keep = k))
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    RowLogTable.fs(root).delete(staging(epochId), true)
}

case class RowLogStreamingWriterFactory(root: String, nonce: String,
    schemaJson: String, confMap: Map[String, String])
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val staging = new Path(new Path(root), s"_staging-$nonce-e$epochId")
    val f = staging.getFileSystem(HadoopConfMap.restore(confMap))
    f.mkdirs(staging)
    RowLogWriters.fileWriter(f, staging, schemaJson,
      f"part-$partitionId%05d-$taskId.rowlog")
  }
}

class RowLogBatchWrite(root: String, schema: StructType) extends BatchWrite {
  private val nonce = java.util.UUID.randomUUID().toString.take(8)
  private val stagingDir = new Path(new Path(root), s"_staging-$nonce")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val f = RowLogTable.fs(root)
    f.mkdirs(stagingDir)
    VersionedTable.sweepOrphans(f, new Path(root), 15 * 60 * 1000L)
    RowLogWriterFactory(stagingDir.toString, schema.json, HadoopConfMap.capture())
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    RowLogCommitOps.finalizeStaging(root, stagingDir, nonce, schema.json,
      messages.collect { case RowLogCommit(file, _) => file }.toSet,
      extraMarkers = Seq.empty)
    // a batch truncate/overwrite starts a NEW table lineage: the
    // streaming epoch high-water must not outlive it, or a later
    // streaming query's epochs ≤ the stale mark are silently dropped as
    // replays (permanently — vacuum can reclaim marker versions but
    // never touched this file)
    RowLogTable.fs(root).delete(new Path(new Path(root), "_epoch-hwm"), false)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    RowLogTable.fs(root).delete(stagingDir, true)
}

case class RowLogCommit(file: String, rows: Long) extends WriterCommitMessage

/** Hadoop conf as a serializable map — factories ship it to executors so
  * remote filesystems see the session's credentials/settings (a plain
  * `new Configuration()` executor-side only works for file://).
  */
private[sources] object HadoopConfMap {
  def capture(): Map[String, String] = {
    val c = RowLogTable.conf()
    val it = c.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }
  def restore(m: Map[String, String]): Configuration = {
    val c = new Configuration(false)
    m.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

case class RowLogWriterFactory(stagingDir: String, schemaJson: String,
    confMap: Map[String, String])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val staging = new Path(stagingDir)
    val f = staging.getFileSystem(HadoopConfMap.restore(confMap))
    // taskId is unique per attempt, so speculative attempts never collide
    RowLogWriters.fileWriter(f, staging, schemaJson,
      f"part-$partitionId%05d-$taskId.rowlog")
  }
}

private[sources] object RowLogWriters {
  def fileWriter(f: org.apache.hadoop.fs.FileSystem, staging: Path,
      schemaJson: String, file: String): DataWriter[InternalRow] = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val path = new Path(staging, file)
    new DataWriter[InternalRow] {
      private val out = new DataOutputStream(f.create(path, true))
      private val toUnsafe = UnsafeProjection.create(schema)
      private var rows = 0L
      override def write(record: InternalRow): Unit = {
        val u = toUnsafe(record)
        out.writeInt(u.getSizeInBytes)
        out.write(u.getBytes)
        rows += 1
      }
      override def commit(): WriterCommitMessage = { out.close(); RowLogCommit(file, rows) }
      override def abort(): Unit = { out.close(); f.delete(path, false) }
      override def close(): Unit = ()
    }
  }
}

/** `sources.Filter` → bound Catalyst predicate over the STORED (full)
  * row schema. A filter translates iff every referenced attribute
  * resolves and the shape is one Spark itself evaluates — translation
  * failure just means "residual", never an error. The translated
  * expression evaluates with the same Catalyst semantics the upstream
  * Filter node would have used (three-valued logic via
  * `BasePredicate.eval`: null ⇒ row excluded), so claiming pushed
  * filters as fully applied is exact.
  */
private[sources] object RowLogFilters {
  import org.apache.spark.sql.catalyst.{expressions => ce}

  def translate(schema: StructType, f: sources.Filter): Option[ce.Expression] = {
    def idx(attr: String): Option[Int] = {
      val i = schema.fieldNames.indexOf(attr)
      if (i >= 0) Some(i) else None
    }
    def ref(attr: String): Option[ce.BoundReference] =
      idx(attr).map { i =>
        ce.BoundReference(i, schema(i).dataType, schema(i).nullable)
      }
    def lit(attr: String, v: Any): Option[ce.Expression] =
      idx(attr).map { i =>
        ce.Literal.create(v, schema(i).dataType)
      }
    def bin(attr: String, v: Any)(
        mk: (ce.Expression, ce.Expression) => ce.Expression): Option[ce.Expression] =
      for { r <- ref(attr); l <- lit(attr, v) } yield mk(r, l)
    f match {
      case sources.EqualTo(a, v)            => bin(a, v)(ce.EqualTo)
      case sources.EqualNullSafe(a, v)      => bin(a, v)(ce.EqualNullSafe)
      case sources.GreaterThan(a, v)        => bin(a, v)(ce.GreaterThan)
      case sources.GreaterThanOrEqual(a, v) => bin(a, v)(ce.GreaterThanOrEqual)
      case sources.LessThan(a, v)           => bin(a, v)(ce.LessThan)
      case sources.LessThanOrEqual(a, v)    => bin(a, v)(ce.LessThanOrEqual)
      case sources.In(a, vs) =>
        ref(a).map(r => ce.In(r, vs.toSeq.map(v =>
          ce.Literal.create(v, r.dataType))))
      case sources.IsNull(a)    => ref(a).map(ce.IsNull)
      case sources.IsNotNull(a) => ref(a).map(ce.IsNotNull)
      case sources.StringStartsWith(a, v) => bin(a, v)(ce.StartsWith)
      case sources.StringEndsWith(a, v)   => bin(a, v)(ce.EndsWith)
      case sources.StringContains(a, v)   => bin(a, v)(ce.Contains)
      case sources.And(l, r) =>
        for { cl <- translate(schema, l); cr <- translate(schema, r) }
          yield ce.And(cl, cr)
      case sources.Or(l, r) =>
        for { cl <- translate(schema, l); cr <- translate(schema, r) }
          yield ce.Or(cl, cr)
      case sources.Not(c) => translate(schema, c).map(ce.Not)
      case sources.AlwaysTrue()  => Some(ce.Literal.TrueLiteral)
      case sources.AlwaysFalse() => Some(ce.Literal.FalseLiteral)
      case _ => None
    }
  }

  /** Conjunction of all translated filters, ready to bind to a reader. */
  def predicateExpr(schema: StructType,
      filters: Seq[sources.Filter]): Option[ce.Expression] =
    filters.flatMap(translate(schema, _)).reduceOption(ce.And)
}

class RowLogScan(root: String, fullSchema: StructType, required: StructType,
    version: Option[Long], pushed: Array[sources.Filter] = Array.empty)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_rowlog $root${version.map(v => s" @v$v").getOrElse("")} " +
      s"ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  // real on-disk bytes of the pinned version (one listing) — join sizing
  // sees the table's actual footprint, not defaultSizeInBytes
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes: Long =
      try {
        val dir = RowLogTable.versionDir(root, version)
        RowLogTable.fs(root).listStatus(dir)
          .filter(_.getPath.getName.endsWith(".rowlog")).map(_.getLen).sum
      } catch { case _: Exception => Long.MaxValue }
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }
  override def planInputPartitions(): Array[InputPartition] = {
    // belt-and-braces against the analysis/execution version race the
    // getTable-time pin already closes: the pinned version's stored
    // schema must BE the analysis schema, or the UnsafeRow bytes would
    // be reinterpreted as garbage — fail loudly instead
    val stored = RowLogTable.schemaAt(root, version)
    require(stored == fullSchema,
      s"rowlog $root${version.map(v => s" v$v").getOrElse("")} schema " +
        s"changed between analysis and execution: stored " +
        s"${stored.simpleString}, expected ${fullSchema.simpleString}")
    val dir = RowLogTable.versionDir(root, version)
    RowLogTable.fs(root).listStatus(dir).toSeq
      .filter(_.getPath.getName.endsWith(".rowlog"))
      .sortBy(_.getPath.getName)
      .map(st => RowLogFile(st.getPath.toString): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    RowLogReaderFactory(fullSchema.json, required.json, pushed,
      HadoopConfMap.capture())
}

case class RowLogFile(path: String) extends InputPartition

case class RowLogReaderFactory(fullSchemaJson: String, requiredSchemaJson: String,
    pushed: Array[sources.Filter], confMap: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val RowLogFile(pathStr) = p
    val fullSchema = DataType.fromJson(fullSchemaJson).asInstanceOf[StructType]
    val required = DataType.fromJson(requiredSchemaJson).asInstanceOf[StructType]
    val path = new Path(pathStr)
    // explicit 64 KiB buffer: FSDataInputStream buffering covers local
    // disks, but the 4-byte length-prefix read pattern would be one RPC
    // per row on an unbuffered remote filesystem
    val in = new DataInputStream(new java.io.BufferedInputStream(
      path.getFileSystem(HadoopConfMap.restore(confMap)).open(path), 1 << 16))
    // pushed predicates evaluate against the FULL stored row (they may
    // reference columns the prune drops), codegen'd once per partition
    val filter: UnsafeRow => Boolean =
      RowLogFilters.predicateExpr(fullSchema, pushed.toSeq) match {
        case None => _ => true
        case Some(e) =>
          val pred = org.apache.spark.sql.catalyst.expressions.Predicate.create(e)
          pred.initialize(0)
          (r: UnsafeRow) => pred.eval(r)
      }
    // prune once per partition: bind required columns to their positions
    // in the stored row, emit rows in the pruned schema's order
    val prune: UnsafeRow => InternalRow =
      if (required == fullSchema) identity
      else {
        val proj = UnsafeProjection.create(
          required.map { f =>
            val i = fullSchema.fieldIndex(f.name)
            org.apache.spark.sql.catalyst.expressions.BoundReference(
              i, fullSchema(i).dataType, fullSchema(i).nullable)
          })
        (r: UnsafeRow) => proj(r)
      }
    new PartitionReader[InternalRow] {
      private val row = new UnsafeRow(fullSchema.size)
      private var eof = false
      override def next(): Boolean = {
        while (!eof) {
          val lenOrEof = try in.readInt() catch {
            case _: java.io.EOFException => eof = true; -1
          }
          if (!eof) {
            val bytes = new Array[Byte](lenOrEof)
            in.readFully(bytes)
            row.pointTo(bytes, lenOrEof)
            if (filter(row)) return true // non-matching rows never surface
          }
        }
        false
      }
      override def get(): InternalRow = prune(row)
      override def close(): Unit = in.close()
    }
  }
}
