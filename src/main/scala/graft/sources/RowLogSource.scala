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

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new RowLogTable(properties.get("path"), schema,
      Option(properties.get("version")).map(_.toLong))
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
    new ScanBuilder with SupportsPushDownRequiredColumns {
      // rowlog is row-major, so pruning can't skip bytes on disk — but
      // honoring it still shrinks every downstream exchange/operator row
      // and keeps the scan's contract honest (ReadSchema shows the prune)
      private var required = schema0
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new RowLogScan(root, schema0, required, version)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new RowLogWriteBuilder(root, info.schema())
}

class RowLogWriteBuilder(root: String, schema: StructType)
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
      override def toStreaming: StreamingWrite = new RowLogStreamingWrite(root, schema)
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
class RowLogStreamingWrite(root: String, schema: StructType) extends StreamingWrite {
  private val nonce = java.util.UUID.randomUUID().toString.take(8)
  private def staging(epochId: Long) =
    new Path(new Path(root), s"_staging-$nonce-e$epochId")

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    RowLogStreamingWriterFactory(root, nonce, schema.json, HadoopConfMap.capture())

  private def epochCommitted(epochId: Long): Boolean = {
    val f = RowLogTable.fs(root)
    val rootPath = new Path(root)
    VersionedTable.versionsOf(f, rootPath).exists { v =>
      f.exists(new Path(new Path(rootPath, VersionedTable.dirName(v)), s"_epoch-$epochId"))
    }
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val stg = staging(epochId)
    if (epochCommitted(epochId)) { // replayed epoch — exactly-once drop
      RowLogTable.fs(root).delete(stg, true)
      return
    }
    RowLogCommitOps.finalizeStaging(root, stg, nonce, schema.json,
      messages.collect { case RowLogCommit(file, _) => file }.toSet,
      extraMarkers = Seq(s"_epoch-$epochId"))
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

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    RowLogCommitOps.finalizeStaging(root, stagingDir, nonce, schema.json,
      messages.collect { case RowLogCommit(file, _) => file }.toSet,
      extraMarkers = Seq.empty)

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

class RowLogScan(root: String, fullSchema: StructType, required: StructType,
    version: Option[Long])
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_rowlog $root${version.map(v => s" @v$v").getOrElse("")} " +
      s"ReadSchema: ${required.simpleString}"

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
    val dir = RowLogTable.versionDir(root, version)
    RowLogTable.fs(root).listStatus(dir).toSeq
      .filter(_.getPath.getName.endsWith(".rowlog"))
      .sortBy(_.getPath.getName)
      .map(st => RowLogFile(st.getPath.toString): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    RowLogReaderFactory(fullSchema.json, required.json, HadoopConfMap.capture())
}

case class RowLogFile(path: String) extends InputPartition

case class RowLogReaderFactory(fullSchemaJson: String, requiredSchemaJson: String,
    confMap: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val RowLogFile(pathStr) = p
    val fullSchema = DataType.fromJson(fullSchemaJson).asInstanceOf[StructType]
    val required = DataType.fromJson(requiredSchemaJson).asInstanceOf[StructType]
    val path = new Path(pathStr)
    val in = new DataInputStream(
      path.getFileSystem(HadoopConfMap.restore(confMap)).open(path))
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
        if (eof) return false
        val lenOrEof = try in.readInt() catch {
          case _: java.io.EOFException => eof = true; -1
        }
        if (eof) false else {
          val bytes = new Array[Byte](lenOrEof)
          in.readFully(bytes)
          row.pointTo(bytes, lenOrEof)
          true
        }
      }
      override def get(): InternalRow = prune(row)
      override def close(): Unit = in.close()
    }
  }
}
