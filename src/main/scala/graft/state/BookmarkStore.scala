package graft.state

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Per-table bookmark state — our standalone equivalent of Glue job
  * bookmarks (jdbc_incremental.py:176-179,305-306,639).
  *
  * A bookmark is, per table, a map of bookmark-key column → last committed
  * value (stringified; values compare via a typed cast at filter time).
  * Matching the reference, new values are STAGED during the run and only
  * COMMITTED after all tables finish (single `job.commit()`,
  * jdbc_incremental.py:639) — a mid-run crash re-ingests from the previous
  * committed state. Per-table commit is available via `commitTable` for
  * callers that prefer tighter exactly-once windows (SURVEY §7.4).
  */
trait BookmarkStore {
  /** Last committed bookmark for a table, or empty map if never ingested. */
  def get(table: String): Map[String, String]
  /** Stage a new bookmark (not visible to `get` until commit). */
  def stage(table: String, values: Map[String, String]): Unit
  /** Commit all staged bookmarks (reference semantics: job-end, D3). */
  def commitAll(): Unit
  /** Commit one table's staged bookmark immediately. */
  def commitTable(table: String): Unit
}

class InMemoryBookmarkStore extends BookmarkStore {
  protected var committed: Map[String, Map[String, String]] = Map.empty
  protected var staged: Map[String, Map[String, String]] = Map.empty
  def get(table: String): Map[String, String] =
    synchronized { committed.getOrElse(table, Map.empty) }
  def stage(table: String, values: Map[String, String]): Unit =
    synchronized { staged += table -> values }
  def commitAll(): Unit =
    synchronized { committed ++= staged; staged = Map.empty; persist() }
  def commitTable(table: String): Unit = synchronized {
    staged.get(table).foreach { v => committed += table -> v; staged -= table; persist() }
  }
  protected def persist(): Unit = ()
}

/** JSON-file-backed store: `{table: {keyCol: value}}`. Written atomically
  * (temp file + move) so a crash mid-commit never corrupts state.
  */
class FileBookmarkStore(path: String) extends InMemoryBookmarkStore {
  private val mapper = new ObjectMapper()
  private val file: Path = Paths.get(path)
  locally {
    if (Files.exists(file)) {
      val root = mapper.readTree(Files.readString(file))
      committed = root.properties().asScala.map { e =>
        e.getKey -> e.getValue.properties().asScala.map(kv => kv.getKey -> kv.getValue.asText).toMap
      }.toMap
    }
  }
  override protected def persist(): Unit = {
    val root = mapper.createObjectNode()
    committed.toSeq.sortBy(_._1).foreach { case (t, kvs) =>
      val n = root.putObject(t): ObjectNode
      kvs.toSeq.sortBy(_._1).foreach { case (k, v) => n.put(k, v) }
    }
    if (file.getParent != null) Files.createDirectories(file.getParent)
    val tmp = file.resolveSibling(file.getFileName.toString + ".tmp")
    Files.writeString(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    Files.move(tmp, file, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }
}
