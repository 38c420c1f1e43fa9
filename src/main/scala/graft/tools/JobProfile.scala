package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Per-JOB wall-time attribution for ONE registry query: runs the query
  * (warm rep first, then a timed rep) with a listener recording every
  * job's wall, task-time sum, stage count and shuffle bytes, then prints
  * jobs sorted by wall. The multi-action demo queries (incremental
  * ingests, merges) are many Spark jobs per query — suite-level timing
  * can't see WHICH pass is the expensive one; this can.
  * Usage: runMain graft.tools.JobProfile <query> [repsAfterWarm]
  */
object JobProfile {
  private final case class JobRec(
      desc: String, var t0: Long = 0L, var t1: Long = 0L,
      var taskMs: Long = 0L, var stages: Int = 0,
      var shufRead: Long = 0L, var shufWrite: Long = 0L, var inBytes: Long = 0L)

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.codegen.useIdInClassName", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    // warm (codegen/JIT) at sf0.001 then once at the target sf
    try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"warm failed: ${e.getMessage}") }
    SparkEntry.resetSessionCache(spark)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Per-ACTION decomposition: every count/collect/parquet-write/noop-save
    // inside the query body fires the QueryExecutionListener once, with
    // the action's own wall. The demo queries are 20-90 actions each —
    // this is the granularity at which "where does the time go" is
    // answerable (job-level grouping collapses into AQE's shared
    // materializeFuture callsite and says nothing).
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    val qel = new org.apache.spark.sql.util.QueryExecutionListener {
      private def describe(qe: org.apache.spark.sql.execution.QueryExecution): String = {
        val l = qe.logical
        val nodes = l.collect { case n => n.nodeName }
        val leafRel = qe.logical.collectLeaves().map(_.nodeName).distinct.mkString("+")
        s"${nodes.take(3).mkString(">")}|leaves=$leafRel|ops=${nodes.size}"
      }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        val phases = qe.tracker.phases.map { case (p, s) =>
          f"$p=${(s.endTimeMs - s.startTimeMs) / 1e3}%.2f" }.mkString(" ")
        actions.add((s"$funcName ${describe(qe)} [$phases]", durationNs / 1e9))
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(qel)
    val walls = (1 to reps).map { _ =>
      SparkEntry.resetSessionCache(spark)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    Thread.sleep(1000) // let listener events drain
    spark.listenerManager.unregister(qel)
    import scala.jdk.CollectionConverters._
    val acts = actions.asScala.toVector
    println(f"\n=== $name timed rep(s): ${walls.map(w => f"$w%.2f").mkString(" ")} s; ${acts.size} actions ===")
    println(f"sum of action walls: ${acts.map(_._2).sum}%.2f s")
    println("\nactions in order (wall s):")
    acts.foreach { case (d, w) => if (w > 0.05) println(f"  $w%7.2f  $d") }
    spark.stop()
  }
}
