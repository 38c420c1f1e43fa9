package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** sf1 scale rehearsal (VERDICT r4 task 4): generate a 10× replica of the
  * sf0.1 tables the most expensive queries read, run those queries once,
  * and record timings + plan shapes — converting SCALING.md's "this plan
  * survives 10×" arguments into executed evidence.
  *
  * Data: each sf0.1 table unions 10 key-shifted copies (keys offset by
  * replica × (max+1), so uniqueness and join fan-in scale linearly like a
  * real sf1). Document text gets a per-replica suffix — replicas are
  * near-duplicates, not identical rows, so LSH/containment queries face
  * 10-deep near-dup cliques instead of degenerate hash collisions.
  * Events keep their timestamps: sf1 means 10× rows per window (10×
  * streaming state), the dimension that actually stresses watermarks.
  *
  * Usage: `runMain graft.tools.ScaleRehearsal [outJson]` — generates
  * under SPARK_GRAFT_SF1_DIR (default /tmp/graft-sf1) if absent, then
  * times the rehearsal set and writes SCALE_r5.json.
  */
object ScaleRehearsal {

  val rehearsalQueries: Seq[String] = Seq(
    "st10_stream_outer_join", "st17_stream_full_outer", "m10_image_ahash",
    "q46_bucketed_join", "e3_embedding_neardup", "d21_bm25",
    "d41_sparse_cosine", "d47_semdedup", "q74_triangle_count",
    "d36_containment")

  /** (table, key columns to shift, text column to perturb). */
  private val tables: Seq[(String, Seq[String], Option[String])] = Seq(
    ("lineitem", Seq("l_orderkey"), None),
    ("orders", Seq("o_orderkey", "o_custkey"), None),
    ("customer", Seq("c_custkey"), None),
    ("events", Seq("event_id", "user_id"), None),
    ("documents", Seq("doc_id"), Some("text")),
    ("embeddings", Seq("vec_id"), None),
    ("part", Seq("p_partkey"), None),
    ("supplier", Seq("s_suppkey"), None),
    ("nation", Seq.empty, None),
    ("region", Seq.empty, None))

  def generate(spark: SparkSession, srcDir: String, dstDir: String,
      replicas: Int): Unit = {
    tables.foreach { case (name, keys, textCol) =>
      val src = spark.read.parquet(s"$srcDir/$name.parquet")
      val out =
        if (keys.isEmpty) src // tiny dims: copy as-is
        else {
          val offsets = keys.map { k =>
            k -> (src.agg(max(col(k).cast("long"))).head().getLong(0) + 1L)
          }.toMap
          val copies = (0 until replicas).map { r =>
            val shifted = offsets.foldLeft(src) { case (df, (k, off)) =>
              df.withColumn(k, col(k).cast("long") + lit(r * off))
            }
            textCol match {
              case Some(tc) if r > 0 =>
                shifted.withColumn(tc, concat(col(tc), lit(s" replica$r")))
              case _ => shifted
            }
          }
          copies.reduce(_ unionAll _)
        }
      out.write.mode("overwrite").parquet(s"$dstDir/$name.parquet")
      println(s"[scale] wrote $name")
    }
  }

  private def planNotes(df: DataFrame): String = {
    val p = df.queryExecution.executedPlan.toString
    def n(tag: String) = tag.r.findAllIn(p).size
    Seq(
      "bhj" -> n("BroadcastHashJoin"), "smj" -> n("SortMergeJoin"),
      "shj" -> n("ShuffledHashJoin"), "bnl" -> n("BroadcastNestedLoopJoin"),
      "cartesian" -> n("CartesianProduct"), "exchange" -> n("Exchange"),
      "aqe" -> n("AdaptiveSparkPlan"))
      .filter(_._2 > 0).map { case (k, v) => s"$k=$v" }.mkString(",")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dstDir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft-sf1")
    val outJson = if (args.nonEmpty) args(0) else "SCALE_r5.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Never generate in place or anywhere near the driver's testdata:
    // an overwrite into srcDir would delete its own input mid-read.
    require(new java.io.File(dstDir).getCanonicalPath !=
        new java.io.File(srcDir).getCanonicalPath,
      s"dstDir must differ from srcDir ($srcDir)")
    require(!new java.io.File(dstDir).getCanonicalPath.startsWith("/root/testdata"),
      "dstDir must not be under /root/testdata (read-only driver data)")
    // exists, not isDirectory: a prior run may have produced either shape
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dstDir/lineitem.parquet"))) {
      println(s"[scale] generating 10x replica of $srcDir at $dstDir")
      generate(spark, srcDir, dstDir, replicas = 10)
    } else println(s"[scale] reusing $dstDir")
    // warm codegen/JIT at the tiny sf so sf1 numbers are steady-state work
    val warmDir = "/root/testdata/sf0.001"
    val entries = rehearsalQueries.map { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[scale] warm $name failed: ${e.getMessage}") }
      val t0 = System.nanoTime()
      val result = try {
        val df = fn(spark, dstDir)
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val notes = try planNotes(fn(spark, dstDir)) catch { case _: Throwable => "" }
        println(f"SCALE $name%-24s $sec%8.2fs  $notes")
        s""""$name":{"sec":${"%.2f".format(sec)},"plan":"$notes"}"""
      } catch { case e: Throwable =>
        println(s"[scale] $name FAILED: ${e.getMessage}")
        s""""$name":{"sec":-1,"err":"${e.getMessage.take(120).replace("\"", "'")}"}"""
      }
      result
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson),
      s"""{"sf":"sf1(10x-sf0.1-replica)","queries":{${entries.mkString(",")}}}""" + "\n")
    println(s"[scale] wrote $outJson")
    spark.stop()
  }
}
