package graft

import graft.config.{SortOrder, TableConfig}
import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._

/** Streaming twin of the incremental ingest: chunked arrivals drain into a
  * partitioned target exactly once, across restarts, via the checkpoint +
  * file-sink commit log.
  */
class StreamingIngestSpec extends SparkSpec {

  test("two-chunk streaming ingest equals one-shot; restart adds nothing") {
    val work = tmpDir("sting")
    val full = spark.read.parquet(sf("orders"))
    val cfg = TableConfig("orders", Seq("o_orderkey"), SortOrder.Asc, Some("o_orderstatus"))
    new java.io.File(s"$work/in").mkdirs()

    // chunk 1 arrives
    full.filter(col("o_orderkey") <= 750).coalesce(1).write.parquet(s"$work/chunk1")
    java.nio.file.Files.list(java.nio.file.Paths.get(s"$work/chunk1")).forEach { p =>
      if (p.toString.endsWith(".parquet"))
        java.nio.file.Files.copy(p, java.nio.file.Paths.get(s"$work/in/c1.parquet"))
    }
    val q1 = StreamingIngest.start(spark, s"$work/in", full.schema, cfg, s"$work/target")
    q1.awaitTermination()
    val afterC1 = spark.read.parquet(s"$work/target/orders").count()
    assert(afterC1 == full.filter(col("o_orderkey") <= 750).count())

    // chunk 2 arrives; restart the query from the same checkpoint
    full.filter(col("o_orderkey") > 750).coalesce(1).write.parquet(s"$work/chunk2")
    java.nio.file.Files.list(java.nio.file.Paths.get(s"$work/chunk2")).forEach { p =>
      if (p.toString.endsWith(".parquet"))
        java.nio.file.Files.copy(p, java.nio.file.Paths.get(s"$work/in/c2.parquet"))
    }
    val q2 = StreamingIngest.start(spark, s"$work/in", full.schema, cfg, s"$work/target")
    q2.awaitTermination()
    val target = spark.read.parquet(s"$work/target/orders")
    assert(target.count() == full.count(), "chunk1 must not be re-ingested")

    // a third restart with nothing new is a no-op
    val q3 = StreamingIngest.start(spark, s"$work/in", full.schema, cfg, s"$work/target")
    q3.awaitTermination()
    assert(spark.read.parquet(s"$work/target/orders").count() == full.count())

    // partitioned layout matches the batch sink's
    val dirs = new java.io.File(s"$work/target/orders").listFiles()
      .filter(_.isDirectory).map(_.getName).filterNot(_.startsWith("_")).sorted
    assert(dirs.sameElements(Array("o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P")))
  }
}
