package graft

import graft.sinks.Compaction
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  test("compaction collapses per-partition small files, preserves data") {
    val work = tmpDir("compact")
    val orders = spark.read.parquet(sf("orders"))
    // simulate many incremental appends: 20 files per partition
    orders.repartition(20).write.partitionBy("o_orderstatus").parquet(s"$work/t")
    val before = spark.read.parquet(s"$work/t")
    val expectedCount = before.count()
    val expectedSum = before.agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head.getDecimal(0)

    val r = Compaction.compact(spark, s"$work/t", "parquet", Seq("o_orderstatus"))
    assert(r.filesBefore > 50, s"expected many small files, got ${r.filesBefore}")
    assert(r.filesAfter == 3, s"expected one file per partition, got ${r.filesAfter}")
    assert(r.rowCount == expectedCount)
    val after = spark.read.parquet(s"$work/t")
    assert(after.count() == expectedCount)
    assert(after.agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head.getDecimal(0) == expectedSum)
    // partition dirs intact
    val dirs = new java.io.File(s"$work/t").listFiles().filter(_.isDirectory)
      .map(_.getName).filterNot(_.startsWith("_")).sorted
    assert(dirs.sameElements(Array("o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P")))
  }

  test("maxRecordsPerFile splits oversized partitions") {
    val work = tmpDir("compact2")
    val orders = spark.read.parquet(sf("orders"))
    orders.repartition(10).write.parquet(s"$work/t")
    val r = Compaction.compact(spark, s"$work/t", "parquet", Seq.empty, maxRecordsPerFile = 400)
    assert(r.rowCount == orders.count())
    assert(r.filesAfter == math.ceil(orders.count() / 400.0).toInt)
  }
}
