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

  test("versioned table: writes are linear versions, reads pin snapshots") {
    import graft.sinks.VersionedTable
    val root = tmpDir("vt1") + "/t"
    val orders = spark.read.parquet(sf("orders"))
    val v1 = VersionedTable.write(spark, orders.filter(col("o_orderkey") <= 100), root)
    val v2 = VersionedTable.write(spark, orders, root)
    assert(v1 == 1L && v2 == 2L)
    assert(VersionedTable.versions(spark, root) == Seq(1L, 2L))
    // latest is v2; pinned v1 still reads the old snapshot after v2 landed
    assert(VersionedTable.read(spark, root).count() == orders.count())
    assert(VersionedTable.read(spark, root, Some(1L)).count() ==
      orders.filter(col("o_orderkey") <= 100).count())
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, root, Some(3L))
    }
  }

  test("versioned table: staging orphans are invisible and swept; vacuum keeps newest") {
    import graft.sinks.VersionedTable
    val root = tmpDir("vt2") + "/t"
    val orders = spark.read.parquet(sf("orders"))
    VersionedTable.write(spark, orders.limit(10), root)
    // a crashed writer's staging dir must not surface as a version...
    val orphan = new java.io.File(s"$root/_staging-2-deadbeef")
    orphan.mkdirs()
    assert(VersionedTable.versions(spark, root) == Seq(1L))
    // ...and the next write sweeps it, then commits as v2
    val v2 = VersionedTable.write(spark, orders.limit(20), root)
    assert(v2 == 2L && !orphan.exists())
    VersionedTable.write(spark, orders.limit(30), root)
    assert(VersionedTable.vacuum(spark, root, keep = 2) == Seq(1L))
    assert(VersionedTable.versions(spark, root) == Seq(2L, 3L))
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, root, Some(1L))
    }
    assert(VersionedTable.read(spark, root, Some(3L)).count() == 30)
  }
}
