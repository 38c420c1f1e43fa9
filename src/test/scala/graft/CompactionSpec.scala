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
    val orphan = new java.io.File(s"$root/_staging-deadbeef")
    orphan.mkdirs()
    orphan.setLastModified(System.currentTimeMillis() - 3600 * 1000L)
    assert(VersionedTable.versions(spark, root) == Seq(1L))
    // ...and once it has outlived the TTL (a live concurrent writer's
    // staging must NOT be swept) the next write reclaims it, commits as v2
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

  test("versioned table: racing writers all commit, linearly, with their own data") {
    import graft.sinks.VersionedTable
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = tmpDir("vt3") + "/t"
    val orders = spark.read.parquet(sf("orders")).cache()
    orders.count()
    // Hadoop rename moves a source INTO an existing destination dir (and
    // returns true), so a naive rename-commit lets a losing racer report
    // success while its data lands hidden under v<N>/_staging-*. The
    // nonce-marker protocol must give every racer its OWN version.
    val writers = (1 to 6).map { k =>
      Future(k -> VersionedTable.write(spark, orders.limit(k * 10), root))
    }
    val committed = Await.result(Future.sequence(writers), 120.seconds).toMap
    assert(committed.values.toSeq.sorted == (1L to 6L),
      s"expected six linear versions, got $committed")
    committed.foreach { case (k, v) =>
      assert(VersionedTable.read(spark, root, Some(v)).count() == k * 10,
        s"writer $k's version $v does not contain writer $k's rows")
    }
    // no racer's data may hide inside another's committed version dir
    (1L to 6L).foreach { v =>
      val sub = new java.io.File(f"$root/v$v%08d").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("_staging-"))
      assert(sub.isEmpty, s"v$v hides a lost write: ${sub.mkString(",")}")
    }
    orders.unpersist()
  }

  test("versioned table: checkpoint supersedes covered versions; union-read and pins hold") {
    import graft.sinks.VersionedTable
    import spark.implicits._
    val root = tmpDir("vt5") + "/t"
    def rows(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    // three delta versions, then a checkpoint of their union
    VersionedTable.write(spark, (1L to 10L).toDF("x"), root)
    VersionedTable.write(spark, (11L to 20L).toDF("x"), root)
    VersionedTable.write(spark, (21L to 30L).toDF("x"), root)
    val c = VersionedTable.writeCheckpoint(spark,
      VersionedTable.readAllVersions(spark, root), root, upTo = 3L)
    assert(c == 4L)
    assert(VersionedTable.versions(spark, root) == Seq(1L, 2L, 3L, 4L))
    // union read = checkpoint only (no double count), same data
    assert(rows(VersionedTable.readAllVersions(spark, root)) == (1L to 30L).toSet)
    // PRE-compaction pinned reads keep working while the deltas remain
    assert(rows(VersionedTable.readAllVersions(spark, root, Some(2L))) == (1L to 20L).toSet)
    // a delta landing AFTER the checkpoint reads alongside it
    VersionedTable.write(spark, (31L to 35L).toDF("x"), root)
    assert(rows(VersionedTable.readAllVersions(spark, root)) == (1L to 35L).toSet)
    // reclaim covered versions: union read unchanged, covered pins fail fast
    assert(VersionedTable.vacuumCovered(spark, root) == Seq(1L, 2L, 3L))
    assert(rows(VersionedTable.readAllVersions(spark, root)) == (1L to 35L).toSet)
    intercept[IllegalArgumentException] {
      VersionedTable.readAllVersions(spark, root, Some(2L)).collect()
    }
    // pin AT the checkpoint still time-travels to the compaction boundary
    assert(rows(VersionedTable.readAllVersions(spark, root, Some(4L))) == (1L to 30L).toSet)
    // a racer's version BETWEEN the covered bound and the checkpoint's own
    // number is never mistaken for covered data: simulate by checkpointing
    // only up to version 4 (the first checkpoint) while v5 exists
    val c2 = VersionedTable.writeCheckpoint(spark,
      VersionedTable.readAllVersions(spark, root, Some(4L)), root, upTo = 4L)
    assert(c2 == 6L)
    assert(rows(VersionedTable.readAllVersions(spark, root)) == (1L to 35L).toSet,
      "the uncovered racer version v5 must still be read")
  }

  test("versioned table: crashed-vacuum tombstones are swept by the next write") {
    import graft.sinks.VersionedTable
    val root = tmpDir("vt4") + "/t"
    val orders = spark.read.parquet(sf("orders"))
    VersionedTable.write(spark, orders.limit(10), root)
    // a vacuum that crashed between rename and delete leaves _dropped-<v>
    val tomb = new java.io.File(s"$root/_dropped-9")
    tomb.mkdirs()
    tomb.setLastModified(System.currentTimeMillis() - 3600 * 1000L)
    assert(VersionedTable.versions(spark, root) == Seq(1L))
    VersionedTable.write(spark, orders.limit(20), root)
    assert(!tomb.exists(), "_dropped tombstone not reclaimed by write sweep")
  }
}
