package graft

import graft.catalog.InMemoryCatalog
import graft.config.{JobConfig, SortOrder, TableConfig}
import graft.sources.ParquetSource
import graft.state.FileBookmarkStore

/** D2 concurrency: independent tables ingested in parallel within one
  * app, with thread-safe bookmark staging and a single job-end commit.
  */
class ConcurrentDriverSpec extends SparkSpec {

  test("three tables ingest concurrently with correct bookmarks") {
    val work = tmpDir("conc")
    val cfg = JobConfig(
      jobName = "conc", sourceTablePrefix = "", targetLocation = s"$work/target",
      targetDatabase = "db", targetFormat = "parquet",
      tables = Seq(
        TableConfig("orders", Seq("o_orderkey"), SortOrder.Asc, Some("o_orderstatus")),
        TableConfig("lineitem", Seq("l_orderkey", "l_linenumber"), SortOrder.Asc),
        TableConfig("events", Seq("event_id"), SortOrder.Asc, Some("event_type"))),
      maxConcurrentTables = 3)
    val bm = new FileBookmarkStore(s"$work/bm.json")
    val results = new Driver(spark, cfg, new ParquetSource("/root/testdata/sf0.001"),
      new InMemoryCatalog, bm).run()
    assert(results.size == 3 && results.forall(!_.skippedEmpty))
    val orders = spark.read.parquet(sf("orders"))
    assert(results.find(_.table == "orders").get.rowsWritten == orders.count())
    assert(bm.get("orders")("o_orderkey") == "1499")
    assert(bm.get("lineitem").keySet == Set("l_orderkey", "l_linenumber"))
    assert(bm.get("events")("event_id").toLong > 0)
    assert(spark.read.parquet(s"$work/target/orders").count() == orders.count())
    assert(spark.read.parquet(s"$work/target/lineitem").count() ==
      spark.read.parquet(sf("lineitem")).count())
    assert(spark.read.parquet(s"$work/target/events").count() ==
      spark.read.parquet(sf("events")).count())
  }
}
