package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing is the 100 TB co-location strategy: pre-shuffling both fact
  * tables into the same bucket layout makes every subsequent equi-join on
  * the bucket key shuffle-free. Pin that the bucketed join really plans
  * with zero exchanges — the whole point of paying the bucketed write.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans with zero shuffle exchanges") {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dir = tmpDir("graft-bucketed")
      spark.read.parquet(sf("orders"))
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$dir/orders").saveAsTable("b_orders")
      spark.read.parquet(sf("lineitem"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$dir/lineitem").saveAsTable("b_lineitem")

      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // the join itself must be exchange-free; the only allowed shuffle is
      // the final (post-join) aggregation
      assert(shuffles.size <= 1, joined.queryExecution.executedPlan.toString)
      val joinShuffleFree = !joined.queryExecution.executedPlan.toString
        .linesIterator.exists(l => l.contains("Exchange hashpartitioning(o_orderkey") ||
          l.contains("Exchange hashpartitioning(l_orderkey"))
      assert(joinShuffleFree, joined.queryExecution.executedPlan.toString)

      // and the result is right: every lineitem matches exactly one order
      val n = joined.agg(sum("n")).collect()(0).getLong(0)
      val expected = spark.read.parquet(sf("lineitem")).count()
      assert(n == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
    }
  }
}
