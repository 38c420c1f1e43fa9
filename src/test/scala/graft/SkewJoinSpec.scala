package graft

import org.apache.spark.sql.functions._

/** AQE's runtime skew-join split is the join-side half of the skew story
  * (Skew.saltedAgg is the aggregation-side half). Pin that a genuinely
  * skewed shuffle join actually gets split at runtime — the config
  * surface is easy to break silently and nothing else in the suite
  * executes the skew path.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8KB")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // key 0 carries 200k rows; keys 1..50 carry 10 each — one hot
      // reduce partition, orders of magnitude over its siblings
      val left = spark.range(200000).select(lit(0L).as("k"), col("id").as("lv"))
        .union(spark.range(500).select((col("id") % 50 + 1).as("k"), col("id").as("lv")))
      val right = spark.range(51).select(col("id").as("k"), (col("id") * 10).as("rv"))
      // NB: a downstream groupBy on the join key would VETO the skew
      // split (it would break the join's output partitioning guarantee) —
      // a global aggregate leaves AQE free to split the hot partition
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(col("lv") + col("rv")).as("s"))

      val row = joined.collect()(0)
      assert(row.getLong(0) == 200500L)

      // the executed (adaptive, final) plan must show the split join
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("saltedJoin equals the plain join row-for-row") {
    import graft.operators.Skew
    val big = spark.range(10000).select((col("id") % 7).as("k"), col("id").as("v"))
    val dim = spark.range(7).select(col("id").as("k"), (col("id") * 100).as("w"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "w").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(rows(Skew.saltedJoin(big, dim, Seq("k"), salts = 8)) == rows(big.join(dim, "k")))
  }
}
