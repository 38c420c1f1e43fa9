package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's runtime skew-join splitting covers
  * joins; these cover the aggregation side, where one hot key (the empty
  * document, a null user, a default partition value) funnels a whole
  * reduce partition onto one task.
  */
object Skew {

  /** Two-phase salted aggregation: counts/sums per (key, salt) locally,
    * then merges the `salts` partial rows per key. The first shuffle
    * spreads a hot key over `salts` reducers; the second moves only
    * `salts` rows per key.
    *
    * `aggs` maps output column name → (phase-1 aggregate of the input
    * column, phase-2 merge of the phase-1 result) — e.g.
    * `"n" -> (count(lit(1)), sum)` or `"sv" -> (sum(col("v")), sum)`.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
      aggs: Map[String, (Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val phase1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(aggs.head._2._1.as(aggs.head._1),
        aggs.tail.map { case (n, (a, _)) => a.as(n) }.toSeq: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, (_, m)) => m(col(n)).as(n) }.toSeq: _*)
  }

  /** Salted count per key — the common case. Result equals
    * `df.groupBy(keys).count()` with the hot-key shuffle spread out.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int = 16): DataFrame =
    saltedAgg(df, keys, salts,
      Map("count" -> (count(lit(1)), (c: Column) => sum(c))))

  /** Explicitly salted equi-join for a known-skewed big side: each big
    * row gets a random salt in [0, salts); the small side replicates
    * `salts`× so every (key, salt) bucket still finds its match. The hot
    * key's rows spread over `salts` reducers instead of one. Result
    * equals the plain inner join (row multiplicity preserved — the small
    * side must be unique per key, as dimension tables are).
    *
    * This is the STATIC form for when the skew is known up front (the
    * salt is in the layout, e.g. pre-bucketed tables); AQE's runtime
    * skew split (SkewJoinSpec) is the dynamic form.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, keys: Seq[String], salts: Int = 16): DataFrame = {
    val salted = big.withColumn(
      "_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicated = small.withColumn(
      "_salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
