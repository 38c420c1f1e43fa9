package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** One-off cross-engine parity probe: dumps d47's corpus verdicts with an
  * ENGAGED cap (cap=64 chunks every cell) so the DuckDB twin of the
  * chunked oracle can be compared at a SF where the default cap would
  * not engage. Evidence for SCALING.md; not part of the gated registry.
  */
object CapParityCheck {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val out = args(1); val cap = args(2).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val mut = base.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("v"), (x, i) => when(i === 0, x + 0.01).otherwise(x)).as("v"))
    val cents = base.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cvec"))
    Dedup.semDedup(base.union(mut), "vec_id", "v", cents, 0.99, cap = cap)
      .select(col("id").as("vec_id"), col("cid"), col("kept"))
      .coalesce(1).write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
