package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column (north-star surface).
  *
  * Scale design:
  *  - brute-force top-k BROADCASTS the (small) query set against the
  *    (huge) corpus — the corpus streams through map-side only, no
  *    shuffle of vectors; the only shuffled data is (query_id, corpus_id,
  *    sim) for the per-query top-k window, and even that is pre-pruned
  *    map-side by a per-partition top-k aggregate.
  *  - the LSH variant buckets both sides by random-hyperplane sign
  *    signatures: candidate generation touches only colliding buckets,
  *    then the exact cosine re-ranks. Hyperplanes are driver-generated
  *    from a fixed seed and inlined as literals — no state, no shuffle.
  */
object Similarity {

  /** Exact per-query top-k by cosine. `queries` should be small (it is
    * broadcast); ties broken by corpus id for determinism.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      qIdCol: String = "query_id"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as(qIdCol), col(vecCol).as("qvec")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .join(q, col(qIdCol) =!= col("neighbor_id")) // exclude self-match
      .select(col(qIdCol), col("neighbor_id"), Dedup.cosine(col("qvec"), col("cvec")).as("sim"))
    val w = Window.partitionBy(qIdCol).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic random hyperplanes: `numBits` vectors of dimension
    * `dim`, components in {-1, 1} (seeded). Inlined as literal arrays.
    */
  private[operators] def hyperplanes(numBits: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numBits)(Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** Sign-random-projection signature: one bucket id per hash table, each
    * from `bitsPerTable` hyperplane sign bits. Returns an
    * `array<bigint>` Column of length `numTables`. Backed by the
    * single-pass [[graft.functions.SrpSignature]] expression (one
    * primitive loop per row instead of `numTables × bitsPerTable`
    * interpreted HOF dot products).
    */
  def srpSignature(
      vec: Column, dim: Int, numTables: Int, bitsPerTable: Int, seed: Long = 7L): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.SrpSignature(
      ColumnBridge.expression(vec), dim, numTables, bitsPerTable, seed))
  }

  /** ANN top-k: SRP-LSH candidate generation (same bucket in ANY table)
    * + exact cosine re-rank. Recall < 1 by construction; raise
    * `numTables` / lower `bitsPerTable` to trade cost for recall.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int,
      numTables: Int = 8, bitsPerTable: Int = 12,
      qIdCol: String = "query_id"): DataFrame = {
    def withBuckets(df: DataFrame, id: String, vecAs: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vecAs),
          posexplode(srpSignature(col(vecCol), dim, numTables, bitsPerTable)))
        .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
    val qb = broadcast(withBuckets(queries, qIdCol, "qvec"))
    val cb = withBuckets(corpus, "neighbor_id", "cvec")
    // Cosine is computed MAP-SIDE on the bucket join output (vectors never
    // enter an exchange); a pair colliding in several tables is deduplicated
    // by the ids-only groupBy — the sole shuffle carries (qid, nid, sim).
    // Re-scoring a duplicate collision (≤ numTables×) is far cheaper at
    // scale than shuffling corpus vectors through a distinct or a re-join.
    val scored = cb.join(qb,
        Seq("table", "bucket")) // bucket-local join, map-side via broadcast
      .filter(col(qIdCol) =!= col("neighbor_id"))
      .select(col(qIdCol), col("neighbor_id"), Dedup.cosine(col("qvec"), col("cvec")).as("sim"))
      .groupBy(col(qIdCol), col("neighbor_id")).agg(max(col("sim")).as("sim"))
    val w = Window.partitionBy(qIdCol).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
