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

  /** Bits per SRP table for a corpus of `n` vectors so expected bucket
    * occupancy stays ~`targetOccupancy` (buckets ∝ n — the LSH analog of
    * SemDeDup's k ∝ N rule). With FIXED bits, occupancy grows linearly
    * and within-bucket candidate pairs grow QUADRATICALLY with the
    * corpus (the r6 rehearsal measured e3 at 55x for 10x data on 8 fixed
    * bits). Floor of 8 keeps small fixtures on the historical geometry;
    * each extra bit costs recall only ~angle/π per table per bit, and
    * multiple tables absorb it.
    */
  def srpBitsFor(n: Long, targetOccupancy: Int = 16, floor: Int = 8): Int = {
    val buckets = math.max(1.0, n.toDouble / targetOccupancy)
    math.max(floor, math.ceil(math.log(buckets) / math.log(2)).toInt)
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

  /** Integer-quantized 6-dp cosine: round to 6 dp, scale to an exact
    * BIGINT. Downstream max/sum/rank over these are partitioning- and
    * engine-independent (the d46/e12 rule applied to similarities).
    */
  private def simInt(a: Column, b: Column): Column =
    round(round(Dedup.cosine(a, b), 6) * lit(1000000.0)).cast("long")

  /** ColBERT-style MaxSim late interaction (Khattab & Zaharia 2020,
    * arXiv:2004.12832): multi-vector queries against multi-vector
    * documents, score(q, d) = Σ_{qt∈q} max_{dt∈d} cos(qt, dt).
    *
    * `queryTokens` (qid, qtok, qv) broadcasts — the corpus token scan
    * scores map-side, and the per-(query, token, doc) max plus the
    * per-(query, doc) sum are hash aggregates over (ids, ints) ONLY:
    * token vectors never enter an exchange. Similarities are
    * integer-quantized before max/sum, so the ranking is exact.
    */
  def maxSimTopK(
      docTokens: DataFrame, queryTokens: DataFrame, k: Int): DataFrame = {
    val scored = docTokens
      .crossJoin(broadcast(queryTokens))
      .select(col("qid"), col("qtok"), col("did"),
        simInt(col("qv"), col("dv")).as("si"))
      .groupBy("qid", "qtok", "did").agg(max(col("si")).as("mx"))
      .groupBy("qid", "did").agg(sum(col("mx")).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("did"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("int").as("rnk"), col("did"), col("score"))
  }

  /** Matryoshka two-stage ANN (Kusupati et al. 2022, arXiv:2205.13147):
    * shortlist by cosine over the FIRST `prefixDim` dimensions (MRL
    * embeddings front-load information, so the prefix is a cheap coarse
    * scorer at 1/4 the FLOPs and bytes), then exact full-dim re-rank of
    * the shortlist. Both stages are integer-quantized, so shortlist
    * membership and final ranks are deterministic — unlike float ANN,
    * the whole operator is exactly checkable cross-engine.
    *
    * Scale shape: prefix scoring is map-side against broadcast queries
    * (only (qid, nid, score) ints reach the rank shuffle); re-rank
    * fetches candidate vectors via map-side prune + broadcast of the
    * tiny shortlist id set — full vectors never ride an exchange.
    */
  def matryoshkaTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      prefixDim: Int, shortlist: Int, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), slice(col(vecCol), 1, prefixDim).as("qp")))
    val cands = corpus
      .select(col(idCol).as("neighbor_id"), slice(col(vecCol), 1, prefixDim).as("cp"))
      .join(q.select(col("query_id"), col("qp")), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), simInt(col("qp"), col("cp")).as("ps"))
    val w1 = Window.partitionBy("query_id").orderBy(col("ps").desc, col("neighbor_id"))
    val short = cands.withColumn("prnk", row_number().over(w1))
      .filter(col("prnk") <= shortlist).select("query_id", "neighbor_id")
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(broadcast(short.select("neighbor_id").distinct()), "neighbor_id")
    val rer = short.join(broadcast(cv), "neighbor_id")
      .join(q.select(col("query_id"), col("qv")), "query_id")
      .select(col("query_id"), col("neighbor_id"), simInt(col("qv"), col("cv")).as("fs"))
    val w2 = Window.partitionBy("query_id").orderBy(col("fs").desc, col("neighbor_id"))
    rer.withColumn("rnk", row_number().over(w2)).filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("int").as("rnk"),
        col("neighbor_id"), col("fs"))
  }
}
