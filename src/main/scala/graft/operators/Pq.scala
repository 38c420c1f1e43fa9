package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN — the compressed-scan scale path for
  * similarity search (complements Ivf's cell pruning): the corpus is
  * encoded ONCE into `m` small ints per vector (8 codes ≈ 8 bytes vs 256
  * bytes of floats), queries scan the code table with per-query ADC
  * lookup tables, and only the top-`candidates` per query are re-ranked
  * with exact cosine over the real vectors.
  *
  * Scale design mirrors the repo's exchange discipline:
  *  - the ADC scan joins CODES against a broadcast query side — raw
  *    vectors never enter the scan;
  *  - the top-`candidates` prune is a row_number window (WindowGroupLimit
  *    prunes map-side) over (ids, adist) rows only;
  *  - exact vectors are fetched per candidate via map-side prune +
  *    broadcast (never a hash-partition exchange of arrays).
  *
  * Training is driver-side Lloyd's per subspace on a bounded sample
  * (standard PQ practice, same rationale as [[Ivf.train]]).
  */
object Pq {

  /** Train `m` codebooks of `ksub` centroids on L2-normalized sample
    * subvectors; returned flattened (codebook-major) for the expressions.
    */
  def train(
      embs: DataFrame, vecCol: String, dim: Int, m: Int = 8, ksub: Int = 16,
      iters: Int = 10, seed: Long = 19L, sampleSize: Int = 4096): Seq[Double] = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val dsub = dim / m
    // null vectors are search-safe (null codes / null sims) but would NPE
    // the trainer — exclude them from the sample
    val sample: Array[Array[Double]] = embs.select(col(vecCol))
      .filter(col(vecCol).isNotNull).limit(sampleSize)
      .collect().map(_.getSeq[Any](0).toArray.map {
        case f: Float  => f.toDouble
        case d: Double => d
        case other     => other.toString.toDouble
      })
    require(sample.nonEmpty, "empty training sample")
    val pts = sample.map { v =>
      val out = java.util.Arrays.copyOf(v, dim)
      val n = math.sqrt(out.map(x => x * x).sum)
      if (n > 0) { var i = 0; while (i < dim) { out(i) /= n; i += 1 } }
      out
    }
    val rnd = new scala.util.Random(seed)
    val books = new Array[Double](m * ksub * dsub)
    for (s <- 0 until m) {
      val sub = pts.map(p => java.util.Arrays.copyOfRange(p, s * dsub, (s + 1) * dsub))
      var cents = Array.fill(ksub)(sub(rnd.nextInt(sub.length)).clone())
      for (_ <- 1 to iters) {
        val sums = Array.fill(ksub)(new Array[Double](dsub))
        val counts = new Array[Int](ksub)
        sub.foreach { p =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < ksub) {
            var d2 = 0.0; var i = 0
            while (i < dsub) { val df = p(i) - cents(c)(i); d2 += df * df; i += 1 }
            if (d2 < bestD) { bestD = d2; best = c }
            c += 1
          }
          var i = 0
          while (i < dsub) { sums(best)(i) += p(i); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(ksub) { c =>
          if (counts(c) == 0) sub(rnd.nextInt(sub.length)).clone()
          else sums(c).map(_ / counts(c))
        }
      }
      for (c <- 0 until ksub; i <- 0 until dsub)
        books((s * ksub + c) * dsub + i) = cents(c)(i)
    }
    books.toSeq
  }

  /** PQ codes column for a vector column. */
  def encode(vec: Column, books: Seq[Double], m: Int, ksub: Int, dsub: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.PqEncode(
      ColumnBridge.expression(vec), books, m, ksub, dsub))
  }

  /** ADC lookup-table column for a query vector column. */
  def adcTable(vec: Column, books: Seq[Double], m: Int, ksub: Int, dsub: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.PqAdcTable(
      ColumnBridge.expression(vec), books, m, ksub, dsub))
  }

  /** ADC distance column: sum of the `m` per-subspace table lookups for a
    * codes column — plain codegen'd `element_at` composition.
    */
  def adcScore(codes: Column, tbl: Column, m: Int, ksub: Int): Column =
    (0 until m).map(s =>
        element_at(tbl, element_at(codes, s + 1) + lit(s * ksub) + 1))
      .reduce(_ + _)

  /** Shared tail of every PQ search: top-`candidates` per query by ADC
    * distance (WindowGroupLimit prunes map-side; (ids, adist) rows only),
    * then exact-cosine re-rank with vectors fetched map-side + broadcast.
    */
  private def pruneAndRerank(
      scored: DataFrame, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, candidates: Int,
      qIdCol: String): DataFrame = {
    val wAdc = Window.partitionBy(qIdCol).orderBy(col("adist"), col("neighbor_id"))
    // ascending sort is NULLS FIRST: null-vector corpus rows (null codes →
    // null adist) would otherwise outrank every real candidate and eat the
    // whole candidate budget
    val cand = scored.filter(col("adist").isNotNull)
      .withColumn("crank", row_number().over(wAdc))
      .filter(col("crank") <= candidates)
      .select(col(qIdCol), col("neighbor_id"))
    val cvecs = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .join(broadcast(cand.select("neighbor_id").distinct()), "neighbor_id")
    val qvecs = queries.select(col(idCol).as(qIdCol), col(vecCol).as("qvec"))
    val exact = cand.join(broadcast(qvecs), qIdCol)
      .join(broadcast(cvecs), "neighbor_id")
      .select(col(qIdCol), col("neighbor_id"),
        Dedup.cosine(col("qvec"), col("cvec")).as("sim"))
    val w = Window.partitionBy(qIdCol).orderBy(col("sim").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** PQ ANN top-k: ADC scan over codes → top-`candidates` per query →
    * exact-cosine re-rank. With `candidates` ≥ corpus size the result
    * equals brute force exactly (the e7 oracle); small `candidates` is
    * the approximate fast path (recall spec-pinned).
    */
  def topK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      books: Seq[Double], m: Int, ksub: Int, dsub: Int,
      candidates: Int,
      qIdCol: String = "query_id"): DataFrame =
    topKFromCodes(
      corpus.select(col(idCol).as("neighbor_id"),
        encode(col(vecCol), books, m, ksub, dsub).as("codes")),
      corpus, queries, idCol, vecCol, k, books, m, ksub, dsub,
      candidates, qIdCol)

  /** [[topK]] over an already-encoded (neighbor_id, codes) table — the
    * entry point for a PERSISTED code index
    * ([[graft.operators.IncrementalIndex.pqTopKIndexed]]): the ADC scan
    * reads stored codes, so a search never re-encodes the corpus.
    */
  def topKFromCodes(
      codes: DataFrame, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      books: Seq[Double], m: Int, ksub: Int, dsub: Int,
      candidates: Int,
      qIdCol: String = "query_id"): DataFrame = {
    val qside = broadcast(queries.select(col(idCol).as(qIdCol),
      adcTable(col(vecCol), books, m, ksub, dsub).as("tbl")))
    // compressed linear scan: every (query, code-row) pair, scored by m
    // codegen'd element_at lookups — deliberately a broadcast nested-loop
    // (the scan IS the operator; the whole point is that it touches 8-byte
    // codes, not 256-byte vectors)
    val scored = codes.join(qside)
      .filter(col(qIdCol) =!= col("neighbor_id"))
      .select(col(qIdCol), col("neighbor_id"),
        adcScore(col("codes"), col("tbl"), m, ksub).as("adist"))
    pruneAndRerank(scored, corpus, queries, idCol, vecCol, k, candidates, qIdCol)
  }

  /** IVF-PQ ANN top-k — the composed production index (coarse cells prune
    * the corpus, PQ codes compress what remains): the corpus carries
    * (cell, codes) only; a query probes its `nprobe` best cells and the
    * ADC scan becomes an EQUI-join on cell id (no nested loop at all).
    * With `nprobe` = all cells and `candidates` ≥ corpus size the result
    * equals brute force exactly (the e9 oracle).
    */
  def ivfPqTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: Array[Array[Double]],
      books: Seq[Double], m: Int, ksub: Int, dsub: Int,
      nprobe: Int, candidates: Int,
      qIdCol: String = "query_id"): DataFrame = {
    val assigned = corpus.select(col(idCol).as("neighbor_id"),
      Ivf.cellId(col(vecCol), centroids).as("cid"),
      encode(col(vecCol), books, m, ksub, dsub).as("codes"))
    val qside = broadcast(queries.select(col(idCol).as(qIdCol),
        explode(Ivf.probeCells(col(vecCol), centroids, nprobe)).as("cid"),
        adcTable(col(vecCol), books, m, ksub, dsub).as("tbl")))
    val scored = assigned.join(qside, "cid")
      .filter(col(qIdCol) =!= col("neighbor_id"))
      .select(col(qIdCol), col("neighbor_id"),
        adcScore(col("codes"), col("tbl"), m, ksub).as("adist"))
    pruneAndRerank(scored, corpus, queries, idCol, vecCol, k, candidates, qIdCol)
  }
}
