package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index — the coarse-quantizer scale path for
  * similarity search: k-means centroids partition the corpus into cells;
  * a query scores only the `nprobe` nearest cells instead of the whole
  * corpus.
  *
  * Scale design: training runs Lloyd's iterations on a bounded driver-side
  * SAMPLE (standard IVF practice — centroids need thousands of points, not
  * the corpus); assignment and search are distributed, with the centroid
  * matrix inlined as literals (no shuffle, no broadcast table). Cell
  * assignment keys the only shuffle; probing multiplies the query side by
  * `nprobe`, never the corpus.
  */
object Ivf {

  /** Deterministic spherical k-means (cosine distance) on a driver-side
    * sample. Returns `k` L2-normalized centroids.
    */
  def train(
      embs: DataFrame, vecCol: String, k: Int,
      iters: Int = 10, seed: Long = 11L, sampleSize: Int = 4096): Array[Array[Double]] = {
    // exclude null vectors: search tolerates them, the trainer would NPE
    val sample: Array[Array[Double]] = embs.select(col(vecCol))
      .filter(col(vecCol).isNotNull).limit(sampleSize)
      .collect().map(_.getSeq[Any](0).toArray.map {
        case f: Float  => f.toDouble
        case d: Double => d
        case other     => other.toString.toDouble
      })
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val pts = sample.map(normalize)
    val rnd = new scala.util.Random(seed)
    var centroids = Array.fill(k)(pts(rnd.nextInt(pts.length)).clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      pts.foreach { p =>
        var best = 0; var bestDot = Double.MinValue
        var c = 0
        while (c < k) {
          var dot = 0.0; var i = 0
          while (i < dim) { dot += p(i) * centroids(c)(i); i += 1 }
          if (dot > bestDot) { bestDot = dot; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) pts(rnd.nextInt(pts.length)).clone()
        else normalize(sums(c))
      }
    }
    centroids
  }

  /** Cell count for a corpus of `n` vectors: the FAISS `nlist ≈ √N`
    * regime, calibrated so the historical k=16 covers corpora up to
    * ~65k vectors (`ceil(√(n/256))` — gate/bench SFs land on 16, a 10×
    * rehearsal corpus engages ~49, a 10^10-vector corpus ~6.3k). With a
    * FIXED cell count, occupancy grows linearly with the corpus and
    * every probe scans `nprobe/k` of ALL vectors; under √N cells a probe
    * scans O(√N) candidates and assignment stays one O(k·dim) kernel per
    * row at constant plan size ([[graft.functions.NearestCells]] — the
    * per-centroid Column formulation grew the plan with k and capped it).
    */
  def cellsFor(n: Long, floor: Int = 16): Int =
    math.max(floor, math.ceil(math.sqrt(n.toDouble / 256.0)).toInt)

  private def nearest(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val dim = centroids.head.length
    ColumnBridge.column(graft.functions.NearestCells(
      ColumnBridge.expression(vec),
      centroids.flatten.toSeq, centroids.length, dim, nprobe))
  }

  /** argmax cell id for a vector (first max wins → lowest cell id). */
  def cellId(vec: Column, centroids: Array[Array[Double]]): Column =
    element_at(nearest(vec, centroids, 1), 1)

  /** Top-`nprobe` cell ids for a query vector (ties by cell id). */
  def probeCells(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    nearest(vec, centroids, nprobe)

  /** IVF ANN top-k: assign the corpus to cells once, probe the `nprobe`
    * best cells per query, exact-cosine re-rank inside the probed cells.
    */
  def topK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: Array[Array[Double]], nprobe: Int = 4,
      qIdCol: String = "query_id"): DataFrame = {
    val assigned = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      cellId(col(vecCol), centroids).as("cid"))
    val probes = broadcast(
      queries.select(col(idCol).as(qIdCol), col(vecCol).as("qvec"),
          explode(probeCells(col(vecCol), centroids, nprobe)).as("cid")))
    val scored = assigned.join(probes, "cid")
      .filter(col(qIdCol) =!= col("neighbor_id"))
      .select(col(qIdCol), col("neighbor_id"),
        Dedup.cosine(col("qvec"), col("cvec")).as("sim"))
    val w = Window.partitionBy(qIdCol).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
