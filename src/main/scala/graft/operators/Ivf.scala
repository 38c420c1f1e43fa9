package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index — the coarse-quantizer scale path for
  * similarity search: k-means centroids partition the corpus into cells;
  * a query scores only the `nprobe` nearest cells instead of the whole
  * corpus.
  *
  * Scale design: the cell count follows the corpus ([[cellsFor]], √N
  * regime) instead of staying a fixed constant; training runs Lloyd's
  * iterations on a bounded sample — driver-side ([[train]], standard IVF
  * practice) or as Spark jobs ([[trainDistributed]]) once k outgrows a
  * single thread. Assignment and search are distributed: the centroid
  * matrix rides inside one [[graft.functions.NearestCells]] kernel per
  * row (constant plan size in k — no shuffle, no broadcast table). Cell
  * assignment keys the only shuffle; probing multiplies the query side by
  * `nprobe`, never the corpus.
  */
object Ivf {

  /** Deterministic spherical k-means (cosine distance) on a driver-side
    * sample. Returns `k` L2-normalized centroids, all NONZERO — zero
    * vectors are excluded from the sample and a cell whose component sum
    * cancels exactly resamples like an empty cell, so downstream
    * [[graft.functions.NearestCells]] parity (which assumes no
    * all-degenerate centroid) holds by construction.
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
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    // zero vectors would survive normalize() unchanged and could seed a
    // zero centroid (NaN sims for every row) — drop them up front
    val pts = sample.map(normalize).filter(_.exists(_ != 0.0))
    require(pts.nonEmpty, "empty training sample (after dropping zero vectors)")
    val dim = pts.head.length
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
        // exact cancellation of a non-empty cell's sum is as degenerate as
        // an empty cell (normalize would pass the zero vector through) —
        // resample it the same way
        val nv = if (counts(c) == 0) null else normalize(sums(c))
        if (nv == null || nv.forall(_ == 0.0)) pts(rnd.nextInt(pts.length)).clone()
        else nv
      }
    }
    centroids
  }

  /** Distributed spherical k-means: the trainer for cell counts beyond
    * the driver loop's reach. `train` collects a sample and runs Lloyd's
    * on the driver — standard IVF practice, but its cost is
    * O(sample·k·iters·dim) single-threaded, which stops being viable
    * around the k a 100 TB corpus wants (`cellsFor(10^10) ≈ 6.3k` cells
    * → ~10^12 driver flops). Here every Lloyd step is a Spark job:
    *
    *  - **assignment** is one [[graft.functions.NearestCells]] kernel per
    *    row (constant plan size in k — the reason this trainer can exist);
    *  - **centroid update** is posexplode → hash-agg over INTEGER-quantized
    *    components (`floor(x·10^6)` sums commute, so the result is
    *    order-free across partitions → bit-deterministic run to run, where
    *    raw double sums are not) → per-cell array rebuild;
    *  - only `k` centroid rows (k·dim doubles) reach the driver, once per
    *    iteration. The training sample is bounded (`sampleN`, default
    *    64·k) and taken in deterministic xxhash64 order.
    *
    * Empty cells keep their previous centroid. Returns `k` L2-normalized
    * centroids, same contract as [[train]].
    */
  def trainDistributed(
      embs: DataFrame, vecCol: String, k: Int,
      iters: Int = 10, sampleN: Int = 0): Array[Array[Double]] = {
    val n = if (sampleN > 0) sampleN else 64 * k
    // normalized double vectors, deterministically sampled by hash order
    // (ties broken by the vector itself so duplicates are interchangeable)
    val norm = expr(s"sqrt(aggregate($vecCol, 0D, (a, x) -> a + double(x) * double(x)))")
    val sample = embs
      .filter(col(vecCol).isNotNull && size(col(vecCol)) > 0 && norm > 0)
      .select(expr(s"transform($vecCol, x -> double(x) / " +
        s"sqrt(aggregate($vecCol, 0D, (a, x) -> a + double(x) * double(x))))").as("v"))
      .orderBy(xxhash64(col("v")), col("v")).limit(n)
      .persist()
    try {
      // heterogeneous dims would otherwise surface later as an opaque
      // NearestCells require failure — validate the sample up front
      val dims = sample.select(size(col("v")).as("d")).distinct().limit(2).collect()
      require(dims.length == 1, s"sampled vectors have heterogeneous dims: " +
        dims.map(_.getInt(0)).sorted.mkString(", "))
      // exact-duplicate vectors sort adjacently in the hash order (ties
      // break by the vector itself), so seeding from the raw first k rows
      // would likely duplicate initial centroids on duplicate-heavy
      // corpora — and a duplicated cell loses every assignment tie to the
      // lower cid, stays empty, and is pinned dead by the empty-cell
      // keep-previous rule. Seed from DISTINCT vectors, re-sorted for
      // determinism (dropDuplicates does not preserve order).
      var cents: Array[Array[Double]] = sample.dropDuplicates("v")
        .orderBy(xxhash64(col("v")), col("v")).limit(k)
        .collect().map(_.getSeq[Double](0).toArray)
      require(cents.length == k,
        s"sample has only ${cents.length} distinct usable vectors for k=$k centroids")
      for (_ <- 1 to iters) {
        val assigned = sample.select(col("v"),
          cellId(col("v"), cents).as("cid"))
        val updated: Map[Int, Array[Double]] = assigned
          .select(col("cid"), posexplode(col("v")))
          .select(col("cid"), col("pos"),
            floor(col("col") * lit(1000000.0)).cast("long").as("xi"))
          .groupBy("cid", "pos")
          .agg(sum("xi").as("sx"), count(lit(1)).as("cnt"))
          .select(col("cid"), col("pos"),
            (col("sx").cast("double") /
              (col("cnt").cast("double") * lit(1000000.0))).as("cv"))
          .groupBy("cid")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
            x => x.getField("cv")).as("cvec"))
          .collect()
          .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
        cents = Array.tabulate(k) { c =>
          updated.get(c) match {
            case Some(m) =>
              val nn = math.sqrt(m.map(x => x * x).sum)
              if (nn == 0) cents(c) else m.map(_ / nn)
            case None => cents(c) // empty cell: keep previous centroid
          }
        }
      }
      cents
    } finally sample.unpersist(blocking = false)
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

  /** Sharded ANN serve — the no-merge families' answer to a sharded
    * corpus (IVF/PQ logs keep only assignments/codes under frozen
    * per-shard geometry, so two shards can't reconcile into one index
    * without re-encoding; production systems don't merge them either —
    * they SERVE sharded). Each shard searches itself under its OWN
    * centroids — zero cross-shard traffic, the per-query fan-out is a
    * broadcast of the (tiny) query set to every shard — and the global
    * answer re-ranks the union of per-shard top-k lists: k·shards rows
    * per query, never corpus-sized. EXACT relative to the per-shard
    * searches: any global top-k neighbor ranks ≤ k inside its own
    * shard (within-shard rank never exceeds global rank), so it
    * survives the per-shard cut — with exhaustive probes (nprobe =
    * shard cells) the result equals brute force over the union, which
    * is what the e26 gate pins. Shards are (corpus, centroids, nprobe)
    * triples; ids must be disjoint across shards.
    */
  def shardedTopK(
      shards: Seq[(DataFrame, Array[Array[Double]], Int)],
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      qIdCol: String = "query_id"): DataFrame = {
    require(shards.nonEmpty, "shardedTopK needs at least one shard")
    val per = shards.map { case (corpus, cents, np) =>
      topK(corpus, queries, idCol, vecCol, k, cents, np, qIdCol).drop("rank")
    }.reduce(_.unionAll(_))
    val w = Window.partitionBy(qIdCol).orderBy(col("sim").desc, col("neighbor_id"))
    per.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Centroid-routed sharded serve — bounding [[shardedTopK]]'s
    * O(shards)-per-query probe term: every query there pays a probe in
    * EVERY shard for k answers, which at 1000 shards is 1000 probes of
    * which ≥ 992 contribute nothing past the re-rank. Here a query
    * probes only the `mShards` shards ranked best by the ROUTING signal
    * — the maximum cosine any of a shard's frozen centroids achieves
    * against the query, i.e. the same quantity IVF probing uses one
    * level down, lifted to the shard level and computed from metadata
    * the serve topology already holds (no extra state, no training).
    *
    * Mechanics: all shards' centroids stack into ONE combined
    * [[graft.functions.NearestCells]] kernel (constant plan size), the
    * top `maxCells·(mShards−1)+1` combined cells per query guarantee —
    * pigeonhole, since one shard owns at most `maxCells` of them — that
    * ≥ `mShards` distinct shards appear; shard rank is first-occurrence
    * order in that similarity-sorted list, which IS best-centroid-cosine
    * order (ties toward the lower shard index via the combined cell id).
    * Each shard then searches only the queries routed to it.
    *
    * At `mShards = shards.size` the pigeonhole bound reaches every
    * shard, so the result equals [[shardedTopK]] EXACTLY — the e29
    * gate; the router path still executes, nothing is special-cased.
    * Below that, recall is the measured dial (the nprobe analogy one
    * level up — the SCALE "serve" scope's curve over m). At combined
    * centroid counts where the router kernel itself gets heavy
    * (≳10^6 cells), the same trick applies recursively: cluster the
    * combined centroids and route through a two-level kernel — shard
    * metadata, so re-clustering never touches corpus data.
    */
  def routedShardedTopK(
      shards: Seq[(DataFrame, Array[Array[Double]], Int)],
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      mShards: Int, qIdCol: String = "query_id"): DataFrame = {
    require(shards.nonEmpty, "routedShardedTopK needs at least one shard")
    require(mShards >= 1 && mShards <= shards.size,
      s"mShards must be in [1, ${shards.size}], got $mShards")
    val spark = queries.sparkSession
    val cells = shards.map(_._2)
    val total = cells.map(_.length).sum
    val maxCells = cells.map(_.length).max
    val bound = math.min(total, maxCells * (mShards - 1) + 1)
    val combined: Array[Array[Double]] = cells.flatten.toArray
    // combined cell id -> owning shard, broadcast-joined (a literal-array
    // lookup would grow the plan with the total cell count)
    val cellShard = spark.createDataFrame(
      cells.zipWithIndex.flatMap { case (cs, si) => cs.indices.map(_ => si) }
        .zipWithIndex.map { case (si, cid) => (cid, si) })
      .toDF("rcell", "shard")
    val ranked = queries
      .select(col(idCol).as(qIdCol),
        posexplode(probeCells(col(vecCol), combined, bound)).as(Seq("pos", "rcell")))
      .join(broadcast(cellShard), "rcell")
      .groupBy(col(qIdCol), col("shard"))
      .agg(min(col("pos")).as("firstPos"))
    val w0 = Window.partitionBy(qIdCol).orderBy(col("firstPos"), col("shard"))
    val routed = ranked.withColumn("srank", row_number().over(w0))
      .filter(col("srank") <= mShards)
      .select(col(qIdCol), col("shard"))
      .persist()
    try {
      routed.count()
      val per = shards.zipWithIndex.map { case ((corpus, cents, np), si) =>
        val routedQ = queries.join(
          broadcast(routed.filter(col("shard") === si)
            .select(col(qIdCol).as(idCol))), idCol)
        topK(corpus, routedQ, idCol, vecCol, k, cents, np, qIdCol).drop("rank")
      }.reduce(_.unionAll(_))
      val w = Window.partitionBy(qIdCol).orderBy(col("sim").desc, col("neighbor_id"))
      val out = per.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k).persist()
      out.count()
      out
    } finally routed.unpersist(blocking = false)
  }
}
