package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

import graft.operators.{Dedup, Ivf, Similarity}

/** Pins the [[graft.functions.NearestCells]] kernel that backs IVF cell
  * assignment and probing, and the `cellsFor` √N cell-count rule.
  *
  * The kernel replaced a per-centroid Column formulation whose plan grew
  * with k (capping the cell count an index could use); the contract is
  * BIT-parity with that formulation — same cosine accumulation, same
  * (-sim, cid) tie order, same first-max-wins argmax — so the swap is
  * invisible to the oracle-gated queries at the historical k=16.
  */
class IvfCellsSpec extends SparkSpec {

  private lazy val embs = spark.read.parquet(sf("embeddings"))

  /** The retired Column formulation, reconstructed as the reference. */
  private def columnCellId(vec: Column, centroids: Array[Array[Double]]): Column = {
    val sims = array(centroids.toSeq.map(c => Dedup.cosine(vec, typedlit(c.toSeq))): _*)
    (array_position(sims, array_max(sims)) - 1).cast("int")
  }
  private def columnProbeCells(
      vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    val sims = centroids.toSeq.map(c => Dedup.cosine(vec, typedlit(c.toSeq)))
    val pairs = array(sims.zipWithIndex.map { case (s, i) =>
      struct((-s).as("negsim"), lit(i).as("cid"))
    }: _*)
    slice(array_sort(pairs), 1, nprobe).getField("cid")
  }

  test("NearestCells cell assignment is bit-identical to the Column formulation") {
    val centroids = Ivf.train(embs, "embedding", k = 16)
    val both = embs.select(col("vec_id"),
      Ivf.cellId(col("embedding"), centroids).as("kernel"),
      columnCellId(col("embedding"), centroids).as("reference"))
    assert(both.filter(col("kernel") =!= col("reference")).count() == 0)
  }

  test("NearestCells probe ranking is bit-identical to the Column formulation") {
    val centroids = Ivf.train(embs, "embedding", k = 16)
    for (nprobe <- Seq(1, 4, 16)) {
      val both = embs.select(
        Ivf.probeCells(col("embedding"), centroids, nprobe).as("kernel"),
        columnProbeCells(col("embedding"), centroids, nprobe).as("reference"))
      assert(both.filter(not(col("kernel") <=> col("reference"))).count() == 0,
        s"probe mismatch at nprobe=$nprobe")
    }
  }

  test("NearestCells matches on double input and breaks exact ties toward the lowest cid") {
    // two identical centroids: every vector ties between cells 0 and 1
    val dup = Array(Array.fill(4)(0.5), Array.fill(4)(0.5), Array(1.0, 0.0, 0.0, -1.0))
    val df = spark.range(8).select(col("id"),
      // seed per component: identically-seeded rand expressions evaluate
      // to the SAME value per row, which would make every vector a
      // multiple of (1,1,1,1) and gut the parity coverage
      array((0 until 4).map(i => (rand(seed = 5 + i) * 2 - 1)): _*).as("v"))
    val got = df.select(
      Ivf.cellId(col("v"), dup).as("kernel"),
      columnCellId(col("v"), dup).as("reference"),
      Ivf.probeCells(col("v"), dup, 2).as("pk"),
      columnProbeCells(col("v"), dup, 2).as("pr"))
    assert(got.filter(col("kernel") =!= col("reference")).count() == 0)
    assert(got.filter(not(col("pk") <=> col("pr"))).count() == 0)
    // the duplicate-centroid tie resolves to cell 0, never 1
    assert(got.filter(col("kernel") === 1).count() == 0)
  }

  test("NearestCells matches the Column formulation on zero vectors (NaN similarity)") {
    // a zero vector scores NaN against every centroid; Spark's double
    // ordering puts NaN greatest, so argmax resolves to cell 0 and probe
    // order degenerates to cid order — the kernel must agree exactly
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, 0.0))
    val df = spark.sql(
      "SELECT * FROM VALUES (array(0D, 0D)), (array(1D, 1D)), (array(-3D, 4D)) AS t(v)")
    val got = df.select(
      Ivf.cellId(col("v"), cents).as("kernel"),
      columnCellId(col("v"), cents).as("reference"),
      Ivf.probeCells(col("v"), cents, 3).as("pk"),
      columnProbeCells(col("v"), cents, 3).as("pr"))
    assert(got.filter(col("kernel") =!= col("reference")).count() == 0)
    assert(got.filter(not(col("pk") <=> col("pr"))).count() == 0)
  }

  test("cellsFor: gate SFs stay on the historical 16; larger corpora engage sqrt(N)") {
    assert(Ivf.cellsFor(600L) == 16)      // sf0.001
    assert(Ivf.cellsFor(6000L) == 16)     // sf0.01
    assert(Ivf.cellsFor(60000L) == 16)    // sf0.1
    assert(Ivf.cellsFor(600000L) == 49)   // 10x rehearsal
    assert(Ivf.cellsFor(60000000L) == 485)
  }

  test("trainDistributed: deterministic, normalized, and a better fit than its init") {
    val k = 20
    val run1 = Ivf.trainDistributed(embs, "embedding", k, iters = 5)
    val run2 = Ivf.trainDistributed(embs, "embedding", k, iters = 5)
    assert(run1.length == k)
    // integer-quantized order-free sums => bit-identical run to run
    assert(run1.zip(run2).forall { case (a, b) => a.sameElements(b) })
    assert(run1.forall(c => math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9))
    // Lloyd improves fit: mean best-similarity under trained centroids
    // beats the 0-iteration init (first k sample vectors)
    val init = Ivf.trainDistributed(embs, "embedding", k, iters = 0)
    def meanBestSim(cents: Array[Array[Double]]): Double = {
      val sims = cents.toSeq.map(c => Dedup.cosine(col("embedding"), typedlit(c.toSeq)))
      embs.select(array_max(array(sims: _*)).as("s"))
        .agg(avg("s")).head().getDouble(0)
    }
    assert(meanBestSim(run1) > meanBestSim(init),
      "training must improve mean best-centroid similarity over the init")
  }

  test("trainDistributed centroids drive a correct full-probe index") {
    val cells = 20
    val centroids = Ivf.trainDistributed(embs, "embedding", cells, iters = 3)
    val brute = Similarity.bruteForceTopK(embs, embs.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)](
        org.apache.spark.sql.Encoders.product[(Long, Long)]).collect().toSet
    val full = Ivf.topK(embs, embs.filter(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, centroids, nprobe = cells)
      .select("query_id", "neighbor_id").as[(Long, Long)](
        org.apache.spark.sql.Encoders.product[(Long, Long)]).collect().toSet
    assert(full == brute)
  }

  test("full probe equals brute force at an engaged cell count (k > 16)") {
    val cells = 25
    val centroids = Ivf.train(embs, "embedding", k = cells,
      sampleSize = math.max(4096, 8 * cells))
    val brute = Similarity.bruteForceTopK(embs, embs.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)](
        org.apache.spark.sql.Encoders.product[(Long, Long)]).collect().toSet
    val full = Ivf.topK(embs, embs.filter(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, centroids, nprobe = cells)
      .select("query_id", "neighbor_id").as[(Long, Long)](
        org.apache.spark.sql.Encoders.product[(Long, Long)]).collect().toSet
    assert(full == brute, "full probe must equal brute force at any cell count")
  }

  test("routed sharded serve: m=shards equals exhaustive serve, m=1 routes to the right cluster") {
    import org.apache.spark.sql.Encoders
    // exhaustive-equality leg on the real embeddings, two parity shards
    val queries = embs.filter(col("vec_id") < 8)
    val shards = Seq(0, 1).map { i =>
      val part = embs.filter(col("vec_id") % 2 === i)
      val cells = Ivf.cellsFor(part.count())
      (part, Ivf.train(part, "embedding", k = cells,
        sampleSize = math.max(4096, 8 * cells)), cells)
    }
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)](Encoders.product[(Long, Long, Int)])
        .collect().toSet
    val exhaustive = Ivf.shardedTopK(shards, queries, "vec_id", "embedding", k = 5)
    val routedAll = Ivf.routedShardedTopK(shards, queries, "vec_id", "embedding",
      k = 5, mShards = shards.size)
    assert(rows(routedAll) == rows(exhaustive),
      "at m = shards the router must reach every shard and equal the exhaustive serve")
    routedAll.unpersist(blocking = false)
    // routing leg: two well-separated clusters, one per shard — a query
    // inside cluster A at m=1 must probe ONLY shard A (its answers all
    // come from A's id range)
    import spark.implicits._
    def cluster(base: Double, ids: Range) = ids.map { i =>
      (i.toLong, Array(base + 0.001 * i, 1.0 - base, 0.1, 0.2))
    }
    val shardA = cluster(0.9, 0 until 40).toDF("vec_id", "embedding")
    val shardB = cluster(-0.9, 100 until 140).toDF("vec_id", "embedding")
    val sA = (shardA, Ivf.train(shardA, "embedding", k = 4), 4)
    val sB = (shardB, Ivf.train(shardB, "embedding", k = 4), 4)
    val q = Seq((9999L, Array(0.91, 0.1, 0.1, 0.2))).toDF("vec_id", "embedding")
    val one = Ivf.routedShardedTopK(Seq(sA, sB), q, "vec_id", "embedding",
      k = 3, mShards = 1)
    val got = rows(one)
    one.unpersist(blocking = false)
    assert(got.map(_._1) == Set(9999L) && got.size == 3 &&
      got.forall(_._2 < 100),
      s"an in-cluster query at m=1 must be answered entirely by its own shard, got $got")
  }
}
