package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Round-6 occupancy caps: the sorted-neighborhood rank-chunking that
  * hard-bounds the pairwise terms of SemDeDup cells (d47) and SRP-LSH
  * buckets (e3) must (a) reduce EXACTLY to the original semantics when
  * nothing exceeds the cap, (b) lose no near-dup verdicts on the
  * fixture corpus when the cap DOES engage (near-dups rank nearly
  * adjacently along the ordering axis), and (c) keep the greedy
  * lowest-id-wins outcome on the worst case the cap exists for — a
  * mega-clique of identical vectors far larger than the cap.
  */
class SemDedupCapSpec extends SparkSpec {
  import spark.implicits._

  private def embs = spark.read.parquet(sf("embeddings"))

  private def corpus = {
    val base = embs.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val mut = base.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("v"), (x, i) => when(i === 0, x + 0.01).otherwise(x)).as("v"))
    base.union(mut)
  }

  private def cents = embs
    .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    .filter(col("vec_id") < 8)
    .select(col("vec_id").as("cid"), col("v").as("cvec"))

  private def verdicts(cap: Int): Map[Long, (Long, Boolean)] =
    Dedup.semDedup(corpus, "vec_id", "v", cents, threshold = 0.99, cap = cap)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

  test("semDedup cap ≥ cell size reproduces the full-pairwise semantics") {
    // With cells of ≤ n rows, every member is chunk 0 under a huge cap —
    // the bounded join IS the original intra-cell self-join.
    val n = corpus.count().toInt
    val capped = verdicts(cap = 16)
    val full = verdicts(cap = n + 1)
    assert(full.nonEmpty && full.values.exists(!_._2))
    // (b): cap=16 engages hard on this corpus (cells hold ~n/8 rows each)
    // yet every verdict — cell assignment AND keep decision — is identical:
    // original/mutant pairs differ by ~1e-4 in centroid similarity, so the
    // sorted neighborhood always contains the witness.
    assert(capped == full, "engaged cap must not change fixture verdicts")
  }

  test("semDedup keeps exactly the lowest id of an over-cap identical mega-clique") {
    // 600 identical vectors (ids 0..599) + one far-away vector, cap=50:
    // rank ties break by id, so every member except the global lowest id
    // sees a lower-id witness in its own or previous chunk.
    val vec = Array.fill(8)(1.0)
    val other = Array.tabulate(8)(i => if (i % 2 == 0) 1.0 else -1.0)
    val rows = (0L until 600L).map(i => (i, vec)) :+ (999L, other)
    val df = rows.toDF("vec_id", "v")
    val cs = Seq((0L, vec), (1L, other)).toDF("cid", "cvec")
    val out = Dedup.semDedup(df, "vec_id", "v", cs, threshold = 0.99, cap = 50)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.size == 601)
    assert(out(0L), "lowest id of the clique must be kept")
    assert(out(999L), "the singleton cell survives")
    assert((1L until 600L).forall(i => !out(i)),
      "every other clique member must be dropped despite the cap")
  }

  test("embeddingNearDupLsh bucketCap engaged loses no pairs vs uncapped") {
    val unc = Dedup.embeddingNearDupLsh(corpus, "vec_id", "v", 0.99, dim = 64)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // cap=8 is far below fixture bucket occupancy — every bucket chunks
    val capped = Dedup.embeddingNearDupLsh(corpus, "vec_id", "v", 0.99, dim = 64,
        bucketCap = 8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(unc.nonEmpty)
    assert(capped == unc,
      "projection-ordered neighborhoods must retain all near-dup pairs")
  }

  test("embeddingNearDupLsh finds all pairs of an over-cap identical clique") {
    val vec = Array.fill(16)(0.5)
    val df = (0L until 300L).map(i => (i, vec)).toDF("vec_id", "v")
    val out = Dedup.embeddingNearDupLsh(df, "vec_id", "v", 0.99, dim = 16,
        bucketCap = 20)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // identical vectors share every bucket and every projection rank block
    // boundary is id-adjacent — chunk locality still yields a connected
    // pair set; exact output here is ±1-chunk pairs, which must at minimum
    // chain every consecutive id (what clustering consumes downstream).
    assert((0L until 299L).forall(i => out.contains((i, i + 1))),
      "consecutive ids of a clique must always pair (same/adjacent chunk)")
    assert(out.forall { case (a, b) => a < b && b < 300L })
  }
}

/** r13: cell assignment became the map-only [[graft.functions.NearestCell]]
  * expression. This pins it bit-exactly to the aggregate formulation it
  * replaced (cross-join × broadcast centroids → round-6 cosine →
  * max(struct(sim, -cid))), including the rounded-tie → lowest-cid rule
  * and the zero-exchange plan shape.
  */
class NearestCellSpec extends SparkSpec {
  import spark.implicits._

  private def embs = spark.read.parquet(sf("embeddings"))

  private def corpus = {
    val base = embs.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val mut = base.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("v"), (x, i) => when(i === 0, x + 0.01).otherwise(x)).as("v"))
    base.union(mut)
  }

  private def cents = embs
    .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    .filter(col("vec_id") < 8)
    .select(col("vec_id").as("cid"), col("v").as("cvec"))

  private def legacyAssign(e: org.apache.spark.sql.DataFrame,
      c: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
    e.select(col("vec_id").as("id"), col("v"))
      .crossJoin(broadcast(c.select(col("cid"), col("cvec"))))
      .select(col("id"),
        round(Dedup.cosine(col("v"), col("cvec")), 6).as("sim"), col("cid"))
      .groupBy("id")
      .agg(max(struct(col("sim"), (-col("cid")).as("nc"))).as("w"))
      .select(col("id"), (-col("w.nc")).as("cid"), col("w.sim").as("simc"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("NearestCell assignment equals the aggregate argmax bit-exactly") {
    val got = Dedup.assignCells(corpus, "vec_id", "v", cents)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == legacyAssign(corpus, cents))
  }

  test("rounded ties break to the LOWEST cid") {
    // two identical centroids under different cids: every vector ties at
    // 6 dp and must land on the smaller cid, exactly as max(struct(sim,
    // -cid)) decided
    val dup = cents.limit(1).select(lit(999L).as("cid"), col("cvec"))
      .unionAll(cents.limit(1).select(lit(7777L).as("cid"), col("cvec")))
    val got = Dedup.assignCells(corpus.limit(50), "vec_id", "v", dup)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(999L))
    assert(got == legacyAssign(corpus.limit(50), dup).map { case (k, v) => k -> v._1 })
  }

  test("assignment is map-only: zero exchanges in the plan") {
    import org.apache.spark.sql.execution.exchange.Exchange
    val plan = Dedup.assignCells(corpus, "vec_id", "v", cents)
      .queryExecution.executedPlan
    assert(plan.collect { case e: Exchange => e }.isEmpty, plan.toString)
  }
}
