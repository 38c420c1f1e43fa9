package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Round-6 occupancy caps, part 2: the same sorted-neighborhood
  * rank-chunking that bounds SemDeDup cells and SRP-LSH buckets
  * (SemDedupCapSpec) applied to the MinHash band-buckets (d2) and the
  * PPJoin prefix-token buckets (d40). Rank key is the SET SIZE — a true
  * pair at Jaccard ≥ t has |A|/|B| within [t, 1/t], so rank distance
  * inside a shared bucket tracks real dissimilarity. Must (a) reduce
  * exactly to the original semantics below the cap, (b) lose no pairs on
  * the fixture corpus with the cap engaged, (c) chain over-cap identical
  * mega-cliques so downstream clustering sees one component.
  */
class MinHashCapSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(sf("documents"))

  private def mutantCorpus = {
    val m = expr("CASE WHEN instr(text,' ') > 0 THEN substring(text, instr(text,' ')+1) ELSE text END")
    docs.select(col("doc_id"), col("text"))
      .union(docs.select((col("doc_id") + 100000).as("doc_id"), m.as("text")))
  }

  test("minHashLsh bucketCap engaged keeps mutant pairs and components intact") {
    // cap=2 is brutally small — inside natural multi-doc cliques (the
    // corpus has a few, e.g. {8,12,120,360} + mutants) DISTANT intra-clique
    // pairs may drop out of the pair list, but (a) capping only ever
    // REMOVES candidates, (b) each doc's direct mutant is size-rank
    // adjacent and always found, and (c) the rank chain keeps every clique
    // connected, so clustering is unchanged — the guarantee downstream
    // dedup actually consumes.
    val unc = Dedup.minHashLsh(mutantCorpus, "doc_id", "text", threshold = 0.8,
      bucketCap = Int.MaxValue)
    val uncSet = unc.select("a", "b").as[(Long, Long)].collect().toSet
    val capped = Dedup.minHashLsh(mutantCorpus, "doc_id", "text", threshold = 0.8,
      bucketCap = 2)
    val capSet = capped.select("a", "b").as[(Long, Long)].collect().toSet
    assert(uncSet.nonEmpty)
    assert(capSet.subsetOf(uncSet), "capping must only ever remove candidate pairs")
    val mutants = uncSet.filter { case (a, b) => b == a + 100000 }
    assert(mutants.nonEmpty && mutants.subsetOf(capSet),
      "every direct mutant pair is size-rank adjacent and must survive the cap")
    def comps(pairs: org.apache.spark.sql.DataFrame) =
      Dedup.clusters(pairs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (cu, cc) = (comps(unc), comps(capped))
    unc.unpersist(blocking = false); capped.unpersist(blocking = false)
    assert(cc == cu, "rank-chain connectivity must preserve connected components")
  }

  test("minHashLsh chains an over-cap identical mega-clique into one component") {
    // 300 identical docs: every band-bucket holds the whole clique, far
    // over cap=20. Rank ties break by id, so chunks are id-runs and every
    // consecutive-id pair shares a same-or-adjacent chunk — the pair list
    // stays O(n·cap) but the clique remains CONNECTED, so clusters()
    // still collapses it to the minimum id.
    val text = (1 to 30).map(i => s"tok$i").mkString(" ")
    val df = (0L until 300L).map(i => (i, text)).toDF("doc_id", "text")
    val pairs = Dedup.minHashLsh(df, "doc_id", "text", threshold = 0.8, bucketCap = 20)
    val set = pairs.select("a", "b").as[(Long, Long)].collect().toSet
    assert((0L until 299L).forall(i => set.contains((i, i + 1))),
      "consecutive ids of a clique must always pair (same/adjacent chunk)")
    // hard bound actually binds: full clique would be n(n-1)/2 = 44850
    assert(set.size < 300 * 2 * 20,
      s"pair list must stay O(n·cap), got ${set.size}")
    val clustered = Dedup.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.unpersist(blocking = false)
    assert(clustered.size == 300 && clustered.values.forall(_ == 0L),
      "capped pair list must still collapse the clique to min id")
  }

  test("prefixJaccardJoin bucketCap engaged keeps mutant pairs and components intact") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def sh(c: org.apache.spark.sql.Column) = ColumnBridge.column(
      graft.functions.ShingleHashesMd5(ColumnBridge.expression(c), 5))
    val sets = mutantCorpus
      .select(col("doc_id").as("id"), explode(sh(col("text"))).as("elem"))
      .distinct()
    val unc = Dedup.prefixJaccardJoin(sets, 4, 5, bucketCap = Int.MaxValue)
    val uncSet = unc.select("ia", "ib").as[(Long, Long)].collect().toSet
    val cap = Dedup.prefixJaccardJoin(sets, 4, 5, bucketCap = 2)
    val capSet = cap.select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(uncSet.nonEmpty)
    assert(capSet.subsetOf(uncSet), "capping must only ever remove candidate pairs")
    val mutants = uncSet.filter { case (a, b) => b == a + 100000 }
    assert(mutants.nonEmpty && mutants.subsetOf(capSet),
      "every direct mutant pair is size-rank adjacent and must survive the cap")
    def comps(pairs: org.apache.spark.sql.DataFrame) =
      Dedup.clusters(pairs.select(col("ia").as("a"), col("ib").as("b")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (cu, cc) = (comps(unc), comps(cap))
    unc.unpersist(blocking = false); cap.unpersist(blocking = false)
    assert(cc == cu, "rank-chain connectivity must preserve connected components")
  }

  test("prefixJaccardJoin chains an over-cap identical mega-clique") {
    // 200 identical element-sets: every prefix token's bucket holds the
    // whole clique. Same chain guarantee as the minhash cap.
    val rows = for { i <- 0L until 200L; e <- 1L to 40L } yield (i, e)
    val sets = rows.toDF("id", "elem")
    val out = Dedup.prefixJaccardJoin(sets, 4, 5, bucketCap = 16)
    val set = out.select("ia", "ib").as[(Long, Long)].collect().toSet
    out.unpersist(blocking = false)
    assert((0L until 199L).forall(i => set.contains((i, i + 1))),
      "consecutive ids of a clique must always pair")
    assert(set.size < 200 * 2 * 16, s"pair list must stay O(n·cap), got ${set.size}")
  }
}
