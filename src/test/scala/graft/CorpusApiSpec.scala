package graft

import graft.api.corpus._
import org.apache.spark.sql.functions._

/** The public corpus-curation API (graft.api.corpus) must agree with the
  * oracle-gated query formulations in SparkEntry — the API is a thin
  * wrapper over the same primitives, and these specs pin that it stays
  * one.
  */
class CorpusApiSpec extends SparkSpec {

  private def docs = spark.read.parquet(sf("documents"))
  private val sfDir = "/root/testdata/sf0.001"

  private def mutantCorpus = {
    val m = expr(
      "CASE WHEN instr(text,' ') > 0 THEN substring(text, instr(text,' ')+1) ELSE text END")
    docs.select(col("doc_id"), col("text"))
      .union(docs.select((col("doc_id") + 100000).as("doc_id"), m.as("text")))
  }

  test("withTextSignals + thresholds reproduces the d15 curation set") {
    val api = docs.withTextSignals()
      .withColumn("keep_id", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("pred_lang") === "en" && col("quality") >= 0.5 &&
        col("n_tokens").between(30, 5000) && col("doc_id") === col("keep_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val oracle = SparkEntry.queries("d15_corpus_curation")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(api == oracle && api.nonEmpty)
  }

  test("withRepetitionSignals matches the d20 ratios") {
    val api = docs.withRepetitionSignals()
      .filter(col("n_grams") >= 1)
      .select(col("doc_id"), col("rep_frac"), col("top_frac"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val q = SparkEntry.queries("d20_repetition_signals")(spark, sfDir)
      .select(col("doc_id"), col("rep_frac"), col("top_frac"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(api == q && api.nonEmpty)
  }

  test("decontaminateAgainst keeps exactly the complement of the d18 flag set") {
    val corpus = mutantCorpus
    val heldOut = corpus.filter(col("doc_id") < 50)
    val train = corpus.filter(col("doc_id") >= 50)
    val flagged = SparkEntry.queries("d18_decontamination")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val trainIds = train.select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = train.decontaminateAgainst(heldOut)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == trainIds -- flagged)
    assert(flagged.nonEmpty && kept.nonEmpty)
  }

  test("redactPii counts and scrubs the injected fixtures") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail me at a.b@test.org or c@d.io thanks"),
      (2L, "server 10.0.3.7 and 192.168.1.1 up"),
      (3L, "call +1 555-1234 now"),
      (4L, "nothing to see")).toDF("doc_id", "text")
    val out = df.redactPii().orderBy("doc_id").collect()
    assert(out.map(_.getAs[Int]("n_emails")).toSeq == Seq(2, 0, 0, 0))
    assert(out.map(_.getAs[Int]("n_ips")).toSeq == Seq(0, 2, 0, 0))
    assert(out.map(_.getAs[Int]("n_phones")).toSeq == Seq(0, 0, 1, 0))
    assert(out(0).getAs[String]("text") == "mail me at <EMAIL> or <EMAIL> thanks")
    assert(out(2).getAs[String]("text") == "call <PHONE> now")
    assert(out(3).getAs[String]("text") == "nothing to see")
  }

  test("sampleMixture reproduces the d23 per-stratum keep counts") {
    val rates = Seq("en" -> 8000, "de" -> 5000, "es" -> 2500, "fr" -> 1250, "zh" -> 625)
    val api = docs.sampleMixture("lang", rates)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val q = SparkEntry.queries("d23_mixture_sampling")(spark, sfDir)
      .select(col("lang"), col("n_kept"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(api == q.filter(_._2 > 0))
  }

  test("packSequences agrees with the d22 chunk boundaries") {
    val api = docs.packSequences()
      .groupBy("source", "chunk")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val q = SparkEntry.queries("d22_sequence_packing")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(api == q && api.nonEmpty)
  }

  test("shuffleDeterministic matches d24 and is stable across repartitionings") {
    val api = docs.shuffleDeterministic()
      .select(col("shard"), col("shuffle_pos"), col("doc_id"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val q = SparkEntry.queries("d24_training_shuffle")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(api == q && api.nonEmpty)
    val reparted = docs.repartition(7).shuffleDeterministic()
      .select(col("shard"), col("shuffle_pos"), col("doc_id"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(reparted == api)
  }

  test("capPerDomain matches the d33 quota set") {
    val api = docs.capPerDomain(k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val q = SparkEntry.queries("d33_domain_caps")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(api == q && api.nonEmpty)
  }

  test("withPassageDupStats matches the d32 profile on the mutant corpus") {
    val api = mutantCorpus.withPassageDupStats()
      .select(col("doc_id"), col("n_grams"), col("n_dup"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val q = SparkEntry.queries("d32_passage_dedup")(spark, sfDir)
      .select(col("doc_id"), col("n_grams"), col("n_dup"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(api == q && api.nonEmpty)
  }

  test("canonicalizeUrls collapses crawl variants for exact dedup") {
    import spark.implicits._
    val raw = Seq(
      (1L, "HTTPS://Site.COM:443/p?b=1&a=2#x"),
      (2L, "https://site.com/p?a=2&b=1"),
      (3L, "http://other.com/q")).toDF("doc_id", "url")
    val canon = raw.canonicalizeUrls()
    assert(canon.select("url").distinct().count() == 2)
    assert(canon.filter(col("doc_id") === 1).head().getString(1) ==
      "https://site.com/p?a=2&b=1")
  }

  test("dedupBlocks rebuilds docs from surviving blocks; duplicate doc empties") {
    import spark.implicits._
    val a = (1 to 16).map(i => s"w$i").mkString(" ")
    val b = (1 to 16).map(i => s"x$i").mkString(" ")
    val in = Seq((1L, a), (2L, a), (3L, b)).toDF("doc_id", "text")
    val out = in.dedupBlocks().collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out(1L) == a)   // first occurrence keeps everything
    assert(out(2L) == "")  // exact copy loses all blocks
    assert(out(3L) == b)   // distinct content untouched
  }

  test("withReadability matches the d42 scores; distinctSketch matches d43") {
    val api = docs.withReadability()
      .select(col("doc_id"), col("flesch"), col("read_band"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    val q = SparkEntry.queries("d42_readability")(spark, sfDir)
      .select(col("doc_id"), col("flesch"), col("band"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    assert(api.view.filterKeys(q.contains).toMap == q && q.nonEmpty)

    val sk = docs.distinctSketch("source", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val d43 = SparkEntry.queries("d43_kmv_sketch")(spark, sfDir)
      .filter(col("source") =!= "__all__")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(sk == d43 && sk.nonEmpty)
  }

  test("chunkSliding matches the d48 chunks") {
    val api = docs.chunkSliding()
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getLong(3))))
      .toMap
    val q = SparkEntry.queries("d48_rag_chunks")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getLong(3))))
      .toMap
    assert(api == q && api.nonEmpty)
  }

  test("dsirWeights matches the d49 scores") {
    val api = docs.dsirWeights(isTarget = col("doc_id") % 10 < 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val q = SparkEntry.queries("d49_dsir_weights")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(api == q && api.nonEmpty)
  }

  test("withNoveltyProfile matches d50; contaminationAgainst matches d52") {
    val corpus = mutantCorpus
    val nov = corpus.withNoveltyProfile()
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val d50 = SparkEntry.queries("d50_ngram_novelty")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(nov == d50 && nov.nonEmpty)

    val contam = corpus.filter(col("doc_id") >= 50)
      .contaminationAgainst(corpus.filter(col("doc_id") < 50))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val d52 = SparkEntry.queries("d52_contamination_frac")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(contam == d52 && contam.nonEmpty)
    assert(contam.values.exists(_._3 > 0)) // mutants guarantee real overlap
  }

  test("semDedup API matches the d47 verdicts") {
    import spark.implicits._
    val embs = spark.read.parquet(sf("embeddings"))
    val base = embs.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("embedding"))
    val mut = base.select((col("vec_id") + 100000).as("vec_id"),
      expr("transform(embedding, (x, i) -> IF(i = 0, x + 0.01, x))").as("embedding"))
    val cents = base.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val api = base.union(mut).semDedup(cents)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val q = SparkEntry.queries("d47_semdedup")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(api == q && api.nonEmpty)
    assert(api.values.exists(!_._2)) // the mutant corpus guarantees drops
  }

  test("corpus-assembly wrappers match their gated query twins (d60-d62)") {
    // d60: kept-row counts per stratum == the gated aggregate
    val kept60 = docs.sampleTemperature()
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val q60 = SparkEntry.queries("d60_temperature_mixture")(spark, sfDir)
      .select("lang", "n_kept")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept60 == q60.filter(_._2 > 0) && kept60.nonEmpty)
    // the temperature actually engages: some stratum is subsampled
    val tot = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept60.exists { case (l, k) => k < tot(l) })
    // d61: kept docs + chars per source == the gated aggregate
    val kept61 = docs.capPerDomainChars(5000L)
      .groupBy("source").agg(count(lit(1)).as("n"), sum("n_chars").as("ch"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val q61 = SparkEntry.queries("d61_source_budget")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(kept61 == q61.filter { case (_, (n, _)) => n > 0 } && kept61.nonEmpty)
    // d62: representative rows == the gated query verbatim
    val clusters = SparkEntry.queries("d9_dedup_clusters")(spark, sfDir)
    val api62 = mutantCorpus.canonicalPerCluster(clusters)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val q62 = SparkEntry.queries("d62_cluster_canonical")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(api62 == q62 && api62.nonEmpty)
  }

  test("shard-merge API completes the union from two independently built shards") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(sf("documents")).select(col("doc_id"), col("text"))
    val a = tmpDir("corpus_merge_a"); val b = tmpDir("corpus_merge_b")
    val pA = docs.filter(col("doc_id") % 2 === 0).ingestIntoDedupIndex(a)
    val pB = docs.filter(col("doc_id") % 2 === 1).ingestIntoDedupIndex(b)
    val (_, cross) = graft.api.corpus.mergeDedupIndexes(spark, a, b)
    val oneShot = Dedup.minHashLsh(docs, "doc_id", "text",
      numHashes = 128, bands = 32, shingleN = 3, threshold = 0.8)
    def ps(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ps(pA).union(ps(pB)).union(ps(cross)) == ps(oneShot))
    Seq(pA, pB, cross, oneShot).foreach(_.unpersist(blocking = false))
  }

  test("incremental ingest APIs accumulate the one-shot results across two batches") {
    import graft.operators.{Dedup, IncrementalIndex}
    // MinHash side: two bookmark batches through the API == one-shot pairs
    val docs = spark.read.parquet(sf("documents")).select(col("doc_id"), col("text"))
    val dedupRoot = tmpDir("corpus_incr_dedup")
    val p1 = docs.filter(col("doc_id") < 250).ingestIntoDedupIndex(dedupRoot)
    val p2 = docs.filter(col("doc_id") >= 250).ingestIntoDedupIndex(dedupRoot)
    val oneShot = Dedup.minHashLsh(docs, "doc_id", "text",
      numHashes = 128, bands = 32, shingleN = 3, threshold = 0.8)
    def ps(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ps(p1).union(ps(p2)) == ps(oneShot))
    oneShot.unpersist(); p1.unpersist(); p2.unpersist()
    // prefix-filter side (d59): the EXACT index through the API — two
    // batches accumulate the one-shot prefixJaccardJoin pairs verbatim
    val prefRoot = tmpDir("corpus_incr_prefix")
    val q1 = docs.filter(col("doc_id") < 250).ingestIntoPrefixIndex(prefRoot)
    val q2 = docs.filter(col("doc_id") >= 250).ingestIntoPrefixIndex(prefRoot)
    def sh5(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.ShingleHashesMd5(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(c), 5))
    val sets = docs
      .select(col("doc_id").as("id"), explode(sh5(col("text"))).as("elem"))
      .distinct()
    val oneShotP = Dedup.prefixJaccardJoin(sets, 4, 5)
    def pp(df: org.apache.spark.sql.DataFrame) =
      df.select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pp(q1).union(pp(q2)) == pp(oneShotP))
    oneShotP.unpersist(); q1.unpersist(); q2.unpersist()
    // SemDeDup side: bootstrap + API ingest covers every vector once
    val embs = spark.read.parquet(sf("embeddings"))
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("embedding"))
    val cents = embs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val semRoot = tmpDir("corpus_incr_sem")
    val k1 = IncrementalIndex.bootstrapSemDedup(spark, semRoot,
      embs.filter(col("vec_id") < 300), "vec_id", "embedding", cents, 0.99).verdicts
    val k2 = embs.filter(col("vec_id") >= 300).ingestIntoSemDedupIndex(semRoot)
    assert(k1.count() + k2.count() == embs.count())
    k1.unpersist(); k2.unpersist()
  }
}
