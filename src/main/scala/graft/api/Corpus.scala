package graft.api

import graft.functions.TextFunctions
import graft.operators.{Dedup, IncrementalIndex}
import graft.sinks.VersionedTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** The library's user-facing corpus-curation surface: every pre-training
  * pipeline stage as a composable DataFrame transform. Each method is a
  * thin declarative wrapper over the same engine primitives the
  * oracle-gated queries exercise (TextFunctions, GramStats, TermCounts,
  * Dedup) — no second implementation to drift.
  *
  * Usage:
  * {{{
  *   import graft.api.corpus._
  *   docs.withTextSignals()
  *       .withRepetitionSignals()
  *       .filter($"quality" >= 0.5 && $"rep_frac" <= 0.3)
  *       .dedupExact()
  *       .decontaminateAgainst(benchmarks)
  *       .sampleMixture("lang", Seq("en" -> 8000, "de" -> 5000))
  *       .packSequences(capacity = 2048)
  * }}}
  *
  * Every transform is scan-shaped or ids-only through its shuffles (see
  * SCALING.md): signals are row-local codegen'd expressions, dedup keeps
  * a 32-byte fingerprint per row, decontamination broadcasts the
  * held-out side, sampling is a deterministic salted hash.
  */
object corpus {

  /** Rows a replayed epoch committed in `root`: the version carrying its
    * `_epoch-` marker, read back verbatim — what a replayed batch-path
    * ingest hands its caller instead of re-appending. Fails LOUDLY when
    * no version carries the marker: either a replay older than the
    * compaction horizon (markers ride the reclaimed versions — read the
    * accumulated log instead) or a batch VIOLATING the append-ordered
    * bookmark contract (a max id at or below the committed high-water
    * reads as a replay; silent drops would hide the mis-ordered source).
    */
  private def replayedEpochRows(spark: SparkSession, root: String,
      epochId: Long): DataFrame =
    VersionedTable.read(spark, root, Some(replayedEpochVersion(spark, root, epochId)))

  private def replayedEpochVersion(spark: SparkSession, root: String,
      epochId: Long): Long =
    IncrementalIndex.epochVersion(spark, root, epochId).getOrElse(
      throw new IllegalStateException(
        s"epoch $epochId at $root reads as committed (at or below the epoch " +
          "high-water) but no version carries its marker: either a replay older " +
          "than the compaction horizon — read the accumulated log instead — or a " +
          "batch violating the append-ordered bookmark contract (each batch's " +
          "max id must exceed every previously ingested id)"))

  /** Shard-merge entry points (d64–d66, e25): complete a sharded
    * bootstrap by folding an independently-built donor index into
    * `indexRoot`. Per-family semantics (cross-pair completion or
    * verdict-correction delta, the log-adoption data move, donor
    * tombstones preserved) live on [[graft.operators.IncrementalIndex]];
    * these are the user-facing names. Pair-family merges return
    * (version, cross pairs) — append the pairs to the caller's
    * accumulated log; the exact merge returns (version, correction
    * delta) — override those ids in the accumulated verdict log;
    * the SemDeDup merge re-assigns the donor's member log under the
    * adopter's frozen geometry and its verdicts REPLACE the donor's.
    * IVF/PQ indexes don't merge (logs keep only assignments/codes,
    * no vectors): re-ingest the donor's source vectors instead.
    */
  def mergeDedupIndexes(spark: SparkSession, indexRoot: String,
      donorRoot: String,
      p: IncrementalIndex.MinHashParams = IncrementalIndex.MinHashParams())
      : (Long, DataFrame) =
    IncrementalIndex.mergeMinHashIndexes(spark, indexRoot, donorRoot, p)

  /** Exactly-once merge faces. Unlike the batch ingest wrappers there
    * is NO derivable default epoch — a bookmark boundary identifies a
    * batch, but nothing inside a merge identifies the merge STEP, and
    * anything derived from current state (hwm+1, donor versions) drifts
    * under the very replay the guard exists for. The orchestrator owns
    * `epochId`: monotone per adopter lineage (shared with any ingest
    * epochs on `indexRoot`), stable across re-deliveries — a DAG step
    * sequence number is the natural source. Cross pairs / correction
    * deltas commit into `resultRoot` under the same epoch, so a replay
    * can recover them with [[IncrementalIndex.epochVersion]].
    *
    * The id IS the step's identity: re-using an id for a DIFFERENT
    * donor silently no-ops (the guard cannot distinguish a replay from
    * a mis-assigned id — None back, nothing merged), exactly as a
    * bookmark-derived ingest epoch would swallow a different batch at
    * the same boundary. One id per merge step, ever.
    */
  def mergeDedupIndexesEpoch(spark: SparkSession, indexRoot: String,
      resultRoot: String, donorRoot: String, epochId: Long,
      p: IncrementalIndex.MinHashParams = IncrementalIndex.MinHashParams())
      : Option[(Long, DataFrame)] =
    IncrementalIndex.mergeMinHashIndexesEpoch(
      spark, indexRoot, resultRoot, donorRoot, epochId, p)

  def mergeManyDedupIndexesEpoch(spark: SparkSession, indexRoot: String,
      resultRoot: String, donorRoots: Seq[String], epochId: Long,
      p: IncrementalIndex.MinHashParams = IncrementalIndex.MinHashParams())
      : Option[(Long, DataFrame)] =
    IncrementalIndex.mergeManyMinHashIndexesEpoch(
      spark, indexRoot, resultRoot, donorRoots, epochId, p)

  def mergeSimHashIndexesEpoch(spark: SparkSession, indexRoot: String,
      resultRoot: String, donorRoot: String, epochId: Long,
      maxHamming: Int = 3): Option[(Long, DataFrame)] =
    IncrementalIndex.mergeSimHashIndexesEpoch(
      spark, indexRoot, resultRoot, donorRoot, epochId, maxHamming)

  def mergeExactIndexesEpoch(spark: SparkSession, indexRoot: String,
      resultRoot: String, donorRoot: String, epochId: Long)
      : Option[(Long, DataFrame)] =
    IncrementalIndex.mergeExactIndexesEpoch(
      spark, indexRoot, resultRoot, donorRoot, epochId)

  def mergeSemDedupIndexes(spark: SparkSession, indexRoot: String,
      donorRoot: String, threshold: Double, cap: Int = 512,
      broadcastRowLimit: Long = IncrementalIndex.DefaultBroadcastRowLimit)
      : IncrementalIndex.SemDedupIngest =
    IncrementalIndex.mergeSemDedupIndexes(
      spark, indexRoot, donorRoot, threshold, cap, broadcastRowLimit)

  /** Parameter order follows the family convention — epochId
    * immediately after donorRoot, like every other *Epoch merge
    * wrapper — so a transposed threshold/epochId call site can no
    * longer compile silently via numeric widening.
    */
  def mergeSemDedupIndexesEpoch(spark: SparkSession, indexRoot: String,
      resultRoot: String, donorRoot: String, epochId: Long,
      threshold: Double, cap: Int = 512,
      broadcastRowLimit: Long = IncrementalIndex.DefaultBroadcastRowLimit)
      : Option[IncrementalIndex.SemDedupIngest] =
    IncrementalIndex.mergeSemDedupIndexesEpoch(
      spark, indexRoot, resultRoot, donorRoot, epochId, threshold, cap,
      broadcastRowLimit)

  /** N-way SemDeDup merge (e28): k id-range donors fan in as ONE
    * append-ordered batch — donor×donor cross pairs complete inside a
    * single assign + candidate pass, where a fold of binary merges
    * re-pays the pass against the growing adopter k−1 times. The donor
    * Seq order is irrelevant (the enforced range precheck sorts
    * internally); the RANGES must be pairwise disjoint and above every
    * adopter id, or the call rejects before any leg commits.
    */
  def mergeManySemDedupIndexes(spark: SparkSession, indexRoot: String,
      donorRoots: Seq[String], threshold: Double, cap: Int = 512,
      broadcastRowLimit: Long = IncrementalIndex.DefaultBroadcastRowLimit)
      : IncrementalIndex.SemDedupIngest =
    IncrementalIndex.mergeManySemDedupIndexes(
      spark, indexRoot, donorRoots, threshold, cap, broadcastRowLimit)

  def mergeManySemDedupIndexesEpoch(spark: SparkSession, indexRoot: String,
      resultRoot: String, donorRoots: Seq[String], epochId: Long,
      threshold: Double, cap: Int = 512,
      broadcastRowLimit: Long = IncrementalIndex.DefaultBroadcastRowLimit)
      : Option[IncrementalIndex.SemDedupIngest] =
    IncrementalIndex.mergeManySemDedupIndexesEpoch(
      spark, indexRoot, resultRoot, donorRoots, epochId, threshold, cap,
      broadcastRowLimit)

  def mergeEmbeddingIndexesEpoch(spark: SparkSession, indexRoot: String,
      resultRoot: String, donorRoot: String, epochId: Long,
      p: IncrementalIndex.SrpParams): Option[(Long, DataFrame)] =
    IncrementalIndex.mergeSrpIndexesEpoch(
      spark, indexRoot, resultRoot, donorRoot, epochId, p)

  def mergePrefixIndexes(spark: SparkSession, indexRoot: String,
      donorRoot: String,
      p: IncrementalIndex.PrefixJaccardParams =
        IncrementalIndex.PrefixJaccardParams()): (Long, DataFrame) =
    IncrementalIndex.mergePrefixIndexes(spark, indexRoot, donorRoot, p)

  def mergePrefixIndexesEpoch(spark: SparkSession, indexRoot: String,
      resultRoot: String, donorRoot: String, epochId: Long,
      p: IncrementalIndex.PrefixJaccardParams =
        IncrementalIndex.PrefixJaccardParams()): Option[(Long, DataFrame)] =
    IncrementalIndex.mergePrefixIndexesEpoch(
      spark, indexRoot, resultRoot, donorRoot, epochId, p)

  /** N-way prefix-filter merge (d75): every donor's token arrays
    * re-sort under the adopter's frozen order, then one tagged
    * candidate pass covers all shard combinations.
    */
  def mergeManyPrefixIndexes(spark: SparkSession, indexRoot: String,
      donorRoots: Seq[String],
      p: IncrementalIndex.PrefixJaccardParams =
        IncrementalIndex.PrefixJaccardParams()): (Long, DataFrame) =
    IncrementalIndex.mergeManyPrefixIndexes(spark, indexRoot, donorRoots, p)

  def mergeManyPrefixIndexesEpoch(spark: SparkSession, indexRoot: String,
      resultRoot: String, donorRoots: Seq[String], epochId: Long,
      p: IncrementalIndex.PrefixJaccardParams =
        IncrementalIndex.PrefixJaccardParams()): Option[(Long, DataFrame)] =
    IncrementalIndex.mergeManyPrefixIndexesEpoch(
      spark, indexRoot, resultRoot, donorRoots, epochId, p)

  /** N-way MinHash merge (d69): one candidate pass over ALL donors —
    * the wide-fan-in path; a fold of binary merges re-scans the growing
    * adopter N−1 times.
    */
  def mergeManyDedupIndexes(spark: SparkSession, indexRoot: String,
      donorRoots: Seq[String],
      p: IncrementalIndex.MinHashParams = IncrementalIndex.MinHashParams())
      : (Long, DataFrame) =
    IncrementalIndex.mergeManyMinHashIndexes(spark, indexRoot, donorRoots, p)

  def mergeSimHashIndexes(spark: SparkSession, indexRoot: String,
      donorRoot: String, maxHamming: Int = 3): (Long, DataFrame) =
    IncrementalIndex.mergeSimHashIndexes(spark, indexRoot, donorRoot, maxHamming)

  /** N-way SimHash merge (d73): one tagged candidate pass over all
    * donors — portable signatures, so any same-shingleN shards fan in.
    */
  def mergeManySimHashIndexes(spark: SparkSession, indexRoot: String,
      donorRoots: Seq[String], maxHamming: Int = 3): (Long, DataFrame) =
    IncrementalIndex.mergeManySimHashIndexes(
      spark, indexRoot, donorRoots, maxHamming)

  def mergeManySimHashIndexesEpoch(spark: SparkSession, indexRoot: String,
      resultRoot: String, donorRoots: Seq[String], epochId: Long,
      maxHamming: Int = 3): Option[(Long, DataFrame)] =
    IncrementalIndex.mergeManySimHashIndexesEpoch(
      spark, indexRoot, resultRoot, donorRoots, epochId, maxHamming)

  /** N-way SRP merge (d74): sound iff every shard froze IDENTICAL
    * SrpParams — the binary contract, N-fold.
    */
  def mergeManyEmbeddingIndexes(spark: SparkSession, indexRoot: String,
      donorRoots: Seq[String],
      p: IncrementalIndex.SrpParams): (Long, DataFrame) =
    IncrementalIndex.mergeManySrpIndexes(spark, indexRoot, donorRoots, p)

  def mergeManyEmbeddingIndexesEpoch(spark: SparkSession, indexRoot: String,
      resultRoot: String, donorRoots: Seq[String], epochId: Long,
      p: IncrementalIndex.SrpParams): Option[(Long, DataFrame)] =
    IncrementalIndex.mergeManySrpIndexesEpoch(
      spark, indexRoot, resultRoot, donorRoots, epochId, p)

  def mergeExactIndexes(spark: SparkSession, indexRoot: String,
      donorRoot: String): (Long, DataFrame) =
    IncrementalIndex.mergeExactIndexes(spark, indexRoot, donorRoot)

  /** N-way exact-dedup merge (d72): one fingerprint pass over all
    * donors corrects every spanning group at once — the verdict-family
    * face of the wide fan-in.
    */
  def mergeManyExactIndexes(spark: SparkSession, indexRoot: String,
      donorRoots: Seq[String]): (Long, DataFrame) =
    IncrementalIndex.mergeManyExactIndexes(spark, indexRoot, donorRoots)

  def mergeManyExactIndexesEpoch(spark: SparkSession, indexRoot: String,
      resultRoot: String, donorRoots: Seq[String], epochId: Long)
      : Option[(Long, DataFrame)] =
    IncrementalIndex.mergeManyExactIndexesEpoch(
      spark, indexRoot, resultRoot, donorRoots, epochId)

  def mergeEmbeddingIndexes(spark: SparkSession, indexRoot: String,
      donorRoot: String, p: IncrementalIndex.SrpParams): (Long, DataFrame) =
    IncrementalIndex.mergeSrpIndexes(spark, indexRoot, donorRoot, p)

  /** TF-IDF shard merge (d68) — unlike the pair families this writes a
    * FRESH `mergedRoot` (every row re-weights under the summed frozen
    * stats, so nothing adopts); shard pair/score caches don't carry
    * over — re-derive scores from the merged index.
    */
  def mergeTfidfIndexes(spark: SparkSession, mergedRoot: String,
      shardRoots: Seq[String]): Long =
    IncrementalIndex.mergeTfidfIndexes(spark, mergedRoot, shardRoots)

  implicit class CorpusOps(private val df: DataFrame) {

    /** The epoch id a bookmark batch carries: its max id, cast to long.
      * Under the bookmark contract batches are DISJOINT ASCENDING id
      * ranges (the same append-ordered-id guarantee the incremental
      * ingests already require), so batch max ids strictly increase — a
      * valid monotone epoch sequence derived from the data itself, no
      * side-channel sequence number needed. None for an empty batch
      * (the wrappers turn that into a PURE no-op — no version written,
      * no epoch consumed — so repeated empty polls, routine in
      * cron/stream ingestion, never grow the version logs). Ids that
      * don't cast to long fail LOUDLY: silently falling back to an
      * unguarded at-least-once ingest would reopen the replay
      * double-append the guard exists to close — a string-id source
      * must pass `epochId` explicitly. One batch-bounded aggregate job
      * per non-empty call (the derivation's price; callers with an
      * external monotone sequence can pass `epochId` and skip it).
      */
    private def bookmarkEpoch(idCol: String): Option[Long] = {
      // try_cast, not cast: under ANSI a malformed id would throw a bare
      // NumberFormatException from deep inside the aggregate — the guard
      // below turns it into an actionable "pass epochId" message instead
      val r = df.agg(max(col(idCol).try_cast("long")), count(lit(1))).head()
      if (r.getLong(1) == 0L) None
      else if (r.isNullAt(0)) throw new IllegalArgumentException(
        s"cannot derive a bookmark epoch: '$idCol' ids do not cast to " +
          "long — pass epochId explicitly (any monotone per-batch sequence)")
      else Some(r.getLong(0))
    }

    /** Epoch resolution shared by the incremental-ingest wrappers:
      * explicit `epochId` wins (still a no-op on an empty batch — an
      * empty poll must not consume an epoch or write empty versions),
      * otherwise derived from the bookmark boundary.
      */
    private def resolvedEpoch(idCol: String, explicit: Option[Long]): Option[Long] =
      explicit match {
        case Some(e) => if (df.isEmpty) None else Some(e)
        case None => bookmarkEpoch(idCol)
      }

    /** Zero-row frame with an ingest wrapper's exact result shape — what
      * an empty batch hands back without touching the index (schema
      * equality with the non-empty path is spec-pinned, so accumulating
      * callers can union across empty polls).
      */
    private def emptyResult(fields: (String, org.apache.spark.sql.types.DataType)*): DataFrame = {
      val s = df.sparkSession
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(fields.map { case (n, t) =>
          org.apache.spark.sql.types.StructField(n, t) }))
    }

    private def idType(idCol: String) = df.schema(idCol).dataType

    /** Row-local quality signals: token count, quality score, predicted
      * language, normalized fingerprint. One projection, zero shuffle.
      */
    def withTextSignals(textCol: String = "text"): DataFrame = {
      val t = col(textCol)
      df.withColumn("n_tokens", TextFunctions.tokenCount(t))
        .withColumn("quality", round(TextFunctions.qualityScore(t), 6))
        .withColumn("pred_lang", TextFunctions.langId(t))
        .withColumn("fp", TextFunctions.fingerprint(t))
    }

    /** Gopher/C4-style repetition signals from the row-local GramStats
      * histogram: duplicate-n-gram fraction and top-n-gram fraction.
      * Documents with fewer than `n` tokens get 0 grams and null ratios.
      */
    def withRepetitionSignals(textCol: String = "text", n: Int = 2): DataFrame = {
      val g = ColumnBridge.column(
        graft.functions.GramStats(ColumnBridge.expression(col(textCol)), n))
      df.withColumn("gram_stats", g)
        .withColumn("n_grams", col("gram_stats.n_grams"))
        .withColumn("rep_frac", when(col("n_grams") >= 1,
          round(lit(1.0) - col("gram_stats.n_distinct").cast("double") /
            col("n_grams").cast("double"), 6)))
        .withColumn("top_frac", when(col("n_grams") >= 1,
          round(col("gram_stats.top_count").cast("double") /
            col("n_grams").cast("double"), 6)))
        .drop("gram_stats")
    }

    /** Exact dedup on the normalized fingerprint — keeps the min-id doc
      * per identical content. Shuffles (id, 32-byte fp) only.
      */
    def dedupExact(idCol: String = "doc_id", textCol: String = "text"): DataFrame =
      Dedup.exact(df, idCol, textCol)

    /** Remove every document sharing any word-`n`-gram with `heldOut`
      * (benchmark decontamination). The held-out shingle set broadcasts;
      * the corpus side stays map-side until an ids-only distinct.
      */
    def decontaminateAgainst(
        heldOut: DataFrame,
        idCol: String = "doc_id",
        textCol: String = "text",
        n: Int = 5): DataFrame = {
      def sh(c: Column) = ColumnBridge.column(
        graft.functions.ShingleHashesMd5(ColumnBridge.expression(c), n))
      val contaminated = heldOut.select(explode(sh(col(textCol))).as("h")).distinct()
      val flagged = df.select(col(idCol), explode(sh(col(textCol))).as("h"))
        .join(broadcast(contaminated), "h")
        .select(idCol).distinct()
      df.join(flagged, Seq(idCol), "left_anti")
    }

    /** Redact emails, IPv4 addresses and `+1 ddd-dddd` phone numbers,
      * adding per-kind detection counts. Codegen'd regexps, zero shuffle.
      */
    def redactPii(textCol: String = "text"): DataFrame = {
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val phoneRe = "\\+1 \\d{3}-\\d{4}"
      val t = col(textCol)
      df.withColumn("n_emails", regexp_count(t, lit(emailRe)))
        .withColumn("n_ips", regexp_count(t, lit(ipRe)))
        .withColumn("n_phones", regexp_count(t, lit(phoneRe)))
        .withColumn(textCol, regexp_replace(regexp_replace(regexp_replace(t,
          emailRe, "<EMAIL>"), ipRe, "<IP>"), phoneRe, "<PHONE>"))
    }

    /** Deterministic stratified sampling: keep a row iff its salted
      * md5-60bit hash mod 10000 falls under the stratum's rate.
      * Reproducible under any partitioning, retry, or engine.
      */
    def sampleMixture(
        stratCol: String,
        rates: Seq[(String, Int)],
        idCol: String = "doc_id",
        salt: String = "mix1"): DataFrame = {
      val h = conv(substring(md5(
        concat(lit(s"$salt:"), col(idCol).cast("string"))), 1, 15), 16, 10)
        .cast("long") % 10000
      val rate = rates.foldLeft(lit(0)) { case (acc, (k, r)) =>
        when(col(stratCol) === k, r).otherwise(acc) }
      df.filter(h < rate)
    }

    /** Temperature-based mixture sampling (d60): per-stratum keep rates
      * DERIVED from corpus counts — effective counts ∝ n^`alpha`, the
      * rarest stratum kept whole — applied with the salted portable
      * hash (reproducible under any partitioning, retry, or engine).
      * The default α = 0.5 runs in EXACT integer arithmetic (the sqrt
      * eliminates: keep ⇔ h²·n_s < 10⁸·n_min, safe while a stratum
      * holds < 9.2×10¹⁰ docs); other α apply the double rate (still
      * deterministic — same IEEE pow of the same inputs everywhere).
      * Two corpus scans: the strata-sized count frame takes n_min from
      * a single-partition window and broadcasts back. Returns the kept
      * rows with the original columns.
      */
    def sampleTemperature(
        stratCol: String = "lang", alpha: Double = 0.5,
        idCol: String = "doc_id", salt: String = "temp1"): DataFrame = {
      val counts = df.groupBy(stratCol).agg(count(lit(1)).as("__n"))
        .withColumn("__nmin", min(col("__n")).over(Window.partitionBy()))
      val h = conv(substring(md5(
        concat(lit(s"$salt:"), col(idCol).cast("string"))), 1, 15), 16, 10)
        .cast("long") % 10000
      val joined = df.join(broadcast(counts), stratCol)
      val kept =
        if (alpha == 0.5)
          joined.filter(h * h * col("__n") < lit(100000000L) * col("__nmin"))
        else
          joined.filter(h.cast("double") < lit(10000.0) *
            pow(col("__nmin").cast("double") / col("__n").cast("double"),
              1.0 - alpha))
      kept.drop("__n", "__nmin")
    }

    /** Character-budget source cap (d61): keep each source's prefix in
      * salted-hash order — a uniform, reproducible subset — until the
      * running `charsCol` total exceeds `budget`; the budgeted twin of
      * [[capPerDomain]]'s count cap. One shuffle by `domainCol`, exact
      * per-source window cumsum, sources parallelize.
      */
    def capPerDomainChars(
        budget: Long, domainCol: String = "source",
        charsCol: String = "n_chars", idCol: String = "doc_id",
        salt: String = "bud1"): DataFrame = {
      val h = conv(substring(md5(
        concat(lit(s"$salt:"), col(idCol).cast("string"))), 1, 15), 16, 10)
        .cast("long")
      val w = Window.partitionBy(domainCol).orderBy(h, col(idCol))
      df.withColumn("__cum", sum(col(charsCol)).over(w))
        .filter(col("__cum") <= budget).drop("__cum")
    }

    /** Canonical representative per near-dup cluster (d62): given
      * (doc, cluster) labels (e.g. [[dedupNearClusters]] /
      * [[graft.operators.Dedup.clusters]] output), score THIS corpus
      * with the shared quality formula and keep one row per cluster —
      * the highest-quality member, ties to the lowest doc id. Returns
      * (cluster, rep_doc, rep_q, n_members); cluster sizes are bounded
      * by the dedup bucket caps upstream, so no window partition can be
      * pathological.
      */
    def canonicalPerCluster(
        clusters: DataFrame, idCol: String = "doc_id",
        textCol: String = "text"): DataFrame = {
      val q = df.select(col(idCol).as("doc"),
        round(TextFunctions.qualityScore(col(textCol)), 6).as("q"))
      val w = Window.partitionBy("cluster").orderBy(col("q").desc, col("doc"))
      clusters.join(q, "doc")
        .withColumn("__rn", row_number().over(w))
        .withColumn("n_members", count(lit(1)).over(Window.partitionBy("cluster")))
        .filter(col("__rn") === 1)
        .select(col("cluster"), col("doc").as("rep_doc"),
          col("q").as("rep_q"), col("n_members"))
    }

    /** Shard-local sequence packing: concatenate each group's documents
      * in id order and assign 2048-token (by default) training chunks —
      * a document's chunk is its exclusive running token offset div
      * capacity. Prefix sums parallelize across groups.
      */
    def packSequences(
        groupCol: String = "source",
        idCol: String = "doc_id",
        textCol: String = "text",
        capacity: Int = 2048): DataFrame = {
      val w = Window.partitionBy(groupCol).orderBy(idCol)
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn("n_tok", TextFunctions.tokenCount(col(textCol)).cast("long"))
        .withColumn("pack_start", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("chunk", expr(s"pack_start div $capacity"))
        .drop("pack_start")
    }

    /** Deterministic global training-order shuffle: salted-hash shard +
      * per-shard rank. No RNG, no global sort; ordering by
      * (shard, shuffle_pos) reproduces the same order anywhere.
      */
    def shuffleDeterministic(
        idCol: String = "doc_id",
        shards: Int = 16,
        salt: String = "shuf1"): DataFrame = {
      val h = conv(substring(md5(
        concat(lit(s"$salt:"), col(idCol).cast("string"))), 1, 15), 16, 10)
        .cast("long")
      df.withColumn("shard", (h % shards).cast("int"))
        .withColumn("shuffle_pos", row_number().over(
          Window.partitionBy(col("shard")).orderBy(h, col(idCol))))
    }

    /** Canonicalize a URL column in place (scheme/host case, default
      * ports, query-param order, fragments) so exact dedup collapses
      * crawl variants of the same page. Codegen'd expression, zero
      * shuffle.
      */
    def canonicalizeUrls(urlCol: String = "url"): DataFrame =
      df.withColumn(urlCol, ColumnBridge.column(
        graft.functions.UrlCanonicalize(ColumnBridge.expression(col(urlCol)))))

    /** Keep at most `k` documents per domain/source, chosen by
      * deterministic salted-md5 order — reproducible quota sampling.
      * NOTE: a single hot domain serializes onto one reducer; for
      * heavy-hitter domains estimate a per-domain hash threshold from a
      * sample instead (see SCALING.md).
      */
    def capPerDomain(
        domainCol: String = "source",
        k: Int = 10,
        idCol: String = "doc_id"): DataFrame = {
      val w = Window.partitionBy(domainCol)
        .orderBy(md5(col(idCol).cast("string")), col(idCol))
      df.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= k).drop("__rk")
    }

    /** Per-document passage-duplication profile: the fraction of this
      * doc's word-`n`-gram hashes that appear in ≥2 docs corpus-wide.
      * Adds `n_grams`, `n_dup`, `dup_frac`. Shuffles (id, hash) only.
      */
    def withPassageDupStats(
        idCol: String = "doc_id",
        textCol: String = "text",
        n: Int = 5): DataFrame = {
      def sh(c: Column) = ColumnBridge.column(
        graft.functions.ShingleHashesMd5(ColumnBridge.expression(c), n))
      val grams = df.select(col(idCol), explode(sh(col(textCol))).as("h"))
        .distinct()
        .withColumn("nd", count(lit(1)).over(Window.partitionBy("h")))
      val stats = grams.groupBy(idCol).agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup"))
      df.join(stats, Seq(idCol), "left")
        .withColumn("dup_frac",
          round(col("n_dup").cast("double") / col("n_grams"), 6))
    }

    /** Exact substring (block-level) dedup with reconstruction: cut each
      * doc into `blockTokens`-token blocks, keep only each block's
      * globally-first occurrence, and rebuild `textCol` from the
      * surviving blocks in order (docs losing every block keep an empty
      * string). The Lee-et-al curation op as one transform.
      */
    def dedupBlocks(
        idCol: String = "doc_id",
        textCol: String = "text",
        blockTokens: Int = 8): DataFrame = {
      val toks = df.select(col(idCol),
        expr(s"filter(split($textCol, '\\\\s+'), x -> x <> '')").as("t"))
      // empty/whitespace-only docs emit NO blocks (not one "" block every
      // empty doc would collide on) — they rebuild to the empty string
      val blocks = toks.select(col(idCol),
        posexplode(expr(
          s"CASE WHEN size(t) = 0 THEN array() " +
            s"ELSE transform(sequence(0, CAST((size(t) - 1) DIV $blockTokens AS INT)), " +
            s"k -> array_join(slice(t, k * $blockTokens + 1, $blockTokens), ' ')) END"))
          .as(Seq("bpos", "block")))
      val kept = blocks.withColumn("rn", row_number().over(
          Window.partitionBy("block").orderBy(idCol, "bpos")))
        .filter(col("rn") === 1)
      val rebuilt = kept.groupBy(idCol).agg(
          sort_array(collect_list(struct(col("bpos"), col("block")))).as("arr"))
        .select(col(idCol),
          expr("array_join(transform(arr, x -> x.block), ' ')").as("__rebuilt"))
      df.drop(textCol).join(rebuilt, Seq(idCol), "left")
        .withColumn(textCol, coalesce(col("__rebuilt"), lit("")))
        .drop("__rebuilt")
    }

    /** Flesch reading-ease signals (d42's formula): integer regexp
      * counts plus the score and a coarse band. Row-local, zero shuffle.
      */
    def withReadability(textCol: String = "text"): DataFrame = {
      val t = col(textCol)
      val words = expr(s"regexp_count($textCol, '\\\\S+')")
      val sents = greatest(expr(s"regexp_count($textCol, '[.!?]+')"), lit(1))
      val sylls = greatest(expr(s"regexp_count(lower($textCol), '[aeiouy]+')"), lit(1))
      df.withColumn("words", words)
        .withColumn("sentences", sents)
        .withColumn("syllables", sylls)
        .withColumn("flesch", when(col("words") > 0, round(
          lit(206.835)
            - lit(1.015) * col("words").cast("double") / col("sentences").cast("double")
            - lit(84.6) * col("syllables").cast("double") / col("words").cast("double"), 6)))
        .withColumn("read_band",
          when(col("flesch").isNull, lit(null).cast("string"))
            .when(col("flesch") >= 60, "easy")
            .when(col("flesch") >= 30, "medium").otherwise("hard"))
    }

    /** KMV distinct-cardinality sketch per group (d43): K smallest
      * portable md5-60bit hashes of the distinct values. Deterministic
      * integer state — reproducible across engines/retries — and
      * mergeable by keeping the K smallest of a union. Returns one row
      * per group: (group, k_used, kth_hash, est).
      */
    def distinctSketch(
        groupCol: String, valueCol: String, k: Int = 64): DataFrame = {
      val hashes = df
        .select(col(groupCol),
          conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10)
            .cast("bigint").as("h"))
        .distinct()
      val w = Window.partitionBy(groupCol).orderBy("h")
      hashes.withColumn("r", row_number().over(w)).filter(col("r") <= k)
        .groupBy(groupCol)
        .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_hash"))
        .withColumn("est", when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * lit(1152921504606846976.0) /
            col("kth_hash").cast("double"), 4)))
    }

    /** Sliding-window chunking for RAG / sequence prep (d48): `width`-
      * token chunks on a `stride`-token stride, each fingerprinted with
      * the portable md5-60bit hash of its joined text. Row-local end to
      * end — zero shuffle at any corpus size.
      */
    def chunkSliding(
        idCol: String = "doc_id", textCol: String = "text",
        width: Int = 64, stride: Int = 48): DataFrame = {
      require(stride > 0 && width >= stride, "need 0 < stride <= width")
      df.select(col(idCol),
          expr(s"filter(split(lower($textCol), '\\\\s+'), x -> x <> '')").as("toks"))
        .select(col(idCol), size(col("toks")).as("n"), col("toks"))
        .filter(col("n") > 0)
        .select(col(idCol), col("n"), col("toks"),
          explode(sequence(lit(0),
            floor((col("n") - 1) / lit(stride)).cast("int"))).as("k"))
        .select(col(idCol), col("k").as("chunk_idx"),
          least(lit(width), col("n") - col("k") * stride).as("n_tokens"),
          conv(substring(
            md5(array_join(slice(col("toks"), col("k") * stride + 1, lit(width)), " ")),
            1, 15), 16, 10).cast("bigint").as("fp"))
    }

    /** DSIR importance weights (d49): hashed word-bigram features in
      * `buckets` signed buckets, add-one-smoothed target/raw bucket
      * log-likelihood ratio, per-doc importance = Σ λ. λ is integer-
      * scaled before the sum (exact under any partitioning); the weight
      * table broadcasts. `isTarget` marks the target-domain rows; every
      * other row gets scored.
      */
    def dsirWeights(
        isTarget: Column, idCol: String = "doc_id", textCol: String = "text",
        buckets: Int = 1024): DataFrame = {
      def sh2(c: Column) = ColumnBridge.column(
        graft.functions.ShingleHashesMd5(ColumnBridge.expression(c), 2))
      val grams = df
        .select(col(idCol), isTarget.as("is_t"), explode(sh2(col(textCol))).as("h"))
        .select(col(idCol), col("is_t"), expr(s"h % $buckets").as("b"))
      val tgt = grams.filter(col("is_t"))
      val raw = grams.filter(!col("is_t"))
      val lam = tgt.groupBy("b").agg(count(lit(1)).as("ct"))
        .join(raw.groupBy("b").agg(count(lit(1)).as("cr")), Seq("b"), "full_outer")
        .crossJoin(broadcast(tgt.agg(count(lit(1)).as("nt"))))
        .crossJoin(broadcast(raw.agg(count(lit(1)).as("nr"))))
        .select(col("b"), expr(
          s"""CAST(round((ln((coalesce(ct, CAST(0 AS BIGINT)) + 1)
             |    / CAST(nt + $buckets AS DOUBLE))
             |  - ln((coalesce(cr, CAST(0 AS BIGINT)) + 1)
             |    / CAST(nr + $buckets AS DOUBLE))) * 1000000) AS BIGINT)""".stripMargin)
          .as("lam"))
      raw.join(broadcast(lam), "b")
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_grams"), sum(col("lam")).as("w_sum"))
        .withColumn("avg_w",
          round(col("w_sum").cast("double") / col("n_grams") / 1e6, 6))
    }

    /** SemDeDup (d47): centroid-cell semantic dedup over an embedding
      * column — see [[graft.operators.Dedup.semDedup]]. Returns
      * (id, cid, kept) for every vector. `cap` bounds any cell's
      * pairwise term via sorted-neighborhood rank-chunking.
      */
    def semDedup(
        centroids: DataFrame, idCol: String = "vec_id",
        vecCol: String = "embedding", threshold: Double = 0.99,
        cap: Int = 512): DataFrame =
      Dedup.semDedup(df, idCol, vecCol, centroids, threshold, cap)

    /** First-seen n-gram novelty (d50): per doc, the fraction of its
      * word-`n`-gram hashes first seen there (by ascending id) — the
      * memorization/dedup-pressure curve. Only (hash, id) pairs shuffle.
      */
    def withNoveltyProfile(
        idCol: String = "doc_id", textCol: String = "text", n: Int = 5): DataFrame = {
      def sh(c: Column) = ColumnBridge.column(
        graft.functions.ShingleHashesMd5(ColumnBridge.expression(c), n))
      val grams = df.select(col(idCol), explode(sh(col(textCol))).as("h"))
      val first = grams.groupBy("h").agg(min(col(idCol)).as("first_doc"))
      grams.join(first, "h")
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col(idCol) === col("first_doc"), 1L).otherwise(0L)).as("n_novel"))
        .withColumn("novelty",
          round(col("n_novel").cast("double") / col("n_grams").cast("double"), 6))
    }

    /** Incremental near-dup ingest (d54): treat `df` as ONE
      * bookmark-batch of new documents, dedup it against the persisted
      * MinHash signature index at `indexRoot` (signatures computed for
      * this batch only; indexed text is never re-read; the index streams
      * — it never enters an exchange), and append the batch to the
      * index. Returns the verified near-dup pairs this batch ADDS —
      * accumulated pairs across ingests equal a one-shot
      * [[dedupNearMinHash]]-style run over everything ingested
      * (oracle-gated, d54). An empty/absent `indexRoot` bootstraps.
      *
      * EXACTLY-ONCE by default: the ingest runs under the epoch guard
      * ([[graft.operators.IncrementalIndex.ingestMinHashEpoch]]) keyed
      * by the BOOKMARK BOUNDARY — the batch's max id, a monotone
      * sequence under the append-ordered-id contract — with the pair
      * log persisted under `indexRoot/pairs`. A crash between the index
      * commit and the caller's bookmark commit (or any at-least-once
      * re-delivery) replays the batch; the replay drops instead of
      * double-appending and returns the epoch's ALREADY-COMMITTED
      * pairs, so the caller sees identical results either way. Pass
      * `epochId` to key on an external sequence instead (non-numeric
      * ids); an empty batch is a PURE no-op — no version written, no
      * epoch consumed, an empty pair frame back.
      */
    def ingestIntoDedupIndex(
        indexRoot: String, idCol: String = "doc_id",
        textCol: String = "text", epochId: Option[Long] = None): DataFrame = {
      val s = df.sparkSession
      val pairsRoot = IncrementalIndex.pairsRootOf(indexRoot)
      resolvedEpoch(idCol, epochId) match {
        case None => emptyResult("a" -> idType(idCol), "b" -> idType(idCol),
          "jaccard" -> org.apache.spark.sql.types.DoubleType)
        case Some(e) =>
          IncrementalIndex.ingestMinHashEpoch(
              s, indexRoot, pairsRoot, df, idCol, textCol, e)
            .getOrElse(replayedEpochRows(s, pairsRoot, e))
      }
    }

    /** Read-only near-dup PROBE (d70): exactly what
      * [[ingestIntoDedupIndex]] would emit for this frame, with NOTHING
      * committed — no version, no stats delta, no epoch consumed.
      * Admission control: check a batch against the corpus before
      * paying the write, from a pure reader that never contends with
      * the index's single writer.
      */
    def probeDedupIndex(indexRoot: String, idCol: String = "doc_id",
        textCol: String = "text"): DataFrame =
      IncrementalIndex.probeMinHash(df.sparkSession, indexRoot, df, idCol, textCol)

    /** Read-only exact-dedup probe: [[ingestIntoExactIndex]]'s verdicts
      * (id, fp, kept) with no fingerprint version written.
      */
    def probeExactIndex(indexRoot: String, idCol: String = "doc_id",
        textCol: String = "text"): DataFrame =
      IncrementalIndex.probeExact(df.sparkSession, indexRoot, df, idCol, textCol)

    /** Incremental SemDeDup ingest (e22): assign `df`'s vectors to the
      * index's FROZEN centroids and return (id, cid, kept) verdicts —
      * kept=false iff a lower-id same-cell member (already indexed or in
      * this batch) sits within `threshold`. Requires append-ordered ids
      * (the bookmark guarantee); bootstrap the index first with
      * [[graft.operators.IncrementalIndex.bootstrapSemDedup]].
      */
    def ingestIntoSemDedupIndex(
        indexRoot: String, idCol: String = "vec_id",
        vecCol: String = "embedding", threshold: Double = 0.99,
        cap: Int = 512, epochId: Option[Long] = None): DataFrame = {
      val s = df.sparkSession
      val verdictsRoot = IncrementalIndex.verdictsRootOf(indexRoot)
      resolvedEpoch(idCol, epochId) match {
        case None => emptyResult("id" -> idType(idCol),
          // cid's type comes from the index's own frozen centroid
          // snapshot (bootstrapping first is already this method's
          // contract), so the empty shape can't drift from the real one
          "cid" -> VersionedTable.read(
            s, IncrementalIndex.semCentroidsRoot(indexRoot)).schema("cid").dataType,
          "kept" -> org.apache.spark.sql.types.BooleanType)
        case Some(e) =>
          IncrementalIndex.ingestSemDedupEpoch(
              s, indexRoot, verdictsRoot, df, idCol, vecCol, threshold, e, cap)
            .map(_.verdicts)
            .getOrElse(replayedEpochRows(s, verdictsRoot, e))
      }
    }

    /** Incremental PQ-code ingest (e23): encode this batch with the
      * index's FROZEN codebooks and append the (id, codes) rows as the
      * next codes version — indexed vectors are never re-encoded.
      * Bootstrap the index first with
      * [[graft.operators.IncrementalIndex.bootstrapPq]]; search the
      * persisted codes with
      * [[graft.operators.IncrementalIndex.pqTopKIndexed]]. Returns the
      * committed codes version.
      */
    def ingestIntoPqIndex(
        indexRoot: String, idCol: String = "vec_id",
        vecCol: String = "embedding", epochId: Option[Long] = None): Long = {
      val s = df.sparkSession
      val codesRoot = IncrementalIndex.pqCodesRoot(indexRoot)
      resolvedEpoch(idCol, epochId) match {
        case None => // empty batch: no-op — the latest committed codes
          // version (-1 before any commit), nothing written
          VersionedTable.versions(s, codesRoot).lastOption.getOrElse(-1L)
        case Some(e) =>
          IncrementalIndex.ingestPqEpoch(s, indexRoot, df, idCol, vecCol, e)
            .getOrElse(replayedEpochVersion(s, codesRoot, e))
      }
    }

    /** Incremental sparse TF-IDF ingest (d55): tokenize and weigh `df`
      * under the index's FROZEN (df, N) stats and append its weight +
      * norm rows — indexed docs are never re-tokenized (the one-shot
      * pipeline's dominant cost at scale). Bootstrap the index first
      * with [[graft.operators.IncrementalIndex.bootstrapTfidf]]; score
      * from the persisted log with
      * [[graft.operators.IncrementalIndex.sparseCosineIndexed]].
      * Returns the committed weights version.
      */
    def ingestIntoTfidfIndex(
        indexRoot: String, idCol: String = "doc_id",
        textCol: String = "text", epochId: Option[Long] = None): Long = {
      val s = df.sparkSession
      val wRoot = IncrementalIndex.weightsRoot(indexRoot)
      resolvedEpoch(idCol, epochId) match {
        case None => // empty batch: no-op — the latest committed weights
          // version (-1 before any commit), nothing written
          VersionedTable.versions(s, wRoot).lastOption.getOrElse(-1L)
        case Some(e) =>
          IncrementalIndex.ingestTfidfEpoch(s, indexRoot, df, idCol, textCol, e)
            .getOrElse(replayedEpochVersion(s, wRoot, e))
      }
    }

    /** Incremental SimHash ingest (d58): sign ONLY this batch (portable
      * 60-bit signatures), return the verified near-dup pairs it adds
      * (hamming ≤ `maxHamming`, batch-internal + batch×index), and
      * append the batch's signatures. Accumulated pairs across ingests
      * equal a one-shot [[graft.operators.Dedup.simHashPairsPortable]]
      * run over everything ingested. An empty/absent root bootstraps.
      */
    def ingestIntoSimHashIndex(
        indexRoot: String, idCol: String = "doc_id",
        textCol: String = "text", maxHamming: Int = 3,
        epochId: Option[Long] = None): DataFrame = {
      val s = df.sparkSession
      val pairsRoot = IncrementalIndex.pairsRootOf(indexRoot)
      resolvedEpoch(idCol, epochId) match {
        case None => emptyResult("a" -> idType(idCol), "b" -> idType(idCol),
          "hamming" -> org.apache.spark.sql.types.IntegerType)
        case Some(e) =>
          IncrementalIndex.ingestSimHashEpoch(
              s, indexRoot, pairsRoot, df, idCol, textCol, e, maxHamming)
            .getOrElse(replayedEpochRows(s, pairsRoot, e))
      }
    }

    /** Incremental perceptual-hash image dedup (d77): the frame carries
      * PRECOMPUTED 64-bit signatures (`sigCol`, e.g.
      * [[graft.operators.Multimodal.imageAHash]] over the media bytes —
      * decode stays in the caller's column-pruned pipeline, the index
      * never stores pixels), and the SimHash machinery indexes them:
      * returns the batch's new (a, b, hamming ≤ `maxHamming`) pairs
      * under the same exactly-once epoch guard as every other wrapper.
      */
    def ingestIntoImageHashIndex(
        indexRoot: String, idCol: String = "doc_id",
        sigCol: String = "ahash", maxHamming: Int = 3,
        epochId: Option[Long] = None): DataFrame = {
      val s = df.sparkSession
      val pairsRoot = IncrementalIndex.pairsRootOf(indexRoot)
      resolvedEpoch(idCol, epochId) match {
        case None => emptyResult("a" -> idType(idCol), "b" -> idType(idCol),
          "hamming" -> org.apache.spark.sql.types.IntegerType)
        case Some(e) =>
          IncrementalIndex.ingestImageHashesEpoch(
              s, indexRoot, pairsRoot, df, idCol, sigCol, e, maxHamming)
            .getOrElse(replayedEpochRows(s, pairsRoot, e))
      }
    }

    /** Incremental exact-dedup ingest (d57): fingerprint this batch,
      * return (id, fp, kept) verdicts against the persisted fingerprint
      * log (kept=false iff the fp is already indexed or a lower-id batch
      * member shares it), and append the batch's fingerprints. Requires
      * append-ordered ids (the bookmark guarantee) — accumulated
      * verdicts then equal [[dedupExact]]'s keep-the-min rule.
      */
    def ingestIntoExactIndex(
        indexRoot: String, idCol: String = "doc_id",
        textCol: String = "text", epochId: Option[Long] = None): DataFrame = {
      val s = df.sparkSession
      val verdictsRoot = IncrementalIndex.verdictsRootOf(indexRoot)
      resolvedEpoch(idCol, epochId) match {
        case None => emptyResult("id" -> idType(idCol),
          "fp" -> org.apache.spark.sql.types.StringType,
          "kept" -> org.apache.spark.sql.types.BooleanType)
        case Some(e) =>
          IncrementalIndex.ingestExactEpoch(
              s, indexRoot, verdictsRoot, df, idCol, textCol, e)
            .getOrElse(replayedEpochRows(s, verdictsRoot, e))
      }
    }

    /** Incremental EXACT set-similarity ingest (d59): shingle this
      * batch (word `shingleN`-grams, md5-hashed elements), find the
      * exact Jaccard ≥ `num`/`den` pairs it adds against the persisted
      * prefix-filter index (element order FROZEN at bootstrap — sound
      * because the prefix-filter lemma holds under any shared total
      * order), and append the batch's sorted token rows. Accumulated
      * pairs across ingests equal a one-shot
      * [[graft.operators.Dedup.prefixJaccardJoin]] over everything
      * ingested, integer (inter, un) witnesses included. An
      * empty/absent root bootstraps (freezing element df from this
      * batch).
      */
    def ingestIntoPrefixIndex(
        indexRoot: String, idCol: String = "doc_id",
        textCol: String = "text", num: Int = 4, den: Int = 5,
        shingleN: Int = 5, epochId: Option[Long] = None): DataFrame = {
      def sh(c: Column) = ColumnBridge.column(
        graft.functions.ShingleHashesMd5(ColumnBridge.expression(c), shingleN))
      val s = df.sparkSession
      val sets = df
        .select(col(idCol).as("id"), explode(sh(col(textCol))).as("elem"))
        .distinct()
      val p = IncrementalIndex.PrefixJaccardParams(num = num, den = den)
      val pairsRoot = IncrementalIndex.pairsRootOf(indexRoot)
      resolvedEpoch(idCol, epochId) match {
        case None => emptyResult("ia" -> idType(idCol), "ib" -> idType(idCol),
          "inter" -> org.apache.spark.sql.types.LongType,
          "un" -> org.apache.spark.sql.types.LongType)
        case Some(e) =>
          IncrementalIndex.ingestPrefixJaccardEpoch(s, indexRoot, pairsRoot, sets, e, p)
            .getOrElse(replayedEpochRows(s, pairsRoot, e))
      }
    }

    /** Retract this frame's ids from an incremental index (d56 —
      * takedown / right-to-be-forgotten): one O(ids) tombstone version;
      * every later index read and ingest excludes them. Physical removal
      * is the purge family
      * ([[graft.operators.IncrementalIndex.purgeDedupIndex]] etc.);
      * filter caller-owned pair logs with
      * [[graft.operators.IncrementalIndex.retractPairs]].
      */
    def retractFromIndex(
        indexRoot: String, idCol: String = "doc_id"): Long =
      graft.operators.IncrementalIndex.retract(
        df.sparkSession, indexRoot, df, idCol)

    /** Graded contamination (d52): per doc, the fraction of its
      * word-`n`-gram hashes present anywhere in `heldOut` — the graded
      * sibling of [[decontaminateAgainst]]'s binary drop. Held-out
      * hashes broadcast; only (id, hash) pairs shuffle.
      */
    def contaminationAgainst(
        heldOut: DataFrame, idCol: String = "doc_id", textCol: String = "text",
        n: Int = 5): DataFrame = {
      def sh(c: Column) = ColumnBridge.column(
        graft.functions.ShingleHashesMd5(ColumnBridge.expression(c), n))
      val test = broadcast(
        heldOut.select(explode(sh(col(textCol))).as("h")).distinct()
          .withColumn("hit", lit(1L)))
      df.select(col(idCol), explode(sh(col(textCol))).as("h"))
        .join(test, Seq("h"), "left")
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
        .withColumn("contam_frac",
          round(col("n_contaminated").cast("double") / col("n_grams").cast("double"), 6))
    }
  }
}
