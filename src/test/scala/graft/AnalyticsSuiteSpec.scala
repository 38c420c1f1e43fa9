package graft

import graft.streaming.StreamingUpsert
import org.apache.spark.sql.functions._

/** Specs for the round-3 analytics batch: moment statistics, funnel,
  * cohort retention, gap-fill interpolation, k-means, boilerplate
  * detection, and the streaming upsert sink.
  */
class AnalyticsSuiteSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q51: moment-formula corr/slope/stddev agree with Spark's built-ins") {
    val ours = run("q51_corr_stats").collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(5))).toMap
    val ref = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        regr_slope(col("l_extendedprice"), col("l_quantity")).as("m"),
        stddev_samp(col("l_quantity")).as("sd"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(ours.keySet == ref.keySet)
    for ((k, (c, m, sd)) <- ours) {
      val (rc, rm, rsd) = ref(k)
      assert(math.abs(c - rc) < 1e-6, s"$k corr $c vs $rc")
      assert(math.abs(m - rm) < 1e-6, s"$k slope $m vs $rm")
      assert(math.abs(sd - rsd) < 1e-6, s"$k stddev $sd vs $rsd")
    }
  }

  test("q52: funnel stages are monotonically non-increasing") {
    val r = run("q52_funnel").head()
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"$v >= $c >= $p")
    assert(v > 0)
  }

  test("q53: day-0 cohort cells cover every user exactly once") {
    val cells = run("q53_cohort_retention").collect()
    val day0 = cells.filter(_.getInt(1) == 0).map(_.getLong(2)).sum
    val users = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count()
    assert(day0 == users, s"day-0 total $day0 != $users users")
    assert(cells.forall(_.getLong(2) <= users))
  }

  test("q54: spine is dense per series, observed points pass through, gaps interpolate between neighbors") {
    val rows = run("q54_gap_fill").collect()
    val bySeries = rows.groupBy(_.getString(0))
    for ((_, rs) <- bySeries) {
      val hrs = rs.map(_.getLong(1)).sorted
      assert(hrs.last - hrs.head + 1 == hrs.length, "spine has holes")
      // ends are observed (spine spans known points)
      assert(rs.minBy(_.getLong(1)).getInt(3) == 1)
      assert(rs.maxBy(_.getLong(1)).getInt(3) == 1)
      val byHr = rs.map(r => r.getLong(1) -> r).toMap
      for (r <- rs if r.getInt(3) == 0) {
        val hr = r.getLong(1)
        val prev = (hr - 1 to hrs.head by -1).find(byHr(_).getInt(3) == 1).get
        val next = (hr + 1 to hrs.last).find(byHr(_).getInt(3) == 1).get
        val (pv, nv) = (byHr(prev).getDouble(2), byHr(next).getDouble(2))
        val v = r.getDouble(2)
        assert(v >= math.min(pv, nv) - 1e-6 && v <= math.max(pv, nv) + 1e-6,
          s"hr=$hr v=$v outside [$pv, $nv]")
      }
    }
  }

  test("e11: clusters partition the corpus; every centroid lands in its own cluster") {
    val rows = run("e11_kmeans_assign").collect()
    assert(rows.map(_.getLong(1)).sum == 500)
    assert(rows.length <= 8)
    // a centroid's own vector has sim 1.0 with itself, so cluster cid
    // contains vec_id == cid; min member id can only be smaller
    for (r <- rows) assert(r.getLong(2) <= r.getLong(0), r.toString)
    for (r <- rows) assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
  }

  test("e12: one Lloyd step conserves points") {
    val rows = run("e12_kmeans_step").collect()
    assert(rows.map(_.getLong(1)).sum == 500, "n_before must cover the corpus")
    assert(rows.map(_.getLong(2)).sum == 500, "n_after must cover the corpus")
  }

  test("d27: boilerplate counts bound by gram counts, fraction in [0,1]") {
    val rows = run("d27_boilerplate_ngrams").collect()
    assert(rows.length == 500)
    for (r <- rows) {
      assert(r.getLong(2) <= r.getLong(1))
      val f = r.getDouble(3)
      assert(f >= 0.0 && f <= 1.0)
    }
    // the corpus-wide threshold must actually split: some boilerplate,
    // some rare grams (guards a degenerate all-or-nothing cut)
    assert(rows.exists(_.getLong(2) > 0))
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)))
  }

  test("q57: multiset intersect/except counts match a by-hand bag computation") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderstatus", "o_custkey").collect()
    def bag(st: String) = orders.filter(_.getString(0) == st)
      .groupBy(_.getLong(1)).map { case (k, v) => k -> v.length }
    val (f, o) = (bag("F"), bag("O"))
    val expectI = f.flatMap { case (k, n) => o.get(k).map(k -> math.min(n, _)) }
    val expectE = f.flatMap { case (k, n) =>
      val d = n - o.getOrElse(k, 0); if (d > 0) Some(k -> d) else None }
    val got = run("q57_set_ops_all").collect()
      .groupBy(_.getString(2))
      .map { case (op, rs) => op -> rs.map(r => r.getLong(0) -> r.getLong(1).toInt).toMap }
    assert(got("intersect_all") == expectI.toMap)
    assert(got("except_all") == expectE.toMap)
  }

  test("d28: confusion matrix cells cover the corpus; classifier beats chance") {
    val rows = run("d28_langid_confusion").collect()
    assert(rows.map(_.getLong(2)).sum == 500)
    val correct = rows.filter(r => r.getString(0) == r.getString(1)).map(_.getLong(2)).sum
    assert(correct > 100, s"diagonal only $correct of 500")
  }

  test("IncrementalJoin: prior + delta terms equals the full re-join, row for row") {
    import graft.operators.IncrementalJoin
    val a = (1 to 10).map(k => (k.toLong, s"a$k")).toDF("k", "av")
    val b = (4 to 12).flatMap(k => Seq((k.toLong, s"b$k-1"), (k.toLong, s"b$k-2")))
      .toDF("k", "bv")
    val (aOld, aDelta) = (a.filter(col("k") <= 7), a.filter(col("k") > 7))
    val (bOld, bDelta) = (b.filter(col("bv").endsWith("-1")), b.filter(col("bv").endsWith("-2")))
    val maintained = IncrementalJoin.maintained(aOld, aDelta, bOld, bDelta, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val full = a.join(b, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(maintained.sameElements(full) && full.nonEmpty)
  }

  test("DataQuality.audit counts exactly the planted violations") {
    import graft.operators.DataQuality._
    val df = Seq(
      (Some(1L), Some(10.0), "O"),
      (Some(2L), Some(-5.0), "O"),   // range violation
      (None, Some(20.0), "F"),       // null violation
      (Some(2L), Some(30.0), "X"),   // dup key + bad status
      (Some(4L), None, "P")          // null price = range violation
    ).toDF("k", "price", "status")
    val out = audit(df, Seq(
        NotNull("k"), InRange("price", 0, 100),
        AcceptedValues("status", Seq("O", "F", "P")), Unique(Seq("k"))))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out("not_null:k") == ((1L, 5L, false)))
    assert(out("in_range:price") == ((2L, 5L, false)))
    assert(out("accepted:status") == ((1L, 5L, false)))
    // countDistinct skips the null key: 4 non-null keys, 3 distinct
    assert(out("unique:k") == ((1L, 5L, false)))
    val clean = audit(df.filter(col("k") === 1), Seq(NotNull("k"), Unique(Seq("k"))))
      .collect()
    assert(clean.forall(_.getBoolean(3)), "clean slice passes every check")
  }

  test("JaroWinkler: textbook values, DuckDB's integer-half transposition rule") {
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      graft.functions.JaroWinkler.score(
        UTF8String.fromString(a), UTF8String.fromString(b))
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-9)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-9)
    assert(jw("abcdef", "abcdef") == 1.0)
    assert(jw("", "") == 1.0 && jw("a", "") == 0.0)
    // len-3 strings have a zero match window: a full rotation scores 0
    assert(jw("abc", "bca") == 0.0)
    // no boost at or below jaro 0.7: crate/trace shares no prefix
    assert(math.abs(jw("crate", "trace") - 0.7333333333333333) < 1e-9)
    // SQL registration through the extension
    val r = spark.sql("SELECT round(graft_jaro_winkler('martha', 'marhta'), 6) AS j")
      .head().getDouble(0)
    assert(r == 0.961111)
  }

  test("NormalizeUnicode: composed and decomposed forms converge under NFC") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def nfc(c: org.apache.spark.sql.Column) = ColumnBridge.column(
      graft.functions.NormalizeUnicode(ColumnBridge.expression(c), "NFC"))
    val df = Seq(
      (1L, "caf\u00e9"),   // composed
      (2L, "cafe\u0301"),  // decomposed, same text
      (3L, "plain ascii")
    ).toDF("id", "t")
    val out = df.select(col("id"), nfc(col("t")).as("n"), length(nfc(col("t"))).as("l"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out(1L) == out(2L), "NFC must unify composed/decomposed")
    assert(out(1L)._2 == 4)
    assert(out(3L)._1 == "plain ascii")
    intercept[IllegalArgumentException] {
      graft.functions.NormalizeUnicode(
        ColumnBridge.expression(col("t")), "BOGUS")
    }
  }

  test("d29: entropy bounded by ln(n_terms); uniform text hits the bound") {
    val rows = run("d29_token_entropy").collect()
    assert(rows.length == 500)
    for (r <- rows) {
      val (nt, h) = (r.getLong(1), r.getDouble(2))
      assert(h >= 0.0 && h <= math.log(nt.toDouble) + 1e-4,
        s"doc ${r.getLong(0)}: H=$h outside [0, ln($nt)]")
    }
    // hand-check one distribution: 2x 'a', 1x 'b' -> H = ln3 - (2/3)ln2
    val df = Seq((1L, "a a b")).toDF("doc_id", "text")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val tc = ColumnBridge.column(
      graft.functions.TermCounts(ColumnBridge.expression(col("text"))))
    val got = df.select(col("doc_id"), tc.as("tc")).collect()
    assert(got.head.getMap[String, Int](1).toMap == Map("a" -> 2, "b" -> 1))
  }

  test("ev11: every event contributes exactly 4 hour boundaries") {
    val total = run("ev11_interval_overlap").agg(sum("n_active")).head().getLong(0)
    val events = spark.read.parquet(s"$dir/events.parquet").count()
    assert(total == 4 * events)
  }

  test("q60: HOF results match a direct Scala computation on one vector") {
    val row = run("q60_array_hof").filter(col("vec_id") === 7).head()
    val vec = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === 7).head().getSeq[Float](1)
    val sq = vec.map(x => math.floor(x.toDouble * x.toDouble * 1e6).toLong).sum
    assert(row.getLong(1) == sq)
    assert(row.getInt(2) == vec.count(_ > 0f))
    assert(row.getDouble(3) == vec.max.toDouble)
    assert(row.getLong(4) == vec.indexOf(vec.max) + 1)
  }

  test("q61: discrete percentiles are actual data values; median between them") {
    val prices = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderstatus", "o_totalprice").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toSet)
    for (r <- run("q61_median_disc").collect()) {
      val vals = prices(r.getString(0))
      assert(vals.contains(r.getDouble(2)), "p90_disc must be a data value")
      assert(vals.contains(r.getDouble(3)), "p10_disc must be a data value")
      assert(r.getDouble(3) <= r.getDouble(1) && r.getDouble(1) <= r.getDouble(2))
    }
  }

  test("d31: Count-Min estimates never undercount; overestimates bounded") {
    val rows = run("d31_countmin_sketch").collect()
    val totalTokens = spark.read.parquet(s"$dir/documents.parquet")
      .select(graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    for (r <- rows) {
      val (term, est, exact) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= exact, s"$term: CMS must never undercount ($est < $exact)")
      // d=4 independent rows, w=256 buckets: collision mass per row is at
      // most N/w in expectation; 8x slack keeps this deterministic-safe
      assert(est - exact <= 8 * totalTokens / 256,
        s"$term: overestimate ${est - exact} implausibly large")
    }
    assert(rows.exists(r => r.getString(0) == "zzz_absent" && r.getLong(2) == 0))
  }

  test("StreamingUpsert.merge is latest-wins and idempotent") {
    val state = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ver")
    val batch = Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("k", "v", "ver")
    val once = StreamingUpsert.merge(state, batch, Seq("k"), "ver")
    val expected = Set((1L, "a", 1L), (2L, "b2", 2L), (3L, "c", 2L))
    assert(once.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      == expected)
    val twice = StreamingUpsert.merge(once, batch, Seq("k"), "ver")
    assert(twice.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      == expected)
  }

  test("StreamingUpsert recovers state stranded at _retired by a mid-swap crash") {
    // simulate a death between rename(cur -> _retired) and
    // rename(tmp -> cur): the good state sits at _retired with no cur.
    // The next drained batch must restore it BEFORE merging, or every key
    // not in that batch would be silently lost.
    val stateDir = java.nio.file.Files.createTempDirectory("graft-ups-rec").toString
    val inDir = java.nio.file.Files.createTempDirectory("graft-ups-in").toString
    val chunk1 = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ver")
    chunk1.coalesce(1).write.parquet(s"$inDir/c1")
    val schema = chunk1.schema
    val q1 = StreamingUpsert.start(spark, s"$inDir/c1", schema, Seq("k"), "ver", stateDir)
    q1.awaitTermination()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(stateDir), spark.sparkContext.hadoopConfiguration)
    // manufacture the crash window
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$stateDir/data"),
      new org.apache.hadoop.fs.Path(s"$stateDir/_retired")))
    // second drain: only key 3 arrives (flat file — the source does not
    // recurse into subdirectories)
    Seq((3L, "c", 2L)).toDF("k", "v", "ver")
      .coalesce(1).write.parquet(s"$inDir/c2")
    java.nio.file.Files.list(java.nio.file.Paths.get(s"$inDir/c2")).forEach { p =>
      if (p.toString.endsWith(".parquet"))
        java.nio.file.Files.copy(p,
          java.nio.file.Paths.get(s"$inDir/c1/extra.parquet"))
    }
    val q2 = StreamingUpsert.start(spark, s"$inDir/c1", schema, Seq("k"), "ver", stateDir)
    q2.awaitTermination()
    val state = spark.read.parquet(s"$stateDir/data")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(state == Set((1L, "a"), (2L, "b"), (3L, "c")),
      s"keys 1/2 must survive the simulated crash, got $state")
  }

  test("st9: streaming upsert end-to-end matches a batch replay") {
    val r = run("st9_stream_upsert").head()
    val base = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_totalprice").cast("decimal(18,2)").as("p"))
    val nBase = base.count()
    val nIns = base.filter(col("k") % 17 === 0).count()
    val nUpd = base.filter(col("k") % 7 === 0).count()
    assert(r.getLong(0) == nBase + nIns, "state size = snapshot + inserts")
    assert(r.getLong(3) == nUpd, "every %7 key carries version 2")
    assert(r.getLong(4) == nIns, "every insert carries version 3")
  }

  test("q82: recursive walk covers every part exactly once, depth = digits - 1") {
    val rows = run("q82_recursive_cte").collect()
    val parts = spark.read.parquet(s"$dir/part.parquet")
    val n = parts.count()
    val maxKey = parts.agg(max("p_partkey")).head().getLong(0)
    // keys are contiguous from 1, so every key's div-10 parent chain exists
    // down to a root < 10: the forest must partition the whole table
    assert(rows.map(_.getLong(1)).sum == n, "every part reached exactly once")
    assert(rows.forall(_.getLong(0) < 10), "roots are single-digit keys")
    val expectedDepth = maxKey.toString.length - 1
    assert(rows.map(_.getInt(2)).max == expectedDepth,
      s"deepest walk = digit count - 1 = $expectedDepth")
  }

  test("q83: union by name null-fills exactly the columns each side lacks") {
    val rows = run("q83_union_by_name").collect()
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val nA = o.filter(col("o_orderkey") % 3 === 0).count()
    val nB = o.filter(col("o_orderkey") % 3 === 1).count()
    assert(rows.length == nA + nB)
    val cents = rows.head.fieldIndex("cents")
    val prio = rows.head.fieldIndex("o_orderpriority")
    assert(rows.forall(r => r.isNullAt(cents) != r.isNullAt(prio)),
      "each row has exactly one side's extra column")
    assert(rows.count(_.isNullAt(prio)) == nA, "side A rows carry cents only")
  }

  test("ev16: every matched triple is type-correct, ordered, and within 24h steps") {
    val ev = SparkEntry.normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
      .select(col("event_id"), col("event_type"), col("ts"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getTimestamp(2).getTime)).toMap
    val rows = run("ev16_pattern_match").collect()
    assert(rows.nonEmpty, "the pattern occurs in the fixture")
    rows.foreach { r =>
      val (vt, vts) = ev(r.getLong(1)); val (ct, cts) = ev(r.getLong(2))
      val (pt, pts) = ev(r.getLong(3))
      assert(vt == "view" && ct == "click" && pt == "purchase")
      assert(vts <= cts && cts <= pts, "steps are time-ordered")
      assert(cts - vts <= 86400000L && pts - cts <= 86400000L, "each step within 24h")
    }
  }

  test("ev17: truncated EWMA replays the 8-term weighted sum per user") {
    val ev = SparkEntry.normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tsm"),
        round(col("value") * 100, 0).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = ev.groupBy(_._2).view.mapValues(_.sortBy(e => (e._3, e._1))).toMap
    val got = run("ev17_ewma").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // spot-check every event of the heaviest user
    val (_, hist) = byUser.maxBy(_._2.length)
    hist.zipWithIndex.foreach { case ((eid, _, _, _), i) =>
      val lags = (0 until 8).flatMap(k => if (i - k >= 0) Some((k, hist(i - k)._4)) else None)
      val num = lags.map { case (k, v) => v * (1L << (7 - k)) }.sum
      val den = lags.map { case (k, _) => 1L << (7 - k) }.sum
      val want = BigDecimal(num.toDouble / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(eid) - want) < 1e-9, s"event $eid: ${got(eid)} vs $want")
    }
  }

  test("d43: the KMV estimate tracks the exact per-source cardinality") {
    val exact = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("source").agg(countDistinct(col("text")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = run("d43_kmv_sketch").collect()
    for (r <- rows if r.getString(0) != "__all__") {
      val (src, kUsed, est) = (r.getString(0), r.getLong(1), r.getDouble(3))
      val n = exact(src).toDouble
      assert(kUsed == math.min(64L, exact(src)), s"$src k_used")
      // KMV relative error ~ 1/sqrt(K-2) ≈ 13%; allow 4 sigma
      assert(math.abs(est - n) / n < 0.52, s"$src est=$est exact=$n")
    }
    val all = rows.find(_.getString(0) == "__all__").get
    val union = exact.values.sum.toDouble // sources don't share texts here
    assert(math.abs(all.getDouble(3) - union) / union < 0.52,
      s"merged est=${all.getDouble(3)} exact=$union")
  }

  test("q87: BFS distances start at the two roots and grow by at most 1 per hop") {
    val rows = run("q87_bfs_distance").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.values.count(_ == 0) == 2, "exactly the two seed nodes at distance 0")
    assert(rows.values.forall(d => d >= 0 && d <= 3))
    // distance-d nodes (d>0) exist only if some distance-(d-1) node exists
    for (d <- 1 to rows.values.max)
      assert(rows.values.exists(_ == d - 1), s"gap below distance $d")
  }

  test("q88: integer PageRank is partition-independent and mass-bounded") {
    val a = run("q88_pagerank").collect().map(r => r.getLong(0) -> r.getLong(1))
    // deterministic: a second run (different plan instance) is identical
    val b = run("q88_pagerank").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(a.sameElements(b))
    assert(a.nonEmpty)
    // every node keeps at least the teleport mass; floor division only
    // loses mass, so no node can exceed the scaled total
    assert(a.forall(_._2 >= 150000L))
    val total = a.map(_._2).sum
    assert(total <= a.length * 1000000L + 1,
      s"rank mass $total exceeds ${a.length} nodes' initial mass")
  }

  test("d42: Flesch score replays the formula over exact regexp counts") {
    val doc = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).head()
    val text = doc.getString(1)
    val words = "\\S+".r.findAllIn(text).size
    val sents = math.max("[.!?]+".r.findAllIn(text).size, 1)
    val sylls = math.max("[aeiouy]+".r.findAllIn(text.toLowerCase).size, 1)
    val want = BigDecimal(206.835 - 1.015 * words.toDouble / sents
        - 84.6 * sylls.toDouble / words)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = run("d42_readability").filter(col("doc_id") === doc.getLong(0)).head()
    assert(got.getInt(1) == words && got.getInt(2) == sents && got.getInt(3) == sylls)
    assert(math.abs(got.getDouble(4) - want) < 1e-9)
  }
}
