package graft

import graft.config.{ConfigError, TableConfig, TableResolution, SortOrder}

/** SQL-registered custom functions (GraftExtensions) and C6 table
  * resolution semantics.
  */
class ExtensionsSpec extends SparkSpec {

  test("graft_cosine is callable from SQL") {
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c," +
        " graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS o").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("graft_zorder interleaves bits; monotone on each axis; SQL-callable") {
    import graft.functions.ZOrder2
    // golden interleaves: (x=0b11, y=0b00) -> 0b0101; (0b00, 0b11) -> 0b1010
    assert(ZOrder2.interleave(3, 0) == 5L)
    assert(ZOrder2.interleave(0, 3) == 10L)
    assert(ZOrder2.interleave(0xFFFF, 0xFFFF) == 0xFFFFFFFFL)
    // matches the explicit 16-term bit sum the oracle uses
    def slowInterleave(x: Long, y: Long): Long =
      (0 until 16).map(b =>
        (((x >> b) & 1) << (2 * b)) | (((y >> b) & 1) << (2 * b + 1))).reduce(_ | _)
    for (x <- Seq(0L, 1L, 7L, 255L, 4096L, 65535L); y <- Seq(0L, 2L, 100L, 65535L))
      assert(ZOrder2.interleave(x, y) == slowInterleave(x, y), s"($x, $y)")
    val r = spark.sql("SELECT graft_zorder(3, 0) AS a, graft_zorder(0L, 3L) AS b").head()
    assert(r.getLong(0) == 5L && r.getLong(1) == 10L)
  }

  test("graft_url_canon: case, default ports, param sort, fragments, edge cases") {
    import graft.functions.UrlCanonicalize.canonicalize
    assert(canonicalize("HTTPS://WWW.Example.COM:443/A/b?z=1&a=2#frag") ==
      "https://www.example.com/A/b?a=2&z=1")
    // non-default port survives; http default port stripped
    assert(canonicalize("http://host:8080/p") == "http://host:8080/p")
    assert(canonicalize("HTTP://Host:80/p") == "http://host/p")
    // duplicate keys keep arrival order (stable sort)
    assert(canonicalize("https://h/p?b=2&a=1&b=0") == "https://h/p?a=1&b=2&b=0")
    // empty query and bare authority
    assert(canonicalize("https://H?") == "https://h")
    assert(canonicalize("https://H#x") == "https://h")
    // malformed input passes through
    assert(canonicalize("not a url") == "not a url")
    val r = spark.sql(
      "SELECT graft_url_canon('HTTP://A:80/x?b=1&a=2#f') AS u").head().getString(0)
    assert(r == "http://a/x?a=2&b=1")
  }

  test("graft_srp_signature / graft_minhash / graft_simhash from SQL") {
    val sig = spark.sql(
      "SELECT graft_srp_signature(array(0.5D, -0.2D), 2, 4, 8, 7) AS s").head().getSeq[Long](0)
    assert(sig.length == 4)
    val mh = spark.sql(
      "SELECT graft_minhash(xxhash64(v), 16, 42) AS sig FROM VALUES ('a'), ('b') AS t(v)")
      .head().getSeq[Long](0)
    assert(mh.length == 16 && mh.forall(_ >= 0))
    val sh = spark.sql(
      "SELECT graft_simhash(xxhash64(v)) AS sig FROM VALUES ('a'), ('b') AS t(v)").head().getLong(0)
    assert(sh != 0L)
  }

  test("graft_shingle_hashes / graft_term_counts from SQL") {
    val n = spark.sql(
      "SELECT size(graft_shingle_hashes('a b c d', 3)) AS n").head().getInt(0)
    assert(n == 2) // 'a b c', 'b c d'
    val tc = spark.sql(
      "SELECT graft_term_counts('The the  cat') AS m").head().getMap[String, Int](0)
    assert(tc == Map("the" -> 2, "cat" -> 1))
  }

  test("SQL minhash equals the operator API signature") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(sf("documents")).limit(50)
    docs.createOrReplaceTempView("docs_mh")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_minhash(xxhash64(s), 32, 42) AS sig
        |FROM (SELECT doc_id, explode(graft_shingles) AS s
        |      FROM (SELECT doc_id, split(regexp_replace(lower(trim(text)), '\\s+', ' '), ' ') AS toks,
        |            transform(sequence(0, greatest(size(split(regexp_replace(lower(trim(text)), '\\s+', ' '), ' ')) - 3, 0)),
        |                      i -> array_join(slice(split(regexp_replace(lower(trim(text)), '\\s+', ' '), ' '), i + 1, 3), ' ')) AS graft_shingles
        |            FROM docs_mh))
        |GROUP BY doc_id""".stripMargin)
    val viaApi = graft.operators.Dedup.minHashSignatures(docs, "doc_id", "text", 32, 3)
    val sqlMap = viaSql.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val apiMap = viaApi.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // same docs; signatures agree where shingle sets agree (all docs here
    // have >= 3 tokens so the fallback branch never diverges)
    assert(sqlMap.keySet == apiMap.keySet)
    assert(sqlMap.forall { case (k, v) => apiMap(k) == v })
  }

  test("table resolution: exactly-one match, ambiguity and absence are errors") {
    val available = Seq("pre_mydb_orders", "pre_mydb_lineitem", "other_mydb_orders_x")
    val cfg = Seq(TableConfig("orders", Seq("k"), SortOrder.Asc))
    val resolved = TableResolution.resolve(available, "mydb", cfg)
    assert(resolved == Map("orders" -> "pre_mydb_orders"))
    intercept[ConfigError] {
      TableResolution.resolve(available :+ "x_mydb_orders", "mydb", cfg)
    }
    intercept[ConfigError] {
      TableResolution.resolve(Seq.empty, "mydb", cfg)
    }
  }
}
