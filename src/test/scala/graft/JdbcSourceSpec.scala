package graft

import graft.config.{SortOrder, TableConfig}
import graft.sources.JdbcSource
import java.sql.DriverManager

/** S1 proper: incremental read against a real JDBC database (embedded
  * Derby, which ships with Spark). Checks the bookmark predicate is
  * PUSHED into the remote query and the hashfield split yields one JDBC
  * partition per clause with a lossless union.
  */
class JdbcSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  override def beforeAll(): Unit = {
    super.beforeAll()
    Class.forName(driver)
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    try st.execute("DROP TABLE orders") catch { case _: Exception => () }
    st.execute(
      "CREATE TABLE orders (o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus VARCHAR(4))")
    val ps = conn.prepareStatement("INSERT INTO orders VALUES (?, ?, ?)")
    val rows = spark.read.parquet(sf("orders"))
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      .limit(200).collect()
    rows.foreach { r =>
      ps.setLong(1, r.getLong(0)); ps.setDouble(2, r.getDouble(1)); ps.setString(3, r.getString(2))
      ps.addBatch()
    }
    ps.executeBatch()
    conn.close()
  }

  private val props = Map("driver" -> driver)
  private val cfg = TableConfig("orders", Seq("o_orderkey"), SortOrder.Asc)

  test("jdbc incremental read filters beyond the bookmark and pushes the predicate") {
    val src = new JdbcSource(url, props)
    val df = src.readIncremental(spark, cfg, Map("o_orderkey" -> "100"))
    val full = src.read(spark, "orders")
    assert(df.count() == full.filter("o_orderkey > 100").count())
    val pushed = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(pushed.contains("PushedFilters") &&
        pushed.toLowerCase.contains("greaterthan(o_orderkey,100)"),
      s"bookmark predicate must reach the JDBC scan:\n$pushed")
  }

  test("hashfield split produces one partition per clause, union is lossless") {
    val src = new JdbcSource(url, props, hashField = Some("o_orderkey"), hashPartitions = 4)
    val df = src.read(spark, "orders")
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 200)
    assert(df.select("o_orderkey").distinct().count() == 200)
  }

  test("string hashfield splits N ways: disjoint, complete, NULL-safe") {
    // Derby lacks ASCII() (and its LOCATE is broken under Spark's mixed
    // derby jars) — any Derby-legal integer-valued hashExpr template works;
    // the MOD wrapper guarantees disjoint+complete splits regardless of
    // the hash function's quality.
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    try st.execute("DROP TABLE skeys") catch { case _: Exception => () }
    st.execute("CREATE TABLE skeys (k VARCHAR(36), v INT)")
    val ps = conn.prepareStatement("INSERT INTO skeys VALUES (?, ?)")
    (0 until 100).foreach { i =>
      ps.setString(1, i.toString)
      ps.setInt(2, i); ps.addBatch()
    }
    ps.setNull(1, java.sql.Types.VARCHAR); ps.setInt(2, 100); ps.addBatch()
    ps.executeBatch()
    conn.close()
    val derbyHash = "(CAST(%s AS INT) * 7 + LENGTH(%s))"
    val src = new JdbcSource(url, props, hashField = Some("k"),
      hashPartitions = 4, hashExpr = Some(derbyHash))
    val df = src.read(spark, "skeys")
    assert(df.rdd.getNumPartitions == 4)
    // complete: every row (incl. the NULL key) appears exactly once
    assert(df.count() == 101)
    assert(df.select("v").distinct().count() == 101)
    // disjoint is implied by count == distinct-count; check the split is
    // non-degenerate (more than one partition actually receives rows)
    val sizes = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.sum == 101 && sizes.count(_ > 0) > 1, sizes.mkString(","))
    // NULL key must land in partition 0, not vanish
    assert(df.filter("k IS NULL").count() == 1)
  }

  test("empty incremental batch short-circuits (S2 probe)") {
    val src = new JdbcSource(url, props)
    val df = src.readIncremental(spark, cfg, Map("o_orderkey" -> "999999999"))
    assert(df.isEmpty)
  }
}
