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

  test("empty incremental batch short-circuits (S2 probe)") {
    val src = new JdbcSource(url, props)
    val df = src.readIncremental(spark, cfg, Map("o_orderkey" -> "999999999"))
    assert(df.isEmpty)
  }
}
