package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf picks latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"),
      (2L, 15L, "p3")
    ).toDF("k", "lts", "lp")
    val right = Seq(
      (1L, 10L, "r10"), (1L, 18L, "r18"),
      (2L, 99L, "r99")
    ).toDF("k", "rts", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts")
      .select("k", "lp", "rv").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(out == Set(
      (1L, "p0", None),         // before any right row
      (1L, "p1", Some("r10")),  // tie: rts == lts matches (<=)
      (1L, "p2", Some("r18")),  // latest preceding, not first
      (2L, "p3", None)))        // right row exists but only later
  }

  test("asOf forward picks the earliest right row at-or-after; tolerance nulls far matches") {
    val left = Seq(
      (1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 99L, "p3"),
      (2L, 5L, "p4")
    ).toDF("k", "lts", "lp")
    val right = Seq(
      (1L, 10L, "r10"), (1L, 25L, "r25"),
      (2L, 50L, "r50")
    ).toDF("k", "rts", "rv")
    val fwd = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts", forward = true)
      .select("k", "lp", "rv").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(fwd == Set(
      (1L, "p1", Some("r10")),  // tie: rts == lts matches (>=)
      (1L, "p2", Some("r25")),  // earliest following, not latest
      (1L, "p3", None),         // nothing after
      (2L, "p4", Some("r50"))))
    val tol = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts",
        forward = true, toleranceSeconds = Some(10L))
      .select("k", "lp", "rv").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(tol == Set(
      (1L, "p1", Some("r10")),  // diff 0 <= 10
      (1L, "p2", Some("r25")),  // diff 5 <= 10
      (1L, "p3", None),
      (2L, "p4", None)))        // nearest is 45 away -> nulled
  }

  test("asOf carries multiple right payload columns and preserves left columns") {
    val left = Seq((1L, 10L, 7.5)).toDF("k", "lts", "amount")
    val right = Seq((1L, 9L, "x", 42)).toDF("k", "rts", "tag", "ver")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts").collect().head
    val byName = out.schema.fieldNames.zipWithIndex.toMap
    assert(out.getDouble(byName("amount")) == 7.5)
    assert(out.getString(byName("tag")) == "x")
    assert(out.getInt(byName("ver")) == 42)
  }

  test("asOf rejects colliding payload names") {
    val left = Seq((1L, 10L, "v")).toDF("k", "lts", "dup")
    val right = Seq((1L, 9L, "w")).toDF("k", "rts", "dup")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts")
    }
  }

  test("native sort-merge asOf equals the window formulation on events") {
    import org.apache.spark.sql.graftexec.NativeAsOf
    val ev = SparkEntry.normalizeTs(spark.read.parquet(sf("events")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts").as("sts"))
      .agg(max(col("event_id")).as("signup_id"))
    val window = graft.operators.AsOfJoin.asOf(purchases, signups,
        Seq("user_id"), "ts", "sts")
      .select("purchase_id", "user_id", "signup_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val native = NativeAsOf.asOf(purchases, signups, Seq("user_id"), "ts", "sts")
      .select("purchase_id", "user_id", "signup_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(native == window)
    assert(native.nonEmpty)
  }

  test("asOf rejects mixed numeric/timestamp ts columns") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a")).toDF("k", "lts", "lv")
    val r = Seq((1L, new java.sql.Timestamp(5000L), "x")).toDF("k", "rts", "rv")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, r, Seq("k"), "lts", "rts", toleranceSeconds = Some(10L))
    }
    assert(e.getMessage.contains("must agree in type"))
  }

  test("native asOf plan uses AsOfJoinExec with clustered+sorted children") {
    import org.apache.spark.sql.graftexec.NativeAsOf
    import spark.implicits._
    val l = Seq((1L, 10L, "a")).toDF("k", "lts", "lv")
    val r = Seq((1L, 5L, "x")).toDF("k", "rts", "rv")
    val df = NativeAsOf.asOf(l, r, Seq("k"), "lts", "rts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in plan:\n$plan")
    val out = df.select("lv", "rv").collect().head
    assert(out.getString(0) == "a" && out.getString(1) == "x")
  }
}
