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
}
