package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions._

/** Codegen hygiene for every graft expression that participates in
  * whole-stage codegen: TWO instances of the same expression in ONE
  * generated scope must still compile. A `doGenCode` that emits a fixed
  * Java local name ("int i = ...") compiles fine alone but collides on
  * the second instantiation ("Redefinition of local variable"), and
  * Spark then silently falls back to interpreted execution for the whole
  * stage — correctness survives, the hot path doesn't.
  *
  * `GenerateUnsafeProjection.generate` THROWS on a Janino compile error
  * (no fallback at this layer), so each test here is a hard pin; the
  * evaluation afterwards pins codegen/interpreted parity on top.
  */
class CodegenHygieneSpec extends SparkSpec {

  private def arr(xs: Double*): GenericArrayData = new GenericArrayData(xs.toArray)
  private def s(v: String): UTF8String = UTF8String.fromString(v)

  /** (name, fresh-expression factory, input row matching the bound refs). */
  private val cases: Seq[(String, () => Expression, InternalRow)] = Seq(
    ("graft_cosine",
      () => CosineSimilarity(
        BoundReference(0, ArrayType(DoubleType), nullable = true),
        BoundReference(1, ArrayType(DoubleType), nullable = true)),
      InternalRow(arr(1.0, 2.0, 3.0), arr(4.0, 5.0, 6.0))),
    ("graft_cosine float",
      () => CosineSimilarity(
        BoundReference(0, ArrayType(FloatType), nullable = true),
        BoundReference(1, ArrayType(FloatType), nullable = true)),
      InternalRow(
        new GenericArrayData(Array(1.0f, 2.0f, 3.0f)),
        new GenericArrayData(Array(-1.0f, 0.5f, 2.0f)))),
    ("graft_zorder",
      () => ZOrder2(
        BoundReference(0, LongType, nullable = true),
        BoundReference(1, LongType, nullable = true)),
      InternalRow(12345L, 54321L)),
    ("graft_url_canon",
      () => UrlCanonicalize(BoundReference(0, StringType, nullable = true)),
      InternalRow(s("HTTPS://Example.COM:443/Path?b=2&a=1#frag"), s("x"))),
    ("graft_unicode_normalize",
      () => NormalizeUnicode(BoundReference(0, StringType, nullable = true), "NFC"),
      InternalRow(s("café y é"), s("x"))),
    ("graft_jaro_winkler",
      () => JaroWinklerSimilarity(
        BoundReference(0, StringType, nullable = true),
        BoundReference(1, StringType, nullable = true)),
      InternalRow(s("martha"), s("marhta")))
  )

  cases.foreach { case (name, mk, row) =>
    test(s"$name: two instances compile in one codegen scope and match interpreted eval") {
      val exprs = Seq(mk(), mk())
      val proj = GenerateUnsafeProjection.generate(exprs)
      val out = proj(row)
      exprs.zipWithIndex.foreach { case (e, i) =>
        val interpreted = e.eval(row)
        val generated = out.get(i, e.dataType)
        assert(generated == interpreted,
          s"$name codegen/interpreted mismatch at slot $i: $generated vs $interpreted")
      }
    }
  }

  test("all codegen'd graft expressions co-resident in a single scope compile") {
    // The realistic worst case: one projection mixing every codegen'd
    // expression, two instances each — any fixed local anywhere fails here.
    val row = InternalRow(
      arr(1.0, 2.0, 3.0), arr(4.0, 5.0, 6.0), 7L, 9L,
      s("HTTP://A.B:80/x?z=1&y=2"), s("café"))
    def cos() = CosineSimilarity(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      BoundReference(1, ArrayType(DoubleType), nullable = true))
    def zo() = ZOrder2(
      BoundReference(2, LongType, nullable = true),
      BoundReference(3, LongType, nullable = true))
    def url() = UrlCanonicalize(BoundReference(4, StringType, nullable = true))
    def uni() = NormalizeUnicode(BoundReference(5, StringType, nullable = true), "NFKC")
    def jw() = JaroWinklerSimilarity(
      BoundReference(4, StringType, nullable = true),
      BoundReference(5, StringType, nullable = true))
    val exprs = Seq(cos(), cos(), zo(), zo(), url(), url(), uni(), uni(), jw(), jw())
    val proj = GenerateUnsafeProjection.generate(exprs)
    val out = proj(row)
    exprs.zipWithIndex.foreach { case (e, i) =>
      assert(out.get(i, e.dataType) == e.eval(row))
    }
  }

  test("every SQL-registered scalar graft function runs twice per stage, fallback off") {
    // registration-path twin of the projection tests above: the SQL names
    // resolve through GraftExtensions, each called twice in one SELECT,
    // with silent fallback disabled so a codegen bug aborts loudly
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = spark.sql(
        """SELECT graft_cosine(v, v) c1, graft_cosine(v, v) c2,
          |       graft_zorder(a, b) z1, graft_zorder(b, a) z2,
          |       graft_url_canon(u) u1, graft_url_canon(u) u2,
          |       graft_jaro_winkler(s1, s2) j1, graft_jaro_winkler(s2, s1) j2,
          |       size(graft_shingle_hashes(s1, 2)) g1, size(graft_shingle_hashes(s2, 2)) g2,
          |       size(graft_term_counts(s1)) t1,
          |       size(graft_srp_signature(v, 3, 2, 4, 7)) p1
          |FROM VALUES (array(1.0D, 2.0D, 3.0D), 3L, 5L,
          |  'HTTP://X.Y:80/a?b=2&a=1', 'martha one two', 'marhta one two') AS
          |  t(v, a, b, u, s1, s2)
          |""".stripMargin).collect()
      assert(rows.length == 1)
      val r = rows(0)
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12 && r.getDouble(0) == r.getDouble(1))
      assert(r.getLong(2) == graft.functions.ZOrder2.interleave(3L, 5L))
      assert(r.getString(4) == "http://x.y/a?a=1&b=2" && r.getString(4) == r.getString(5))
      assert(r.getDouble(6) == r.getDouble(7))
      assert(r.getInt(8) > 0 && r.getInt(9) > 0 && r.getInt(10) > 0 && r.getInt(11) == 2)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("two graft_cosine calls in one stage execute with codegen fallback disabled") {
    // End-to-end pin: with spark.sql.codegen.fallback=false a compile
    // failure aborts the query instead of degrading silently, so a green
    // run proves the multi-cosine scoring stage really is codegen'd.
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = spark.sql(
        """SELECT graft_cosine(a, b) AS ab,
          |       graft_cosine(b, a) AS ba,
          |       graft_cosine(a, a) AS aa
          |FROM VALUES (array(1.0D, 2.0D, 3.0D), array(3.0D, 2.0D, 1.0D)) t(a, b)
          |""".stripMargin).collect()
      assert(rows.length == 1)
      assert(math.abs(rows(0).getDouble(0) - rows(0).getDouble(1)) < 1e-12)
      assert(math.abs(rows(0).getDouble(2) - 1.0) < 1e-12)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
