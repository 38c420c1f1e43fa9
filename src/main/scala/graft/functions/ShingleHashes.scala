package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The one tokenize→shingle→hash→sort→dedup loop both shingle-hash
  * expressions share. Its semantics are load-bearing for cross-engine
  * oracle parity (split-on-`\s+` dropping empties == the SQL/DuckDB
  * formulation for ANY whitespace kind, ADVICE r1) — keep it in exactly
  * one place so a tokenization tweak cannot drift between the xxhash and
  * md5 variants.
  */
private[functions] object ShingleTokenize {

  /** Sorted, deduped `hash` values of the word n-gram shingles of `text`;
    * fewer than `n` tokens hash the whole normalized text.
    */
  def shingleHashes(text: String, n: Int, hash: String => Long): GenericArrayData = {
    // Locale.ROOT: the default toLowerCase is JVM-locale-sensitive (tr_TR
    // maps 'I' -> 'ı'), which would diverge from DuckDB's lower()
    val norm = text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
    val toks = if (norm.isEmpty) Array("") else norm
    // primitive sort + in-place dedup (a boxed TreeSet per row dominated
    // the signature stage at bench scale)
    val raw =
      if (toks.length < n) Array(hash(toks.mkString(" ")))
      else {
        val tmp = new Array[Long](toks.length - n + 1)
        val sb = new java.lang.StringBuilder()
        var i = 0
        while (i <= toks.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          tmp(i) = hash(sb.toString)
          i += 1
        }
        tmp
      }
    java.util.Arrays.sort(raw)
    var w = 0
    var r = 0
    while (r < raw.length) {
      if (w == 0 || raw(r) != raw(w - 1)) { raw(w) = raw(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(raw, w))
  }
}

/** Distinct xxhash64 values of the word n-gram shingles of a text column,
  * in one primitive pass (sorted ascending).
  *
  * Semantically equals `transform(shingles(text, n), s => xxhash64(s))`
  * minus the intermediate shingle-string array: tokens come from
  * lowercase, whitespace-collapsed text; fewer than `n` tokens hash the
  * whole normalized text (the `shingles` fallback). Hashing matches
  * Spark's `xxhash64` exactly (XxHash64Function, seed 42), so signatures
  * built from these hashes are identical to the HOF formulation — the
  * HOF version walks interpreted array expressions per row and was the
  * single largest stage of the MinHash pipeline.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string input, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    ShingleTokenize.shingleHashes(v.asInstanceOf[UTF8String].toString, n, hash)

  private def hash(s: String): Long =
    XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Like [[ShingleHashes]] but hashing each shingle to the 60-bit integer
  * value of the first 15 hex chars of its md5 — the cross-engine hash the
  * DuckDB oracle can reproduce (`('0x' || substr(md5(s),1,15))::BIGINT`).
  * Equals `conv(substring(md5(s),1,15),16,10)` per shingle without
  * materializing the shingle-string array.
  */
case class ShingleHashesMd5(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes_md5"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string input, got $other")
    }

  @transient private lazy val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(v: Any): Any =
    ShingleTokenize.shingleHashes(v.asInstanceOf[UTF8String].toString, n, hash)

  /** First 15 hex chars of md5 == top 60 bits of the first 8 digest bytes
    * (big-endian), shifted right by 4.
    */
  private def hash(s: String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
