package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization expressions (the compressed-ANN hot path).
  *
  * PQ splits a d-dim vector into `m` subvectors of `dsub = d/m` dims and
  * quantizes each against its own `ksub`-centroid codebook: a vector
  * becomes `m` small ints (here 8 codes ≈ 8 bytes instead of 64 floats ≈
  * 256 bytes — the representation that makes a 100 TB corpus scannable).
  * Search uses ADC (asymmetric distance computation): the query stays
  * exact; per subspace a lookup table of squared L2 distances to every
  * centroid is built once per query, and a candidate's approximate
  * distance is the sum of `m` table lookups over its codes.
  *
  * Both expressions L2-normalize their input first, so ADC's L2 ranking
  * agrees with the engine's cosine ranking (||â − b̂||² = 2 − 2·cos).
  * Codebooks are passed as a flattened `Seq[Double]` (structural equality
  * keeps Catalyst's expression canonicalization sound) and reshaped once
  * per instance. Same row-local CodegenFallback shape as [[SrpSignature]]:
  * one interpreted call per row around tight primitive loops.
  */
private[functions] trait PqCodebookSupport { self: UnaryExpression =>
  def books: Seq[Double]
  def m: Int
  def ksub: Int
  def dsub: Int

  require(books.length == m * ksub * dsub,
    s"codebook length ${books.length} != m*ksub*dsub = ${m * ksub * dsub}")

  @transient protected lazy val bookArr: Array[Double] = books.toArray
  @transient protected lazy val childIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<float|double> input, got $other")
    }

  /** Read + L2-normalize the input vector into a fresh dense array of
    * length m*dsub (null elements → 0, shorter inputs zero-padded).
    */
  protected def normalized(v: Any): Array[Double] = {
    val vd = v.asInstanceOf[ArrayData]
    val d = m * dsub
    val out = new Array[Double](d)
    val n = math.min(vd.numElements(), d)
    var i = 0
    var norm = 0.0
    while (i < n) {
      val x = if (vd.isNullAt(i)) 0.0
        else if (childIsFloat) vd.getFloat(i).toDouble else vd.getDouble(i)
      out(i) = x; norm += x * x
      i += 1
    }
    if (norm > 0) {
      val inv = 1.0 / math.sqrt(norm)
      i = 0
      while (i < d) { out(i) *= inv; i += 1 }
    }
    out
  }
}

/** `m` codebook codes (ints in [0, ksub)) for a vector: per subspace the
  * argmin squared-L2 centroid, ties resolved to the lowest code.
  */
case class PqEncode(child: Expression, books: Seq[Double], m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression with PqCodebookSupport with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(v: Any): Any = {
    val q = normalized(v)
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val off = (s * ksub + c) * dsub
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val diff = q(s * dsub + i) - bookArr(off + i)
          d2 += diff * diff
          i += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-query ADC lookup table: `m*ksub` doubles, entry `s*ksub + c` =
  * squared L2 distance from the normalized query's subvector `s` to
  * centroid `c` of codebook `s`. A candidate's approximate distance is
  * the sum of its `m` code lookups (composed with codegen'd `element_at`
  * in the operator — no custom scoring expression needed).
  */
case class PqAdcTable(child: Expression, books: Seq[Double], m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression with PqCodebookSupport with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_adc_table"

  override def nullSafeEval(v: Any): Any = {
    val q = normalized(v)
    val tbl = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        val off = (s * ksub + c) * dsub
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val diff = q(s * dsub + i) - bookArr(off + i)
          d2 += diff * diff
          i += 1
        }
        tbl(s * ksub + c) = d2
        c += 1
      }
      s += 1
    }
    new GenericArrayData(tbl)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
