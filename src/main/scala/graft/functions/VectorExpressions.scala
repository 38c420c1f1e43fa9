package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The `functions.aggregate`/`zip_with` composition of a dot product is
  * evaluated interpreted (higher-order functions don't codegen) and
  * allocates an intermediate array per row — at N·k pair scorings this
  * dominates the ANN/near-dup runtime. These expressions run a tight
  * primitive loop instead: `CosineSimilarity` participates in whole-stage
  * codegen; `SrpSignature` is a single interpreted call per row around a
  * primitive loop (the plane matrix lives in the expression instance).
  */

/** cosine(a, b) over two numeric arrays (float or double elements),
  * accumulated in double, left-to-right — bit-identical to the HOF
  * formulation it replaces. Null elements count as 0; length mismatch
  * scores over the common prefix.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      Seq(FloatType, DoubleType).contains(elemType(e)))
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double> inputs, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]; val bd = b.asInstanceOf[ArrayData]
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    val n = math.min(ad.numElements(), bd.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (ad.isNullAt(i)) 0.0 else if (aFloat) ad.getFloat(i).toDouble else ad.getDouble(i)
      val y = if (bd.isNullAt(i)) 0.0 else if (bFloat) bd.getFloat(i).toDouble else bd.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // Locals must be freshName'd: two cosine calls in one codegen scope
      // otherwise collide ("Redefinition of local variable") and the whole
      // stage silently falls back to interpreted execution.
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val aGet = if (elemType(left) == FloatType) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val bGet = if (elemType(right) == FloatType) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.isNullAt($i) ? 0.0 : $aGet;
         |  double $y = $b.isNullAt($i) ? 0.0 : $bGet;
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sign-random-projection signature: `numTables` bucket ids, each packing
  * `bitsPerTable` hyperplane sign bits, planes drawn deterministically
  * from `seed` (components in {-1, 1}). One primitive pass per row; the
  * plane matrix is materialized once per expression instance.
  */
case class SrpSignature(
    child: Expression, dim: Int, numTables: Int, bitsPerTable: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_srp_signature"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<float|double> input, got $other")
    }

  // Plane matrix flattened plane-major into ONE contiguous double array:
  // the per-plane loop streams sequential memory instead of chasing
  // numTables×bitsPerTable separate arrays. Components are exactly ±1.0
  // (multiplication by them is exact), so the flattening cannot change a
  // single bit of any dot product. Plane p's components generate in the
  // SAME rnd order as the old Array[Array] form — signatures are
  // bit-identical to every committed oracle.
  @transient private lazy val planesFlat: Array[Double] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numTables * bitsPerTable * dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }
  @transient private lazy val childIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val vd = v.asInstanceOf[ArrayData]
    val n = math.min(vd.numElements(), dim)
    // extract the vector ONCE per row: the old loop re-read every element
    // through virtual ArrayData calls for EVERY plane — at e3's sf1
    // geometry (8 tables × ~17 adaptive bits × 64 dims) that was ~8700
    // virtual calls per row, the measured kernel bound of the 10×
    // rehearsal. Null elements read as 0.0, exactly as before.
    val x = new Array[Double](n)
    var j = 0
    while (j < n) {
      x(j) = if (vd.isNullAt(j)) 0.0
        else if (childIsFloat) vd.getFloat(j).toDouble else vd.getDouble(j)
      j += 1
    }
    val out = new Array[Long](numTables)
    val planes = planesFlat
    var t = 0
    var off = 0
    while (t < numTables) {
      var bucket = 0L
      var b = 0
      while (b < bitsPerTable) {
        var dot = 0.0
        var i = 0
        while (i < n) {
          dot += x(i) * planes(off + i)
          i += 1
        }
        if (dot >= 0) bucket |= (1L << b)
        off += dim // advance a full plane even when the vector is shorter
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Top-`nprobe` nearest-centroid cell ids for a vector, by cosine, ties
  * toward the LOWEST cell id — one primitive pass over a flattened
  * `k × dim` centroid matrix instead of `k` separate per-centroid
  * Columns. The Column formulation's expression tree (and its codegen)
  * grows with `k`, which caps the cell count an IVF index can use; this
  * kernel is O(k·dim) per row at constant plan size, so the cell count
  * can follow the corpus (the FAISS `nlist ≈ √N` regime — see
  * [[graft.operators.Ivf.cellsFor]]).
  *
  * Bit-parity contract with the Column path it replaces: similarity per
  * centroid accumulates in double, left-to-right, over the common prefix
  * `min(|vec|, dim)` with null elements as 0 (exactly
  * [[CosineSimilarity]]); ranking compares `Double.compare(-sim, ·)`
  * then cell id (exactly `array_sort` over `struct(-sim, cid)`, NaN
  * ranking last); `nprobe = 1` equals
  * `array_position(sims, array_max(sims)) - 1` (first-max-wins).
  */
case class NearestCells(
    child: Expression, cents: Seq[Double], k: Int, dim: Int, nprobe: Int)
    extends UnaryExpression with CodegenFallback {

  require(cents.length == k * dim, s"centroid matrix must be k*dim = ${k * dim} doubles")
  require(nprobe >= 1 && nprobe <= k, s"nprobe must be in [1, $k], got $nprobe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<float|double> input, got $other")
    }

  @transient private lazy val centsArr: Array[Double] = cents.toArray
  @transient private lazy val childIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val vd = v.asInstanceOf[ArrayData]
    val m = math.min(vd.numElements(), dim)
    val x = new Array[Double](m)
    var na = 0.0
    var i = 0
    while (i < m) {
      val xi = if (vd.isNullAt(i)) 0.0
        else if (childIsFloat) vd.getFloat(i).toDouble else vd.getDouble(i)
      x(i) = xi; na += xi * xi
      i += 1
    }
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      val off = c * dim
      var dot = 0.0; var nb = 0.0
      var j = 0
      while (j < m) {
        val y = centsArr(off + j)
        dot += x(j) * y; nb += y * y
        j += 1
      }
      sims(c) = dot / (math.sqrt(na) * math.sqrt(nb))
      c += 1
    }
    // selection by (Double.compare(-sim) asc, cid asc): strict less-than
    // with an ascending scan keeps the lowest cid on exact ties
    val out = new Array[Int](nprobe)
    val used = new Array[Boolean](k)
    var r = 0
    while (r < nprobe) {
      var best = -1
      var cc = 0
      while (cc < k) {
        if (!used(cc) && (best < 0 ||
            java.lang.Double.compare(-sims(cc), -sims(best)) < 0)) best = cc
        cc += 1
      }
      used(best) = true; out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** argmax-by-cosine cell assignment against a FROZEN centroid matrix —
  * the SemDeDup assignment step as ONE map-only expression. The old
  * formulation (cross-join each row against a k-row broadcast, 6-dp
  * round, max(struct) re-aggregate, then join the vectors back by id)
  * paid an explode ×k, a hash-aggregate exchange and a join-back
  * exchange per assignment pass; this evaluates the identical argmax in
  * a primitive loop per row — zero exchanges — with the centroid matrix
  * living in the expression instance (the [[SrpSignature]] pattern; it
  * ships once per task in the task binary, same order of bytes as the
  * old broadcast).
  *
  * Semantics are replicated BIT-EXACTLY from the aggregate form the
  * oracles gate: cosine accumulated in double left-to-right with null
  * elements as 0 ([[CosineSimilarity]]'s rule), rounded HALF_UP to 6 dp
  * exactly as Catalyst's `round` does for doubles (NaN/Infinity pass
  * through un-rounded), candidates compared under SQL double ordering
  * (java.lang.Double.compare — NaN greatest), ties on the rounded value
  * broken toward the LOWEST cid (centroids iterate cid-ascending and
  * only a strictly greater sim replaces the champion). A NULL input row
  * keeps the old max(struct)-over-all-null-sims verdict: lowest cid,
  * null simc.
  *
  * `cids`/`cvecs` are parallel, sorted ascending by cid; constructed by
  * [[graft.operators.Dedup.assignCells]] from a centroid-count-bounded
  * collect (the same frame the old shape collected into a broadcast).
  */
case class NearestCell(
    child: Expression, cids: Array[Long], cvecs: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("simc", DoubleType, nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_nearest_cell"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<float|double> input, got $other")
    }

  @transient private lazy val childIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def round6(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null)
      return InternalRow(cids(0), null) // all-null sims: lowest cid wins
    val vd = v.asInstanceOf[ArrayData]
    val nv = vd.numElements()
    // extract once per row (the SrpSignature lesson): k centroid loops
    // over virtual ArrayData getters would re-pay the dispatch k times
    val vec = new Array[Double](nv)
    var i = 0
    while (i < nv) {
      vec(i) =
        if (vd.isNullAt(i)) 0.0
        else if (childIsFloat) vd.getFloat(i).toDouble
        else vd.getDouble(i)
      i += 1
    }
    var bestCid = cids(0)
    var bestSim = Double.NaN
    var first = true
    var c = 0
    while (c < cids.length) {
      val cv = cvecs(c)
      val n = math.min(nv, cv.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      while (j < n) {
        val x = vec(j); val y = cv(j)
        dot += x * y; na += x * x; nb += y * y
        j += 1
      }
      val sim = round6(dot / (math.sqrt(na) * math.sqrt(nb)))
      if (first || java.lang.Double.compare(sim, bestSim) > 0) {
        bestSim = sim; bestCid = cids(c); first = false
      }
      c += 1
    }
    InternalRow(bestCid, bestSim)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
