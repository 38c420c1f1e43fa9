package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) key: bit-interleave of two non-negative 16-bit
  * dimensions into one long, `z = spread(x) | spread(y) << 1`.
  *
  * Sorting/range-partitioning data by this key clusters rows that are
  * close in BOTH dimensions into the same files, so min/max file stats
  * prune two-dimensional range predicates — the standard multi-dim
  * data-layout primitive for large scans (the technique behind
  * Delta/Iceberg Z-ordering). A native expression with `doGenCode` keeps
  * the key computation inside whole-stage codegen during the layout
  * write, and the bit-spread runs in 4 shift/mask steps instead of a
  * 16-iteration bit loop.
  *
  * Inputs are masked to their low 16 bits (callers bucket/clamp first);
  * the result is deterministic and engine-independent — the oracle
  * replays the same interleave as an explicit 16-term bit sum.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      Seq(IntegerType, LongType).contains(e.dataType))
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs int/long inputs, got ${left.dataType}, ${right.dataType}")
  }

  private def toLong(e: Expression, v: Any): Long = e.dataType match {
    case IntegerType => v.asInstanceOf[Int].toLong
    case _ => v.asInstanceOf[Long]
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(toLong(left, a), toLong(right, b))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = ZOrder2.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.interleave((long) $a, (long) $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Spread the low 16 bits of `v` to even bit positions (4-step mask
    * ladder — the classic interleave-by-binary-magic-numbers trick).
    */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}
