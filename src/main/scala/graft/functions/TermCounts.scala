package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term-frequency map in one primitive pass:
  * `map(term -> occurrences)` over the lowercase `\s+`-split tokens
  * (identical tokenization to [[ShingleHashes]] / the DuckDB oracles).
  * Keys are emitted in sorted order for deterministic downstream explode.
  *
  * The point at scale: term frequencies are computed ROW-LOCALLY, so
  * `explode(term_counts(text))` yields (term, tf) pairs with no shuffle
  * at all — the alternative `explode(tokens) → groupBy(doc, term)`
  * shuffles every token occurrence just to count within one document.
  */
case class TermCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    MapType(StringType, IntegerType, valueContainsNull = false)
  override def prettyName: String = "graft_term_counts"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string input, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toString
    val counts = new java.util.TreeMap[String, Int]()
    // Locale.ROOT mirrors ShingleTokenize: JVM-locale-independent lowercase
    text.toLowerCase(java.util.Locale.ROOT).split("\\s+").foreach { t =>
      if (t.nonEmpty) counts.merge(t, 1, Integer.sum)
    }
    val n = counts.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = UTF8String.fromString(e.getKey)
      vals(i) = e.getValue
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
