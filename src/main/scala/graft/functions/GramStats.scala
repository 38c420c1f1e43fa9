package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word n-gram repetition statistics in one primitive pass:
  * `struct(n_grams, n_distinct, top_count)` over the overlapping word
  * n-grams of the lowercase `\s+`-split tokens (identical tokenization to
  * [[TermCounts]] / [[ShingleHashes]] / the DuckDB oracles).
  *
  * These are the classic repetition quality signals for LLM corpus
  * filtering (duplicate-n-gram fraction `1 - n_distinct/n_grams`, top
  * n-gram fraction `top_count/n_grams` — the Gopher/C4-style rules): a
  * document that repeats the same phrase over and over scores high on
  * both and gets filtered before training.
  *
  * The point at scale: the whole histogram lives and dies inside one
  * row's eval, so the filter is a narrow map-side projection — the
  * explode(grams) → groupBy(doc, gram) formulation shuffles every n-gram
  * occurrence of the corpus just to count within one document.
  *
  * Documents with fewer than `n` tokens have no n-grams: all three stats
  * are 0 (callers filter `n_grams >= 1` before the ratio columns, and the
  * oracle's `unnest(empty)` drops the doc the same way).
  */
case class GramStats(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "gram width must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false)))

  override def prettyName: String = "graft_gram_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string input, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toString
    // Locale.ROOT mirrors ShingleTokenize: JVM-locale-independent lowercase
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return InternalRow(0L, 0L, 0L)
    val counts = new java.util.HashMap[String, Int]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    var top = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val c = counts.merge(sb.toString, 1, Integer.sum)
      if (c > top) top = c
      i += 1
    }
    InternalRow((toks.length - n + 1).toLong, counts.size().toLong, top.toLong)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
