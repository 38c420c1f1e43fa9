package graft

import graft.functions.{CosineSimilarity, MinHashAggregate, ShingleHashes, SimHashAggregate, SrpSignature, TermCounts}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the custom expressions — install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`:
  *
  *   SELECT graft_cosine(a.embedding, b.embedding)           -- double
  *   SELECT graft_srp_signature(embedding, 64, 8, 8, 7)      -- array<bigint>
  *   SELECT graft_minhash(xxhash64(s), 128, 42) ... GROUP BY -- array<bigint>
  *   SELECT graft_simhash(xxhash64(s)) ...        GROUP BY   -- bigint
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Number, _) => v.intValue()
    case Literal(v: Any, _)    => v.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$name must be a literal, got $other")
  }
  private def longArg(e: Expression, name: String): Long = intArg(e, name).toLong

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: native sort-merge AS-OF join
    // (LogicalPlan node + Strategy + SparkPlan)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graftexec.AsOfJoinStrategy)

    // optimizer-rule extension: instr(c, 'x') > 0 → Contains(c, 'x'),
    // which reaches the parquet scan as a StringContains pushed filter
    ext.injectOptimizerRule(_ => graft.plans.InstrToContains)

    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_srp_signature"),
      new ExpressionInfo(classOf[SrpSignature].getName, "graft_srp_signature"),
      (args: Seq[Expression]) => SrpSignature(args(0),
        intArg(args(1), "dim"), intArg(args(2), "numTables"),
        intArg(args(3), "bitsPerTable"), longArg(args(4), "seed"))))

    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashAggregate].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinHashAggregate(args(0),
        intArg(args(1), "numHashes"), longArg(args(2), "seed")).toAggregateExpression()))

    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashAggregate].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHashAggregate(args(0)).toAggregateExpression()))

    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (args: Seq[Expression]) => ShingleHashes(args(0), intArg(args(1), "n"))))

    ext.injectFunction((
      FunctionIdentifier("graft_term_counts"),
      new ExpressionInfo(classOf[TermCounts].getName, "graft_term_counts"),
      (args: Seq[Expression]) => TermCounts(args(0))))

    ext.injectFunction((
      FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[graft.functions.ZOrder2].getName, "graft_zorder"),
      (args: Seq[Expression]) => graft.functions.ZOrder2(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_url_canon"),
      new ExpressionInfo(classOf[graft.functions.UrlCanonicalize].getName, "graft_url_canon"),
      (args: Seq[Expression]) => graft.functions.UrlCanonicalize(args(0))))

    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[graft.functions.JaroWinklerSimilarity].getName,
        "graft_jaro_winkler"),
      (args: Seq[Expression]) => graft.functions.JaroWinklerSimilarity(args(0), args(1))))
  }
}
