package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.PlanExpression
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** Physical-plan node census by DISTINCT NODE IDENTITY — the honest
  * counter behind SCALING.md's plan-size audit. The previous counter
  * regex-scanned `executedPlan.toString`, which over-counts structurally:
  * an executed `AdaptiveSparkPlanExec` prints BOTH its final and its
  * initial plan (×2 on every tag), `InMemoryRelation` re-prints the full
  * lineage of the cached subtree each time the cache is scanned (×k for a
  * cache read k times — the incremental-index queries union two persisted
  * ingest results, so their whole ingest lineages re-printed under every
  * downstream operator), `ReusedExchange` matches the `Exchange` regex,
  * and `BroadcastExchange`/`ShuffleExchange` both match it. e22's
  * headline "8,869 exchanges at sf1" (SCALE_r7.json) was exactly this
  * compounding; the walker below reports the count of distinct physical
  * operators that can actually EXIST at runtime.
  *
  * The walk descends through every indirection under which real operators
  * hide — AQE (final plan only: the initial plan is a pre-execution
  * estimate, not an operator set), materialized query stages, cached
  * relations (the cached subtree is counted ONCE however many scans read
  * it), reused exchanges (the shared child collapses by identity), and
  * subquery expressions — and never visits a node twice (identity set),
  * so shared subtrees count once no matter how many parents reference
  * them.
  */
object PlanNodes {

  /** All distinct-by-identity physical nodes reachable from `root`. */
  def collect(root: SparkPlan): Seq[SparkPlan] = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    val out = scala.collection.mutable.ArrayBuffer[SparkPlan]()
    def walk(p: SparkPlan): Unit = {
      if (!seen.add(p)) return
      out += p
      val through: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case c: InMemoryTableScanExec => Seq(c.relation.cachedPlan)
        case r: ReusedExchangeExec => Seq(r.child) // leaf node; the
          // shared original collapses by identity wherever else it appears
        case other => other.children
      }
      through.foreach(walk)
      p.expressions.foreach(_.foreach {
        case pe: PlanExpression[_] => pe.plan match {
          case sp: SparkPlan => walk(sp)
          case _ =>
        }
        case _ =>
      })
    }
    walk(root)
    out.toSeq
  }

  final case class Census(
      bhj: Int, smj: Int, shj: Int, bnl: Int, cartesian: Int,
      shuffle: Int, bcast: Int, reused: Int, aqe: Int, skewJoin: Int,
      cached: Int, nodes: Int) {
    /** Same key set the rehearsal artifacts always used (`exchange` =
      * shuffle + broadcast, distinct), plus the new dedup-aware ones.
      */
    def notes: String = Seq(
      "bhj" -> bhj, "smj" -> smj, "shj" -> shj, "bnl" -> bnl,
      "cartesian" -> cartesian, "exchange" -> (shuffle + bcast),
      "reused" -> reused, "aqe" -> aqe, "skewjoin" -> skewJoin,
      "cached" -> cached, "nodes" -> nodes)
      .filter(_._2 > 0).map { case (k, v) => s"$k=$v" }.mkString(",")
  }

  def census(root: SparkPlan): Census = {
    val ns = collect(root)
    Census(
      bhj = ns.count(_.isInstanceOf[BroadcastHashJoinExec]),
      smj = ns.count(_.isInstanceOf[SortMergeJoinExec]),
      shj = ns.count(_.isInstanceOf[ShuffledHashJoinExec]),
      bnl = ns.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      cartesian = ns.count(_.isInstanceOf[CartesianProductExec]),
      shuffle = ns.count(p =>
        p.isInstanceOf[ShuffleExchangeLike] && !p.isInstanceOf[ReusedExchangeExec]),
      bcast = ns.count(p =>
        p.isInstanceOf[BroadcastExchangeLike] && !p.isInstanceOf[ReusedExchangeExec]),
      reused = ns.count(_.isInstanceOf[ReusedExchangeExec]),
      aqe = ns.count(_.isInstanceOf[AdaptiveSparkPlanExec]),
      skewJoin = ns.count {
        case j: SortMergeJoinExec => j.isSkewJoin
        case j: ShuffledHashJoinExec => j.isSkewJoin
        case _ => false
      },
      cached = ns.count(_.isInstanceOf[InMemoryTableScanExec]),
      nodes = ns.size)
  }

  def census(df: DataFrame): Census = census(df.queryExecution.executedPlan)
}
