package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Contains, GreaterThan,
  GreaterThanOrEqual, Literal, StringInstr}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite `instr(col, 'needle') > 0` (and the `>= 1` /
  * `= 0`-negation-free forms) into `Contains(col, 'needle')`.
  *
  * Semantically identical (instr is 1-based, 0 = absent; both are null
  * on null input), but the rewrite changes the PHYSICAL plan: `Contains`
  * translates to the `StringContains` data-source filter and reaches the
  * parquet reader (`PushedFilters`), where row groups whose column
  * statistics/dictionaries exclude the needle are skipped entirely —
  * `instr(...) > 0` is an opaque expression the scan cannot use. At
  * 100 TB the difference is "read every text row group" vs "skip
  * dictionary-excluded ones", for free at query-rewrite time.
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule`
  * (GraftExtensions) — the Rule[LogicalPlan] leg of the extension
  * surface, next to the planner-strategy leg (AsOfJoinStrategy).
  * The rewrite erases its own match, so it is trivially idempotent
  * under the optimizer's fixpoint loop.
  */
object InstrToContains extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // instr(c, s) > 0  /  instr(c, s) >= 1
      case GreaterThan(StringInstr(str, substr @ Literal(_, _)), Literal(0, IntegerType)) =>
        Contains(str, substr)
      case GreaterThanOrEqual(StringInstr(str, substr @ Literal(_, _)), Literal(1, IntegerType)) =>
        Contains(str, substr)
      // 0 < instr(c, s)  /  1 <= instr(c, s) (commuted literals)
      case org.apache.spark.sql.catalyst.expressions.LessThan(
          Literal(0, IntegerType), StringInstr(str, substr @ Literal(_, _))) =>
        Contains(str, substr)
      case org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(
          Literal(1, IntegerType), StringInstr(str, substr @ Literal(_, _))) =>
        Contains(str, substr)
      // instr(c, s) = 0 under NOT is left alone: Not(Contains) is not a
      // pushable source filter, so the rewrite would buy nothing
    }
}
