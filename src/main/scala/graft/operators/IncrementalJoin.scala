package graft.operators

import org.apache.spark.sql.DataFrame

/** Incremental maintenance of an inner equi-join under appends — the join
  * counterpart of algebraic aggregate merging (q68). With both sides
  * split into (old, delta):
  *
  *   A' ⋈ B'  =  (A ⋈ B)  ∪  ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * The first term is the PRIOR materialized result, so refreshing the
  * view costs three joins whose left-or-right side is a delta — at a
  * 100 TB fact table with a per-batch delta, that is delta-sized work
  * instead of a full re-join. Append-only semantics (no updates/deletes
  * — those need the tombstone path, q43).
  */
object IncrementalJoin {

  /** The three delta terms to ADD to the prior materialized result. */
  def deltaTerms(
      aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      keys: Seq[String]): DataFrame =
    aDelta.join(bOld, keys)
      .unionAll(aOld.join(bDelta, keys))
      .unionAll(aDelta.join(bDelta, keys))

  /** Full maintained result: prior ∪ delta terms (prior recomputed here
    * from aOld ⋈ bOld; a real pipeline reads it from the materialized
    * view instead).
    */
  def maintained(
      aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      keys: Seq[String]): DataFrame =
    aOld.join(bOld, keys).unionAll(deltaTerms(aOld, aDelta, bOld, bDelta, keys))
}
