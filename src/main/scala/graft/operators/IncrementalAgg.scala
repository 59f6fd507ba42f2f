package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a materialized rollup fresh
  * by merging the standing snapshot with each new delta batch instead
  * of recomputing over the full history — refresh cost proportional to
  * the DELTA, not the corpus, which is the only viable shape once the
  * fact table is 100 TB. Works for any algebraic measure set (count,
  * sum, min, max — and everything derivable from them: avg = sum/n);
  * holistic measures (exact distinct, exact median) are NOT mergeable
  * — carry a sketch (HLL / Misra-Gries / Bloom, all in this repo)
  * alongside when those are needed.
  *
  * Shape: union of already-aggregated inputs, one hash shuffle on the
  * keys, partial aggregation upstream — the merged table is |keys|
  * rows regardless of how many snapshots fold in, so repeated
  * maintenance does not grow the plan or the state.
  */
object IncrementalAgg {

  /** Fold aggregated snapshots (identical schemas: `keys`, then
    * measure columns) into one: counts and sums re-sum, mins re-min,
    * maxs re-max. Associative+commutative, so batch order and
    * partitioning never change the result (the retry/replay property
    * the oracle gate pins). */
  def merge(snapshots: Seq[DataFrame], keys: Seq[String],
      counts: Seq[String] = Nil, sums: Seq[String] = Nil,
      mins: Seq[String] = Nil, maxs: Seq[String] = Nil): DataFrame = {
    require(snapshots.nonEmpty, "merge needs at least one snapshot")
    val aggs = counts.map(c => sum(col(c)).as(c)) ++
      sums.map(c => sum(col(c)).as(c)) ++
      mins.map(c => min(col(c)).as(c)) ++
      maxs.map(c => max(col(c)).as(c))
    require(aggs.nonEmpty, "merge needs at least one measure column")
    snapshots.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
