package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Aggregate-level guard completing the try_* diagnostic contract the
  * exact-integer columns advertise ("exact while int64-representable,
  * NULL beyond — never an abort"): SUM and MAX skip NULL inputs, so a
  * PER-ROW `try_multiply`/`try_subtract` overflow would otherwise be
  * silently dropped from the fold and the aggregate would return a
  * wrong NON-NULL value — worse than the abort the try_* forms exist
  * to avoid, because nothing signals the corruption. Any overflowed
  * row poisons the whole aggregate to NULL instead.
  *
  * The overflow flag must distinguish an overflow NULL from a
  * legitimately-NULL input (e.g. the last sample's lead() gap in
  * [[TimeSeries.twap]]): pass `term.isNull` only when the inputs are
  * provably non-null, else conjoin the inputs' non-nullness.
  *
  * Scale: the poison probe is one extra expression in the SAME
  * aggregate fold — map-side combined with it, no extra shuffle. */
object TryAgg {

  /** `agg` if no row satisfied `overflowed`, else NULL. Both branches
    * are aggregate expressions over the same group. */
  def unlessOverflow(overflowed: Column, agg: Column): Column =
    when(sum(when(overflowed, 1L).otherwise(0L)) > 0, lit(null))
      .otherwise(agg)

  /** try_sum over `term` (a try_* per-row expression whose inputs are
    * non-null), NULL when any row overflowed. Aggregate-level Σ
    * overflow is already NULL via try_sum itself. */
  def trySumExact(term: Column): Column =
    unlessOverflow(term.isNull, try_sum(term))

  /** max over `term` (try_* per-row, non-null inputs), NULL when any
    * row overflowed — MAX would otherwise skip the overflowed row and
    * report the max of the rest. */
  def tryMaxExact(term: Column): Column =
    unlessOverflow(term.isNull, max(term))
}
