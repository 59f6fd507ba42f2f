package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized interval joins — overlap semantics ("which rows fall
  * inside / intersect my time ranges") without the range-join trap. A
  * naive `l.lo <= r.x AND r.x <= l.hi` join has no equi-key, so Spark
  * plans BroadcastNestedLoop (or a cartesian) — a scale-killer the
  * moment neither side broadcasts. The standard fix: quantize time
  * into fixed-width buckets, explode each interval to the buckets it
  * touches, and equi-join on (key, bucket) — shuffle volume grows by
  * interval_span/width per row, a tunable constant, and the join
  * itself is a plain hash join AQE can manage.
  *
  * Duplicate suppression is ARITHMETIC, not a post-join distinct: a
  * (interval, point) pair meets in exactly one bucket (the point's),
  * and an (interval, interval) pair is emitted only in the FIRST
  * bucket both touch (`bucket == greatest(lo1 div w, lo2 div w)`) —
  * so no second shuffle to dedup.
  *
  * Reference semantics: watermill routes by message metadata, not
  * ranges; this operator serves the analytics surface (sessions,
  * attribution, validity windows) alongside [[AsofJoin]] (latest-at-t)
  * and [[Scd2]] (state history). All division is integer `div` on
  * LONGs (a float quotient would round at bucket boundaries).
  */
object IntervalJoin {

  /** Rows of `points` (timestamp `x`) joined to rows of `intervals`
    * (`lo`..`hi`, inclusive) sharing `key`. All times are LONGs in the
    * caller's unit; `bucketWidth` in the same unit trades shuffle
    * expansion (span/width extra rows) against bucket selectivity. */
  def pointInInterval(intervals: DataFrame, points: DataFrame, key: String,
      lo: Column, hi: Column, x: Column, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    reserve(intervals, "__lo", "__hi", "__b")
    reserve(points, "__x", "__b")
    val iv = intervals
      .withColumn("__lo", lo.cast("long")).withColumn("__hi", hi.cast("long"))
      .filter(col("__lo") <= col("__hi"))
      .withColumn("__b", explode(sequence(
        expr(s"__lo div ${bucketWidth}L"), expr(s"__hi div ${bucketWidth}L"))))
    val pt = points.withColumn("__x", x.cast("long"))
      .withColumn("__b", expr(s"__x div ${bucketWidth}L"))
    iv.join(pt, Seq(key, "__b"))
      .filter(col("__lo") <= col("__x") && col("__x") <= col("__hi"))
      // drop ALL internals, not just the join bucket — the helper
      // copies leaked into every result (and into any select("*")
      // write downstream)
      .drop("__b", "__lo", "__hi", "__x")
  }

  /** Interval×interval overlap (`[lo1,hi1] ∩ [lo2,hi2] ≠ ∅`) on a
    * shared `key`; each overlapping pair emitted exactly once via the
    * first-common-bucket rule. */
  def overlap(left: DataFrame, right: DataFrame, key: String,
      lo1: Column, hi1: Column, lo2: Column, hi2: Column,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    reserve(left, "__lo1", "__hi1", "__b")
    reserve(right, "__lo2", "__hi2", "__b")
    def expand(df: DataFrame, lo: Column, hi: Column, p: String) =
      df.withColumn(s"__lo$p", lo.cast("long"))
        .withColumn(s"__hi$p", hi.cast("long"))
        .filter(col(s"__lo$p") <= col(s"__hi$p"))
        .withColumn("__b", explode(sequence(
          expr(s"__lo$p div ${bucketWidth}L"),
          expr(s"__hi$p div ${bucketWidth}L"))))
    expand(left, lo1, hi1, "1").join(expand(right, lo2, hi2, "2"), Seq(key, "__b"))
      .filter(col("__lo1") <= col("__hi2") && col("__lo2") <= col("__hi1"))
      .filter(col("__b") === greatest(
        expr(s"__lo1 div ${bucketWidth}L"), expr(s"__lo2 div ${bucketWidth}L")))
      .drop("__b", "__lo1", "__hi1", "__lo2", "__hi2")
  }

  // internal names fail fast (the Merge/TableDiff discipline): a
  // caller column with one of these names would be silently replaced
  // by withColumn and then dropped from the result
  private def reserve(df: DataFrame, names: String*): Unit =
    names.foreach(n => require(!df.columns.contains(n),
      s"column name $n is reserved by IntervalJoin"))
}
