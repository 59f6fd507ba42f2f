package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketized interval joins == the naive range join, pair for pair —
  * across bucket widths (boundary-straddling intervals are the trap)
  * — and the physical plan is an equi-join, not BroadcastNestedLoop.
  */
class IntervalJoinSpec extends SparkSpec {

  import spark.implicits._

  // deterministic pseudo-random intervals straddling bucket boundaries
  private val ivs = (0 until 200).map { i =>
    val k = s"k${i % 7}"; val lo = (i * 37 % 500).toLong
    (k, i.toLong, lo, lo + (i * 13 % 90).toLong)
  }
  private val pts = (0 until 300).map { i =>
    (s"k${i % 7}", 1000L + i, (i * 29 % 600).toLong)
  }

  test("pointInInterval matches the naive range join for every bucket width") {
    val ivDf = ivs.toDF("k", "iv_id", "lo", "hi")
    val ptDf = pts.toDF("k", "pt_id", "x")
    val expect = ivDf.as("a").join(ptDf.as("b"),
        col("a.k") === col("b.k") &&
          col("b.x") >= col("a.lo") && col("b.x") <= col("a.hi"))
      .select(col("iv_id"), col("pt_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = IntervalJoin.pointInInterval(ivDf, ptDf, "k",
          col("lo"), col("hi"), col("x"), w)
        .select(col("iv_id"), col("pt_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expect, s"width $w: ${got.size} vs ${expect.size} pairs")
    }
  }

  test("overlap emits each intersecting pair exactly once (first-common-bucket)") {
    val left = ivs.toDF("k", "iv_id", "lo", "hi")
    val right = ivs.map { case (k, id, lo, hi) => (k, id + 5000, lo + 11, hi + 11) }
      .toDF("k", "iv_id2", "lo2", "hi2")
    val expect = left.as("a").join(right.as("b"),
        col("a.k") === col("b.k") &&
          col("a.lo") <= col("b.hi2") && col("b.lo2") <= col("a.hi"))
      .select(col("iv_id"), col("iv_id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(expect.length == expect.toSet.size, "naive baseline must be distinct")
    for (w <- Seq(3L, 50L, 400L)) {
      val got = IntervalJoin.overlap(left, right, "k",
          col("lo"), col("hi"), col("lo2"), col("hi2"), w)
        .select(col("iv_id"), col("iv_id2"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"width $w emitted duplicates")
      assert(got.toSet == expect.toSet, s"width $w pair set mismatch")
    }
  }

  test("plan is an equi-join on (key, bucket), not a nested loop") {
    val plan = IntervalJoin.pointInInterval(
        ivs.toDF("k", "iv_id", "lo", "hi"), pts.toDF("k", "pt_id", "x"),
        "k", col("lo"), col("hi"), col("x"), 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"bucketization must produce an equi-join:\n$plan")
  }
}
