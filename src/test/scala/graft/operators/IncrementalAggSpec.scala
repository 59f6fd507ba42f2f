package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Merge algebra: folding N deltas in ANY order equals the one-shot
  * aggregate — the retry/replay/out-of-order-batch property.
  */
class IncrementalAggSpec extends SparkSpec {

  import spark.implicits._

  test("N batches fold to the full aggregate in any order") {
    val rows = (0 until 300).map(i => (s"k${i % 5}", i.toDouble))
    def rollup(data: Seq[(String, Double)]) =
      data.toDF("k", "v").groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          min(col("v")).as("lo"), max(col("v")).as("hi"))
    val batches = rows.grouped(70).map(rollup).toSeq
    val expect = rollup(rows).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    for (order <- Seq(batches, batches.reverse)) {
      val got = IncrementalAgg.merge(order, keys = Seq("k"),
          counts = Seq("n"), sums = Seq("s"), mins = Seq("lo"), maxs = Seq("hi"))
        .collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4)))).toMap
      assert(got == expect)
    }
  }

  test("a key absent from one batch still merges correctly") {
    val a = Seq(("x", 1.0), ("y", 2.0)).toDF("k", "v").groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val b = Seq(("x", 9.0)).toDF("k", "v").groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val got = IncrementalAgg.merge(Seq(a, b), Seq("k"),
        counts = Seq("n"), sums = Seq("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("x", 2L, 10.0), ("y", 1L, 2.0)))
  }
}
