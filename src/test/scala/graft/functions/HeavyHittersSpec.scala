package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra–Gries guarantees under Spark's partial-aggregation execution:
  * exact in the uncompressed regime, and in the lossy regime every
  * above-threshold item survives with `true - n/(c+1) <= est <= true`
  * — for EVERY partitioning, because the summary is merge-closed.
  */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  // 2 hot items + a long tail: n = 1000 rows, 502 distinct keys
  private val stream: Seq[String] =
    Seq.fill(300)("hot1") ++ Seq.fill(200)("hot2") ++
      (0 until 500).map(i => s"tail$i")

  private def sketchOf(data: Seq[String], capacity: Int,
      parts: Int): Map[String, Long] = {
    val df = data.toDF("s").repartition(parts)
    df.select(HeavyHitters.sketch(col("s"), capacity).as("m"))
      .collect().head.getMap[String, Long](0).toMap
  }

  test("capacity >= distinct keys gives exact counts under any partitioning") {
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 4, 17))
      assert(sketchOf(stream, capacity = 600, parts) == exact,
        s"no eviction possible at capacity 600 (502 distinct), parts=$parts")
  }

  test("lossy regime: heavy items survive with bounded undercount, never overcount") {
    val n = stream.size.toLong
    val c = 20
    val err = n / (c + 1) // 47
    for (parts <- Seq(1, 4, 17)) {
      val est = sketchOf(stream, c, parts)
      assert(est.size <= c, s"sketch exceeded capacity: ${est.size}")
      // guarantee 1: anything above n/(c+1) is present
      assert(est.contains("hot1") && est.contains("hot2"),
        s"items with freq 300/200 > $err must survive (parts=$parts): ${est.keySet}")
      // guarantee 2: one-sided error, bounded
      assert(est("hot1") <= 300 && est("hot1") >= 300 - err,
        s"hot1 estimate out of [${300 - err}, 300]: ${est("hot1")}")
      assert(est("hot2") <= 200 && est("hot2") >= 200 - err,
        s"hot2 estimate out of [${200 - err}, 200]: ${est("hot2")}")
      // no tail item can be overcounted past the bound
      est.foreach { case (k, v) =>
        if (k.startsWith("tail")) assert(v <= 1L, s"tail overcount: $k -> $v")
      }
    }
  }

  test("per-group sketches via groupBy") {
    val df = (Seq.fill(50)(("a", "x")) ++ Seq.fill(30)(("a", "y")) ++
      Seq.fill(40)(("b", "z")) ++ (0 until 20).map(i => ("b", s"t$i")))
      .toDF("g", "s")
    val out = df.groupBy(col("g"))
      .agg(HeavyHitters.sketch(col("s"), 8).as("m"))
      .collect().map(r => r.getString(0) -> r.getMap[String, Long](1).toMap).toMap
    assert(out("a")("x") == 50 && out("a")("y") == 30,
      s"group a uncompressed (2 distinct <= 8): ${out("a")}")
    assert(out("b").contains("z") && out("b")("z") >= 40 - 60 / 9,
      s"group b heavy item bound: ${out("b")}")
  }

  // ---- sketch-as-a-value lifecycle ---------------------------------

  test("stored per-slice states merge to the exact global map (exact regime)") {
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val merged = stream.zipWithIndex.map { case (s, i) => (i % 5, s) }
      .toDF("slice", "s").repartition(9)
      .groupBy($"slice")
      .agg(HeavyHitters.sketch($"s", 600).as("m"))
      .agg(HeavyHitters.mergeSketches($"m", 600).as("m"))
      .collect().head.getMap[String, Long](0).toMap
    assert(merged == exact)
  }

  test("merged lossy states keep the single-pass guarantees") {
    val n = stream.size.toLong
    val c = 20
    val err = n / (c + 1)
    val merged = stream.zipWithIndex.map { case (s, i) => (i % 7, s) }
      .toDF("slice", "s").repartition(13)
      .groupBy($"slice")
      .agg(HeavyHitters.sketch($"s", c).as("m"))
      .agg(HeavyHitters.mergeSketches($"m", c).as("m"))
      .collect().head.getMap[String, Long](0).toMap
    assert(merged.size <= c)
    assert(merged.contains("hot1") && merged.contains("hot2"))
    assert(merged("hot1") <= 300 && merged("hot1") >= 300 - err)
    assert(merged("hot2") <= 200 && merged("hot2") >= 200 - err)
  }
}
