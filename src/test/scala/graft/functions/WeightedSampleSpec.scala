package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Weighted deterministic sampling (Efraimidis–Spirakis A-ES over the
  * portable hash): partitioning-invariant, weight-monotone, mergeable
  * (the property TakeOrdered's distributed top-k shape relies on), and
  * zero-mass rows never sampled.
  */
class WeightedSampleSpec extends SparkSpec {

  import spark.implicits._

  // 200 light rows (w=1) + 200 heavy rows (w=10)
  private def corpus = (0 until 400).map { i =>
    (i.toLong, if (i < 200) 1L else 10L)
  }.toDF("id", "w")

  test("null-key rows are excluded, never sampled (NULLS FIRST would rank them on top)") {
    // pre-fix: saltedHash(null) is null, ascending rank is NULLS
    // FIRST, so null-key rows claimed the top k slots and displaced
    // every valid row
    val dirty = Seq((Some(1L), 5L), (Some(2L), 5L),
      (Option.empty[Long], 1000L), (Option.empty[Long], 1000L))
      .toDF("id", "w")
    val got = SamplingFunctions.weightedSample(dirty, col("id"), col("w"), 3)
      .select("id").as[Option[Long]].collect().toSet
    assert(got == Set(Some(1L), Some(2L)),
      s"null keys must not win sample slots, got $got")
    val perGroup = SamplingFunctions.weightedPerGroup(
        dirty.withColumn("g", lit("x")), col("g"), col("id"), col("w"), 3)
      .select("id").as[Option[Long]].collect().toSet
    assert(perGroup == Set(Some(1L), Some(2L)))
    val resv = SamplingFunctions.reservoirPerGroup(
        dirty.withColumn("g", lit("x")), col("g"), col("id"), 3)
      .select("id").as[Option[Long]].collect().toSet
    assert(resv == Set(Some(1L), Some(2L)))
  }

  test("weightedSample is deterministic and partitioning-invariant") {
    val a = SamplingFunctions.weightedSample(corpus, col("id"), col("w"), 60)
      .select("id").as[Long].collect().toSet
    val b = SamplingFunctions.weightedSample(
        corpus.repartition(17), col("id"), col("w"), 60)
      .select("id").as[Long].collect().toSet
    assert(a == b, "same corpus must yield the same sample under any partitioning")
    assert(a.size == 60)
  }

  test("a dominant-weight row is always sampled") {
    val planted = corpus.union(Seq((999999L, 1000000000L)).toDF("id", "w"))
    val ids = SamplingFunctions.weightedSample(planted, col("id"), col("w"), 5)
      .select("id").as[Long].collect().toSet
    assert(ids.contains(999999L),
      "a row with ~1e9x the total remaining mass must appear in any top-5 draw")
  }

  test("inclusion odds scale with weight") {
    // one deterministic draw per salt; aggregate inclusion over salts.
    // E[P(heavy)] / E[P(light)] ~ 10 at small k; >= 3x is a loose,
    // flake-free bound over 20 x k=40 = 800 slots.
    var heavy, light = 0L
    for (s <- 0 until 20) {
      val draw = SamplingFunctions.weightedSample(
        corpus, col("id"), col("w"), 40, salt = s"odds$s")
      val byW = draw.groupBy("w").count().as[(Long, Long)].collect().toMap
      heavy += byW.getOrElse(10L, 0L)
      light += byW.getOrElse(1L, 0L)
    }
    assert(heavy > 3 * light,
      s"10x-weight rows must dominate the sample: heavy=$heavy light=$light")
  }

  test("exponential ranks are mergeable: global top-k == merged per-split top-k") {
    val k = 30
    val global = SamplingFunctions.weightedSample(corpus, col("id"), col("w"), k)
      .select("id").as[Long].collect().toSet
    // split the corpus 3 ways, take top-k in each, merge, take top-k again
    val splits = (0 until 3).map(i =>
      SamplingFunctions.weightedSample(
        corpus.filter(pmod(col("id"), lit(3)) === i), col("id"), col("w"), k))
    val merged = SamplingFunctions.weightedSample(
        splits.reduce(_ union _), col("id"), col("w"), k)
      .select("id").as[Long].collect().toSet
    assert(merged == global,
      "A-ES ranks must merge: distributed per-split top-k then re-top-k " +
        "must equal the single-pass global top-k")
  }

  test("weightedPerGroup caps each group at n, keeps schema, and is deterministic") {
    val grouped = corpus.withColumn("g", pmod(col("id"), lit(4)))
    val out = SamplingFunctions.weightedPerGroup(
      grouped, col("g"), col("id"), col("w"), n = 7)
    assert(out.columns.toSeq == Seq("id", "w", "g"), "internal rank must not leak")
    val sizes = out.groupBy("g").count().as[(Long, Long)].collect().toMap
    assert(sizes.values.forall(_ == 7), s"every group capped at 7: $sizes")
    val again = SamplingFunctions.weightedPerGroup(
      grouped.repartition(11), col("g"), col("id"), col("w"), n = 7)
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
  }

  test("rows with non-positive weight are excluded") {
    val withDead = corpus.union(Seq((5000L, 0L), (5001L, -3L)).toDF("id", "w"))
    val ids = SamplingFunctions.weightedSample(
        withDead, col("id"), col("w"), 400)
      .select("id").as[Long].collect().toSet
    assert(!ids.contains(5000L) && !ids.contains(5001L),
      "zero/negative weight rows have no sampling mass")
  }
}
