package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[DistinctSketch]] evidence beyond the q121 sparse-exact gate:
  * dense-regime accuracy inside the 3σ envelope, duplicate
  * idempotence, and the property the compaction sketches can't offer
  * — the estimate is IDENTICAL under any partitioning, because every
  * merge path is a commutative, idempotent max/union. */
class DistinctSketchSpec extends SparkSpec {
  import spark.implicits._

  // splitmix64 finalizer: a bijection on Long (n distinct guaranteed)
  // whose output bits are hash-quality — a plain odd-constant multiply
  // keeps arithmetic structure in the low bits and wrecks HLL's
  // geometric rho distribution (observed 1.9x overestimates).
  private def spread(n: Int): Seq[Long] =
    (1 to n).map { i =>
      var z = i.toLong + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }

  test("sparse regime is exact and partitioning-invariant") {
    val vals = spread(5000)
    for (parts <- Seq(1, 7, 32)) {
      val est = vals.toDF("h").repartition(parts)
        .agg(DistinctSketch.sketch($"h", p = 12, sparseMax = 8192))
        .head.getLong(0)
      assert(est === 5000L, s"parts=$parts")
    }
  }

  test("duplicates are idempotent in both regimes") {
    val vals = spread(2000)
    val tripled = vals ++ vals ++ vals
    for (sparseMax <- Seq(8192, 64)) {
      val once = vals.toDF("h")
        .agg(DistinctSketch.sketch($"h", 12, sparseMax)).head.getLong(0)
      val thrice = tripled.toDF("h").repartition(13)
        .agg(DistinctSketch.sketch($"h", 12, sparseMax)).head.getLong(0)
      assert(once === thrice, s"sparseMax=$sparseMax")
    }
  }

  test("dense regime: within 3 sigma (~4.9% at p=12) and identical " +
      "across partitionings") {
    val vals = spread(50000)
    val ests = Seq(1, 7, 32).map { parts =>
      vals.toDF("h").repartition(parts)
        .agg(DistinctSketch.sketch($"h", p = 12, sparseMax = 64))
        .head.getLong(0)
    }
    assert(ests.distinct.size === 1,
      s"dense estimate must be merge-order independent: $ests")
    val err = math.abs(ests.head - 50000L) / 50000.0
    assert(err <= 3 * 1.04 / math.sqrt(4096.0), s"err=$err est=${ests.head}")
  }

  test("linear-counting low range stays tight even when forced dense") {
    val vals = spread(200)
    val est = vals.toDF("h")
      .agg(DistinctSketch.sketch($"h", p = 12, sparseMax = 0))
      .head.getLong(0)
    assert(math.abs(est - 200L) <= 5, s"est=$est")
  }

  test("grouped: per-group sketches stay independent") {
    val df = spread(3000).zipWithIndex
      .map { case (h, i) => (i % 3, h) }.toDF("g", "h")
    val out = df.repartition(9)
      .groupBy($"g")
      .agg(DistinctSketch.sketch($"h", 12, 8192).as("d"))
      .orderBy($"g")
      .as[(Int, Long)].collect().toSeq
    assert(out === Seq((0, 1000L), (1, 1000L), (2, 1000L)))
  }
}
