package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The semantic-dedup scale paths in their PRODUCTION regime — the
  * evidence the oracle gates can't carry. q71/q72 hash-match the
  * pipelines on planted EXACT copies (deterministic recall); this spec
  * covers what the gates deliberately leave out:
  *
  *  - NEAR-miss recall: planted near-duplicate groups at cosine ≈0.99
  *    (a deterministic perturbation, not copies), threshold 0.9 — the
  *    regime SemDeDup actually runs (dedup at t ≥ 0.9, where banding
  *    prunes; the low-threshold q49/q58 twins exist only because the
  *    synthetic corpus has no high-cosine pairs).
  *  - CANDIDATE VOLUME: the 100 TB claim is that candidate generation
  *    is a small fraction of all-pairs. Measured directly by counting
  *    verified candidates at threshold = -1 (keeps every candidate
  *    pair the bucketing emits).
  *
  * Corpus is sf0.1-sized (2000 base + 120 planted copies, dim 64) and
  * fully deterministic (splitmix64 components), so every assertion is
  * a fixed fact about the algorithms, not a flaky sample.
  */
class SemanticDedupScaleSpec extends SparkSpec {

  import spark.implicits._

  private val Dim = 64
  private val NBase = 2000
  private val NGroups = 60 // leaders 0, 33, 66, … with 2 perturbed copies each

  /** splitmix64 finalizer → uniform double in [-1, 1) — iid per (id,
    * dim) cell, so pairwise base cosines concentrate near 0 (std
    * 1/√dim ≈ 0.125; max over 2.2M pairs ≪ 0.9). A trig-indexed
    * generator would alias into high-cosine phase pairs. */
  private def u(seed: Long): Double = {
    var z = seed * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    (z >>> 11) * (1.0 / (1L << 52)) - 1.0
  }

  private def baseVec(i: Long): Array[Double] =
    Array.tabulate(Dim)(d => u(i * Dim + d))

  /** leader + 0.08·noise: cosine ≈ 0.996 — inside the production
    * threshold with margin, but NOT an exact copy (recall is earned,
    * not guaranteed). */
  private def perturbed(leader: Long, copyId: Long): Array[Double] = {
    val v = baseVec(leader)
    Array.tabulate(Dim)(d => v(d) + 0.08 * u(copyId * Dim + d + 7777777L))
  }

  private lazy val leaders: Seq[Long] = (0 until NGroups).map(_ * 33L)
  private lazy val plantedGroups: Seq[Seq[Long]] =
    leaders.map(l => Seq(l, 100000L + 2 * l, 100001L + 2 * l))

  private lazy val corpus = {
    val base = (0 until NBase).map(i => (i.toLong, baseVec(i)))
    val copies = plantedGroups.flatMap { g =>
      g.tail.map(id => (id, perturbed(g.head, id)))
    }
    (base ++ copies).toDF("vec_id", "embedding")
      .repartition(8).cache()
  }
  private lazy val nTotal = NBase + 2 * NGroups
  private lazy val allPairs = nTotal.toLong * (nTotal - 1) / 2

  /** Ground truth for the planted edges, computed exactly (tiny join:
    * 3 vectors per group). */
  private lazy val plantedPairs: Set[(Long, Long)] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val byId = plantedGroups.flatMap { g =>
      g.map(id => id -> (if (id == g.head) baseVec(id) else perturbed(g.head, id)))
    }.toMap
    val pairs = for {
      g <- plantedGroups
      a <- g; b <- g if a < b
    } yield ((a, b), cos(byId(a), byId(b)))
    // sanity: the construction actually lands in the production band
    assert(pairs.forall(_._2 >= 0.95),
      s"planted cosine fell below 0.95: ${pairs.filter(_._2 < 0.95)}")
    pairs.map(_._1).toSet
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("SRP banding at t=0.9/nBits=8: candidate volume << all-pairs, planted near-dups recalled") {
    // threshold = -1 keeps every candidate the banding emits: the
    // count IS the verification workload the 100 TB plan pays
    val nCand = VectorFunctions.cosineNearDupBucketed(
      corpus, "vec_id", "embedding", dim = Dim, threshold = -1.0,
      nBits = 8, bands = 4).count()
    info(s"SRP candidates: $nCand of $allPairs all-pairs (${nCand * 100.0 / allPairs}%)")
    assert(nCand * 10 < allPairs,
      s"SRP banding must prune >=90% of all-pairs in the production regime, " +
        s"got $nCand of $allPairs")

    val found = pairSet(VectorFunctions.cosineNearDupBucketed(
      corpus, "vec_id", "embedding", dim = Dim, threshold = 0.9,
      nBits = 8, bands = 4))
    val recalled = plantedPairs.count(found.contains)
    info(s"SRP planted-pair recall: $recalled/${plantedPairs.size}")
    assert(recalled >= plantedPairs.size * 97 / 100,
      s"planted near-dup recall too low: $recalled/${plantedPairs.size}")
    // precision is exact by construction: nothing below threshold
    // survives verification, and only planted pairs sit above it
    assert(found.subsetOf(plantedPairs),
      s"non-planted pair above 0.9 — generator broken: ${found.diff(plantedPairs).take(5)}")
  }

  test("SRP end-to-end: every planted group co-clusters at t=0.9") {
    val clusters = VectorFunctions.semanticDedupBucketed(
        corpus, "vec_id", "embedding", dim = Dim, threshold = 0.9,
        nBits = 8, bands = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    plantedGroups.foreach { g =>
      val roots = g.map(clusters.get).toSet
      assert(roots.size == 1 && roots.head.nonEmpty,
        s"planted group $g split across clusters: $roots")
    }
    // exactly the planted docs appear (no false memberships)
    assert(clusters.keySet == plantedGroups.flatten.toSet)
  }

  test("k-means at probes=1, t=0.9: candidate volume << all-pairs, planted near-dups recalled") {
    val cents = VectorFunctions.ivfTrain(corpus, "embedding", dim = Dim, k = 32)
    val nCand = VectorFunctions.kmeansNearDupPairs(
      corpus, "vec_id", "embedding", dim = Dim, threshold = -1.0, cents,
      probes = 1).count()
    info(s"k-means candidates: $nCand of $allPairs all-pairs (${nCand * 100.0 / allPairs}%)")
    // balanced cells give ~n²/2k = allPairs/32; skew eats some of the
    // margin — 5x is the claim worth defending (SemDeDup's own k is
    // corpus-proportional precisely to hold this ratio)
    assert(nCand * 5 < allPairs,
      s"k-means cells must prune >=80% of all-pairs, got $nCand of $allPairs")

    val found = pairSet(VectorFunctions.kmeansNearDupPairs(
      corpus, "vec_id", "embedding", dim = Dim, threshold = 0.9, cents,
      probes = 1))
    val recalled = plantedPairs.count(found.contains)
    info(s"k-means planted-pair recall: $recalled/${plantedPairs.size}")
    // single-probe loses only boundary-straddling copies; at cos≈0.996
    // copies hug the leader's centroid
    assert(recalled >= plantedPairs.size * 95 / 100,
      s"planted near-dup recall too low at probes=1: $recalled/${plantedPairs.size}")
  }

  test("k-means end-to-end: planted groups co-cluster at probes=1") {
    val clusters = VectorFunctions.semanticDedupKmeans(
        corpus, "vec_id", "embedding", dim = Dim, threshold = 0.9, k = 32,
        probes = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val intact = plantedGroups.count { g =>
      val roots = g.map(clusters.get).toSet
      roots.size == 1 && roots.head.nonEmpty
    }
    info(s"k-means intact groups: $intact/$NGroups")
    assert(intact >= NGroups * 95 / 100,
      s"too many planted groups split at probes=1: $intact/$NGroups")
  }
}
