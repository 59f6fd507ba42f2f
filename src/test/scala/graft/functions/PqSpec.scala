package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product-quantization ANN semantics (the q77 anchor, IvfSpec's
  * pattern): a refine window covering the corpus degrades gracefully
  * to exact brute force, a planted exact copy survives the lossy ADC
  * candidate pass even at the smallest refine (its asymmetric distance
  * is ~0, so it always makes the candidate cut and exact re-rank puts
  * it first), and train/search are deterministic.
  */
class PqSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 8
  private def corpus = (0 until 60).map { i =>
    (i.toLong, Array.tabulate(dim)(d => math.sin(i * 13 + d * 7).toFloat))
  }.toDF("vec_id", "embedding")

  private def key(df: org.apache.spark.sql.DataFrame) =
    df.select(col("query_id"), col("rank"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("refine covering the corpus equals brute-force top-k (lossless fallback)") {
    val books = VectorFunctions.pqTrain(corpus, "embedding", dim, m = 4,
      ksub = 8, iters = 2)
    val queries = corpus.filter(col("vec_id") < 6)
    val pq = key(VectorFunctions.pqTopK(queries, corpus, "vec_id", "embedding",
      dim, k = 3, books, refine = 60)) // k*refine >= |corpus|: ADC prunes nothing
    val brute = key(VectorFunctions.bruteForceTopK(queries, corpus, "vec_id",
      "embedding", k = 3))
    assert(pq == brute)
  }

  test("a wrong-dimension corpus vector is filtered, not read out of bounds") {
    // pre-fix: pqEncode indexed to dim-1 on an unguarded corpus —
    // a short vector threw on GenericArrayData or silently read
    // adjacent heap on the unchecked UnsafeArrayData fast path
    // (nondeterministic codes, wrong neighbors). pqTrain always
    // guarded; pqTopK now guards both sides the same way.
    val books = VectorFunctions.pqTrain(corpus, "embedding", dim, m = 4,
      ksub = 8, iters = 2)
    val queries = corpus.filter(col("vec_id") < 6)
    val clean = key(VectorFunctions.pqTopK(queries, corpus, "vec_id",
      "embedding", dim, k = 3, books, refine = 60))
    val dirty = corpus.unionByName(
      Seq((9999L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding"))
    val got = key(VectorFunctions.pqTopK(queries, dirty, "vec_id",
      "embedding", dim, k = 3, books, refine = 60))
    assert(got == clean,
      "a short vector must be excluded, never encoded or returned")
  }

  test("planted exact copy is recalled at refine = 1 despite lossy codes") {
    val planted = (0 until 6).map { i =>
      (i + 1000L, Array.tabulate(dim)(d => math.sin(i * 13 + d * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val all = corpus.union(planted)
    // An exact copy shares the query's own code word, which has the
    // MINIMUM possible ADC distance — but only ties on it: any other
    // vector landing in the same cell in EVERY subspace ties and
    // id-order can push the copy out of a refine=1 candidate cut (a
    // coarse 4x8 codebook does collide here — found by this test's
    // first version). Fine quantization (m=8 scalar subspaces, 16
    // centroids each) makes full-word collisions vanish, which is the
    // regime the refine=1 guarantee needs.
    val books = VectorFunctions.pqTrain(all, "embedding", dim, m = 8,
      ksub = 16, iters = 2)
    val got = VectorFunctions.pqTopK(corpus.filter(col("vec_id") < 6), all,
        "vec_id", "embedding", dim, k = 3, books, refine = 1)
      .filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id"), col("sim")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    (0 until 6).foreach { i =>
      val (n, sim) = got(i.toLong)
      assert(n == i + 1000L && sim == 1.0,
        s"query $i: expected its exact copy first, got $n @ $sim")
    }
  }

  test("practical regime (1 < refine << corpus): recall vs brute force stays high") {
    // the regime q77 actually runs in — ADC prunes most of the corpus,
    // exact re-rank fixes ordering among survivors. A broken ADC
    // distance that still passes the two extreme tests (covering
    // refine = lossless; exact copies rank first trivially) tanks
    // recall here.
    val books = VectorFunctions.pqTrain(corpus, "embedding", dim, m = 4,
      ksub = 8, iters = 2)
    val queries = corpus.filter(col("vec_id") < 10)
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .map { case (q, ns) => q -> ns.map(_._2).toSet }
    val pq = topSets(VectorFunctions.pqTopK(queries, corpus, "vec_id",
      "embedding", dim, k = 3, books, refine = 4))
    val brute = topSets(VectorFunctions.bruteForceTopK(queries, corpus,
      "vec_id", "embedding", k = 3))
    val hits = brute.map { case (q, b) => (pq(q) & b).size }.sum
    val total = brute.values.map(_.size).sum
    val recall = hits.toDouble / total
    assert(recall >= 0.8, f"recall@3 at refine=4 fell to $recall%.2f ($hits/$total)")
  }

  test("bounded-sample training (N << corpus) keeps ADC recall within the full-training bound") {
    // same contract as IvfSpec's bounded-sample row: codebooks fitted
    // on the deterministic hash-top-N subset (floored at 64·ksub = 512
    // of 700 vectors) must not tank practical-regime recall
    val big = (0 until 700).map { i =>
      (i.toLong, Array.tabulate(dim)(d => math.sin(i * 13 + d * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = big.filter(col("vec_id") < 8)
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
        .map { case (q, ns) => q -> ns.map(_._2).toSet }
    val brute = topSets(VectorFunctions.bruteForceTopK(queries, big,
      "vec_id", "embedding", k = 3))
    def recall(books: Array[Array[Array[Double]]]): Double = {
      val pq = topSets(VectorFunctions.pqTopK(queries, big, "vec_id",
        "embedding", dim, k = 3, books, refine = 8))
      val hits = brute.map { case (q, b) => (pq.getOrElse(q, Set.empty) & b).size }.sum
      hits.toDouble / brute.values.map(_.size).sum
    }
    val full = VectorFunctions.pqTrain(big, "embedding", dim, m = 4,
      ksub = 8, iters = 2) // default sample >> 700: the whole corpus
    val sampled = VectorFunctions.pqTrain(big, "embedding", dim, m = 4,
      ksub = 8, iters = 2, trainSampleN = 1) // floors to 64*8 = 512
    val (rFull, rSampled) = (recall(full), recall(sampled))
    // the contract is RELATIVE: codes from subset-fitted books must not
    // lose materially more than full-corpus-fitted ones (absolute
    // recall on this dense sin-lattice corpus is codebook-resolution
    // bound — 2-dim subspaces at ksub=8 — for BOTH trainings alike)
    assert(rSampled >= rFull - 0.15,
      f"sampled-training recall $rSampled%.2f fell more than 0.15 below full-training $rFull%.2f")
    assert(rSampled > 0.2, f"sampled-training recall degenerate: $rSampled%.2f (full: $rFull%.2f)")
  }

  test("codebook training and search are deterministic across runs") {
    def run() = {
      val books = VectorFunctions.pqTrain(corpus, "embedding", dim, m = 4,
        ksub = 8, iters = 2)
      VectorFunctions.pqTopK(corpus.filter(col("vec_id") < 4), corpus,
        "vec_id", "embedding", dim, k = 3, books, refine = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    }
    assert(run() == run())
  }
}
