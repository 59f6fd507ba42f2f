package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IVF ANN semantics: probing every centroid is exactly brute force,
  * identical vectors are recalled at one probe (same quantizer cell),
  * and training/search are deterministic.
  */
class IvfSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 8
  private def corpus = (0 until 60).map { i =>
    (i.toLong, Array.tabulate(dim)(d => math.sin(i * 13 + d * 7).toFloat))
  }.toDF("vec_id", "embedding")

  test("probing all centroids equals brute-force top-k") {
    val cents = VectorFunctions.ivfTrain(corpus, "embedding", dim, k = 4, iters = 2)
    val queries = corpus.filter(col("vec_id") < 6)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("rank"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(1 + 1))).toSet
    val ivf = key(VectorFunctions.ivfTopK(queries, corpus, "vec_id", "embedding",
      dim, k = 3, cents, nProbes = cents.length))
    val brute = key(VectorFunctions.bruteForceTopK(queries, corpus, "vec_id",
      "embedding", k = 3))
    assert(ivf == brute)
  }

  test("identical vector lands in the query's own cell: recalled at nProbes = 1") {
    val planted = (0 until 6).map { i =>
      (i + 1000L, Array.tabulate(dim)(d => math.sin(i * 13 + d * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val all = corpus.union(planted)
    val cents = VectorFunctions.ivfTrain(all, "embedding", dim, k = 4, iters = 2)
    val queries = corpus.filter(col("vec_id") < 6)
    val got = VectorFunctions.ivfTopK(queries, all, "vec_id", "embedding",
        dim, k = 3, cents, nProbes = 1)
      .filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id"), col("sim")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    (0 until 6).foreach { i =>
      val (n, sim) = got(i.toLong)
      assert(n == i + 1000L && sim == 1.0,
        s"query $i: expected its exact copy first, got $n @ $sim")
    }
  }

  test("training and search are deterministic across runs") {
    def run() = {
      val cents = VectorFunctions.ivfTrain(corpus, "embedding", dim, k = 4, iters = 2)
      VectorFunctions.ivfTopK(corpus.filter(col("vec_id") < 4), corpus,
        "vec_id", "embedding", dim, k = 3, cents, nProbes = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    }
    assert(run() == run())
  }
}
