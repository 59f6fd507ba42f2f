package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-similarity operators over `ARRAY<FLOAT/DOUBLE>` columns.
  * All arithmetic is built from `zip_with`/`aggregate` column
  * expressions (codegen'd, sequential left fold — deterministic and
  * bit-reproducible across runs), never UDFs.
  */
object VectorFunctions {

  /** Sequential-fold dot product of two equal-length vectors. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force top-k cosine neighbors of `queries` within `corpus`.
    * Shape: broadcast the (small) query set against the corpus, then a
    * per-query window top-k. At cluster scale this is the exact
    * baseline: the corpus never shuffles — each partition scores its
    * rows against the broadcast queries; only k rows per query survive
    * to the final (tiny) sort.
    *
    * @param queries frame with (`idCol`, `vecCol`) — must be small
    *                (broadcast side).
    * @param corpus  frame with (`idCol`, `vecCol`).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // norms are per-ROW, computed before the join — inside the join
    // they'd be re-derived once per PAIR (3 array passes per pair
    // instead of 1; at |corpus|×|queries| pairs that dominates)
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", l2Norm(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("sim"), 4).as("sim"))
  }

  /** Sign-random-projection bucket id (LSH for cosine): `nBits`
    * deterministic pseudo-random hyperplanes derived from xxhash64 of
    * (seed, dim index) — no stored model, reproducible on any cluster.
    * Vectors in the same bucket are candidate near-neighbors; probing
    * only the query's bucket turns O(N) scans into O(N / 2^nBits).
    */
  def srpBucket(vec: Column, dim: Int, nBits: Int, seed: Int = 42): Column = {
    val bits = (0 until nBits).map { b =>
      // hyperplane component h[d] in {-1,+1} from a portable hash
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (v, d) => v * (pmod(xxhash64(lit(seed), lit(b), d), lit(2L)) * 2 - 1).cast("double")),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** IVF-style ANN: bucket corpus and queries by [[srpBucket]], join on
    * bucket, then exact top-k within candidates. Trades recall for a
    * ~2^nBits candidate reduction. `probes` > 1 is MULTI-PROBE: each
    * query also inspects the buckets at Hamming distance 1 from its
    * own (flipping one hyperplane sign — the most likely place for a
    * near neighbor to fall), recovering most of single-probe's lost
    * recall for a probes× (not 2^nBits×) candidate increase. Only the
    * (small, broadcast) query side multiplies; the corpus is bucketed
    * once. */
  def srpTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, nBits: Int = 4,
      probes: Int = 1): DataFrame = {
    require(probes >= 1 && probes <= nBits + 1, "probes must be in [1, nBits+1]")
    val q0 = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("home", srpBucket(col("qv"), dim, nBits))
      .withColumn("qn", l2Norm(col("qv")))
    // probe buckets: home plus home with bit b flipped, b < probes-1 …
    // flipping the LOWEST bits first is arbitrary but deterministic;
    // a score-ordered probe sequence would need the margins, omitted
    val q = q0.select(col("query_id"), col("qv"), col("qn"), col("home"),
        explode(array((lit(-1) +: (0 until probes - 1).map(lit(_))): _*)).as("flip"))
      .withColumn("bucket",
        when(col("flip") < 0, col("home"))
          .otherwise(col("home").bitwiseXOR(expr("shiftleft(CAST(1 AS BIGINT), flip)"))))
      .drop("flip", "home")
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
      .withColumn("bucket", srpBucket(col("cv"), dim, nBits))
      .withColumn("cn", l2Norm(col("cv")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      // a neighbor can appear via several probes — dedup before ranking
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("sim"), 4).as("sim"))
  }
}
