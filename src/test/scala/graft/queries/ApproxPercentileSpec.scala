package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The sketch swap for q70's exact rank-pick median at 100 TB:
  * `percentile_approx` (Greenwald-Khanna style summaries — bounded
  * memory, map-side partial merge) instead of a full per-group sort.
  * No cross-engine oracle is possible (quantile sketches differ per
  * engine), so the tested claim is the RANK error bound on the gated
  * tables: the approximate quantile's position among the group's
  * actual values stays within the sketch's accuracy parameter. GK is
  * deterministic for fixed input — a fixed fact, not a flaky sample.
  */
class ApproxPercentileSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("percentile_approx lands within rank tolerance of q70's exact median") {
    val accuracy = 10000 // Spark default: rank error <= n / accuracy
    val toks = QuerySpec.t(spark, dir, "documents")
      .select(col("lang"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("tok_n"))
    val approx = toks.groupBy(col("lang"))
      .agg(percentile_approx(col("tok_n"), lit(0.5), lit(accuracy)).as("m"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[String]("lang"),
        (r.getAs[Long]("m"), r.getAs[Long]("n")))).toMap
    assert(approx.nonEmpty)
    // rank of the approximate median among the group's true values
    val w = Window.partitionBy(col("lang")).orderBy(col("tok_n"))
    val ranked = toks.withColumn("rk", row_number().over(w)).collect()
      .groupBy(_.getAs[String]("lang"))
    approx.foreach { case (lang, (m, n)) =>
      val rows = ranked(lang)
      val below = rows.count(_.getAs[Long]("tok_n") < m)
      val atOrBelow = rows.count(_.getAs[Long]("tok_n") <= m)
      val target = (n + 1) / 2.0
      val tol = math.max(1.0, n.toDouble / accuracy)
      // the true rank interval covered by value m must intersect
      // [target - tol, target + tol]
      assert(below <= target + tol && atOrBelow >= target - tol,
        s"$lang: approx median $m covers ranks (${below + 1}..$atOrBelow) " +
          s"but target is $target ± $tol of $n")
    }
  }

  test("approximate and exact medians agree on the sf0.01 distribution") {
    // at default accuracy the sketch holds every group exactly on this
    // data size (n << accuracy): the swap is free until groups outgrow
    // the summary, which is the 100 TB regime it exists for
    val got = QuerySpec.t(spark, dir, "documents")
      .select(col("lang"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("tok_n"))
      .groupBy(col("lang"))
      .agg(percentile_approx(col("tok_n"), lit(0.5), lit(10000)).as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = LlmQueries.specs.find(_.name == "q70_median_length").get
      .fn(spark, dir)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("median_tok"))).toMap
    got.foreach { case (lang, m) =>
      // GK's median pick may differ from the (n+1)/2 rank convention by
      // one position on even-sized groups; both picks are true values
      val e = exact(lang)
      assert(math.abs(m - e) <= math.max(1L, e / 20),
        s"$lang: approx $m vs exact rank-pick $e")
    }
  }
}
