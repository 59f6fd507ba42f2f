package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Diagnostics.spearman]]: the rank-correlation endpoints, a
  * hand-computed middle case, tie-break determinism, per-group
  * independence, and the degenerate-n null.
  */
class SpearmanSpec extends SparkSpec {

  import spark.implicits._

  private def rho(rows: Seq[(String, Double, Double, Long)]): Map[String, Option[Double]] =
    Diagnostics.spearman(rows.toDF("g", "x", "y", "id"),
        col("g"), col("x"), col("y"), col("id"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

  test("perfect monotone association is exactly ±1.0") {
    val up = (1 to 50).map(i => ("up", i.toDouble, i * i.toDouble, i.toLong))
    val down = (1 to 50).map(i => ("down", i.toDouble, -math.exp(i / 10.0), i.toLong))
    val got = rho(up ++ down)
    assert(got("up").contains(1.0), s"monotone-up must be exactly 1.0: $got")
    assert(got("down").contains(-1.0), s"monotone-down must be exactly -1.0: $got")
  }

  test("hand-computed case matches the d-squared formula exactly") {
    // ranks x: 1,2,3,4,5 ; y-values give ranks 2,1,4,3,5 -> sd2 = 4
    // rho = 1 - 6*4/(5*24) = 0.8
    val rows = Seq(
      ("g", 10.0, 20.0, 1L), ("g", 20.0, 10.0, 2L), ("g", 30.0, 40.0, 3L),
      ("g", 40.0, 30.0, 4L), ("g", 50.0, 50.0, 5L))
    assert(rho(rows)("g").contains(0.8))
  }

  test("ties break deterministically by the tie-break column") {
    // x all equal -> rx follows id; y descending in id -> ry reversed
    val rows = (1 to 20).map(i => ("t", 7.0, -i.toDouble, i.toLong))
    assert(rho(rows)("t").contains(-1.0))
  }

  test("groups are independent; n=1 yields null") {
    val rows = Seq(("a", 1.0, 1.0, 1L), ("a", 2.0, 2.0, 2L),
      ("b", 5.0, 5.0, 1L))
    val got = rho(rows)
    assert(got("a").contains(1.0) && got("b").isEmpty)
  }

  // ---- Gini --------------------------------------------------------

  private def giniOf(rows: Seq[(String, Long, Long)]): Map[String, Option[Double]] =
    Diagnostics.gini(rows.toDF("g", "v", "id"),
        col("g"), col("v"), col("id"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

  test("null values are SKIPPED by the rank-pick family (the SQL-aggregate rule)") {
    // pre-fix: NULLS FIRST ordering handed a null row rank 1 —
    // [null, 1, 1] read gini 0.333 instead of 0, a null x corrupted
    // every rho in its group, and robustOutliers' median shifted
    val g = Diagnostics.gini(
        Seq(("a", Option.empty[Long], 0L), ("a", Some(1L), 1L), ("a", Some(1L), 2L))
          .toDF("g", "v", "id"),
        col("g"), col("v"), col("id"))
      .select("gini").as[Option[Double]].collect().head
    assert(g.contains(0.0), s"gini over [null,1,1] must be 0 (nulls skipped), got $g")
    val rho = Diagnostics.spearman(
        Seq(("a", Option.empty[Long], Some(9L), 0L), ("a", Some(1L), Some(1L), 1L),
          ("a", Some(2L), Some(2L), 2L), ("a", Some(3L), Some(3L), 3L))
          .toDF("g", "x", "y", "id"),
        col("g"), col("x"), col("y"), col("id"))
      .select("rho").as[Option[Double]].collect().head
    assert(rho.contains(1.0),
      s"a null-x row must not corrupt the remaining perfect monotone pairs, got $rho")
    val med = Diagnostics.robustOutliers(
        Seq(("a", Option.empty[Long], 0L), ("a", Some(1L), 1L),
          ("a", Some(2L), 2L), ("a", Some(3L), 3L)).toDF("g", "v", "id"),
        col("g"), col("v"), col("id"))
      .select("med").as[Option[Long]].collect().head
    assert(med.contains(2L),
      s"median of [null,1,2,3] must be 2 (nulls skipped), got $med")
  }

  test("gini: perfectly even is 0; total concentration approaches (n-1)/n") {
    val even = (1 to 10).map(i => ("even", 7L, i.toLong))
    val conc = (1 to 9).map(i => ("conc", 0L, i.toLong)) :+ (("conc", 1000L, 10L))
    val got = giniOf(even ++ conc)
    assert(got("even").contains(0.0))
    assert(got("conc").contains(0.9), "one row holding all mass: (n-1)/n")
  }

  test("gini: hand-computed case and zero-mass null") {
    // values 1,2,3,4: W = 1+4+9+16 = 30; G = (60 - 5*10)/(4*10) = 0.25
    val rows = (1 to 4).map(i => ("h", i.toLong, i.toLong)) ++
      Seq(("z", 0L, 1L), ("z", 0L, 2L))
    val got = giniOf(rows)
    assert(got("h").contains(0.25))
    assert(got("z").isEmpty, "zero total mass has no defined concentration")
  }
}
