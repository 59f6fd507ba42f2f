package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The HLL swap q60's comment promises: at 100 TB the exact
  * expand-based multi-distinct becomes `approx_count_distinct`
  * (HyperLogLog++ — constant-size sketches that partial-aggregate
  * map-side instead of shipping one dedup lane per distinct column).
  * No cross-engine oracle is possible (every engine's sketch differs),
  * so the tested claim is the error bound on the gated tables: the
  * approximate count stays within ~5% of the exact one (the default
  * rsd), per group and globally. HLL++ is deterministic for fixed
  * input, so this is a fixed fact, not a flaky sample.
  */
class ApproxDistinctSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def relErr(exact: Long, approx: Long): Double =
    if (exact == 0) (if (approx == 0) 0.0 else 1.0)
    else math.abs(approx - exact).toDouble / exact

  test("approx_count_distinct tracks q60's exact multi-distinct within the HLL bound") {
    val rows = QuerySpec.t(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(to_date(col("ts"))).as("exact_days"),
        approx_count_distinct(to_date(col("ts"))).as("approx_days"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val eu = relErr(r.getAs[Long]("exact_users"), r.getAs[Long]("approx_users"))
      val ed = relErr(r.getAs[Long]("exact_days"), r.getAs[Long]("approx_days"))
      assert(eu <= 0.05 && ed <= 0.05,
        s"${r.getAs[String]("event_type")}: user err $eu, day err $ed exceed 5%")
    }
  }

  test("approx_count_distinct holds the bound on a high-cardinality text column") {
    val r = QuerySpec.t(spark, dir, "documents")
      .agg(countDistinct(col("text")).as("exact"),
        approx_count_distinct(col("text")).as("approx"))
      .collect().head
    val err = relErr(r.getAs[Long]("exact"), r.getAs[Long]("approx"))
    assert(err <= 0.05, s"text cardinality err $err exceeds 5%")
    // tightening rsd tightens the estimate (the knob a 100 TB profile
    // turns when 5% is too loose): rsd=0.01 must do at least as well
    val tight = QuerySpec.t(spark, dir, "documents")
      .agg(approx_count_distinct(col("text"), 0.01).as("approx"))
      .collect().head.getAs[Long]("approx")
    assert(relErr(r.getAs[Long]("exact"), tight) <= 0.02,
      s"rsd=0.01 estimate $tight too far from exact ${r.getAs[Long]("exact")}")
  }
}
