package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DataAudit semantics: null-predicate counting, uniqueness arithmetic,
  * FK null-child vacuity, single-scan folding of scalar rules, and the
  * no-row-multiplication property of the referential join.
  */
class DataAuditSpec extends SparkSpec {

  import spark.implicits._
  import DataAudit._

  private def resultMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("NotNull counts rows where ANY listed column is null") {
    val df = Seq(
      (Some(1), Some("a")), (None, Some("b")), (Some(3), None),
      (None, None)).toDF("k", "v")
    val r = resultMap(audit(df, Seq(NotNull("nn", Seq("k", "v")))))
    assert(r("nn") == (4L, 3L))
  }

  test("Unique: each extra copy counts once; null keys are not duplicates") {
    val df = Seq(Some(1), Some(1), Some(1), Some(2), None, None).toDF("k")
    val r = resultMap(audit(df, Seq(Unique("u", "k"))))
    // checked = 4 non-null keys; violations = 4 - 2 distinct = 2
    assert(r("u") == (4L, 2L))
  }

  test("Satisfies: a null predicate is a violation (unevaluable = failing)") {
    val df = Seq(Some(5), Some(50), None).toDF("x")
    val r = resultMap(audit(df, Seq(Satisfies("cap", col("x") <= 10))))
    assert(r("cap") == (3L, 2L))
  }

  test("inRange is inclusive on both bounds and rejects nulls") {
    val df = Seq(Some(1.0), Some(50.0), Some(50.5), Some(0.5), None).toDF("x")
    val r = resultMap(audit(df, Seq(inRange("rg", "x", lit(1.0), lit(50.0)))))
    assert(r("rg") == (5L, 3L))
  }

  test("RefIntegrity: orphans counted once even against duplicate parents") {
    val child = Seq(Some(1), Some(2), Some(2), Some(9), None).toDF("fk")
    val parent = Seq(1, 1, 2).toDF("pk") // duplicate parent keys
    val r = resultMap(audit(child,
      Seq(RefIntegrity("fk", "fk", parent, "pk"))))
    // null child vacuously passes; the left join against DISTINCT
    // parents must not multiply the two fk=2 rows
    assert(r("fk") == (4L, 1L))
  }

  test("all scalar rules fold into a single aggregation pass") {
    val df = Seq((1, "a"), (2, null.asInstanceOf[String])).toDF("k", "v")
    val out = audit(df, Seq(
      NotNull("nn", Seq("v")), Unique("u", "k"),
      Satisfies("s", col("k") < 10)))
    assert(resultMap(out) ==
      Map("nn" -> (2L, 1L), "u" -> (2L, 0L), "s" -> (2L, 0L)))
    // one Aggregate over the base relation — not one per rule
    val aggs = out.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1, s"expected ONE fused aggregate, got ${aggs.size}")
  }

  test("empty table: zero checked, zero violations, rules still reported") {
    val df = Seq.empty[(Option[Int], Option[Int])].toDF("k", "v")
    val r = resultMap(audit(df, Seq(
      NotNull("nn", Seq("k")), Unique("u", "k"),
      RefIntegrity("fk", "k", Seq(1).toDF("pk"), "pk"))))
    assert(r == Map("nn" -> (0L, 0L), "u" -> (0L, 0L), "fk" -> (0L, 0L)))
  }

  test("duplicate rule names are rejected") {
    val df = Seq(1).toDF("k")
    intercept[IllegalArgumentException] {
      audit(df, Seq(Unique("x", "k"), NotNull("x", Seq("k"))))
    }
  }
}
