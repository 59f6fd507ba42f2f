package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Diagnostics.imputeGroupMedian]]: rank-pick median repair with the
  * even-group rule, all-null and no-null groups, and the
  * one-shuffle/no-join plan shape.
  */
class ImputeSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, Option[Long], Long)]) =
    Diagnostics.imputeGroupMedian(rows.toDF("g", "v", "id"),
        col("g"), col("v"), col("id"))
      .orderBy("g", "id")
      .select("g", "id", "imputed", "was_null")
      .as[(String, Long, Option[Long], Boolean)].collect().toList

  test("nulls take the group's lower-middle median; values stay put") {
    val rows = Seq(
      ("a", Some(10L), 1L), ("a", Some(30L), 2L), ("a", Some(20L), 3L),
      ("a", None, 4L),                            // median(10,20,30)=20
      ("b", Some(1L), 1L), ("b", Some(9L), 2L), ("b", None, 3L))
    // group b: 2 non-nulls -> (2+1) div 2 = 1 -> lower middle = 1
    assert(run(rows) == List(
      ("a", 1L, Some(10L), false), ("a", 2L, Some(30L), false),
      ("a", 3L, Some(20L), false), ("a", 4L, Some(20L), true),
      ("b", 1L, Some(1L), false), ("b", 2L, Some(9L), false),
      ("b", 3L, Some(1L), true)))
  }

  test("all-null group keeps its nulls; no-null group is untouched") {
    val rows = Seq(
      ("x", Option.empty[Long], 1L), ("x", Option.empty[Long], 2L),
      ("y", Some(5L), 1L), ("y", Some(7L), 2L))
    assert(run(rows) == List(
      ("x", 1L, None, true), ("x", 2L, None, true),
      ("y", 1L, Some(5L), false), ("y", 2L, Some(7L), false)))
  }

  test("plan shape: one exchange, no join") {
    val df = Seq(("a", Some(1L), 1L)).toDF("g", "v", "id")
    val out = Diagnostics.imputeGroupMedian(df, col("g"), col("v"), col("id"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"no join-back expected:\n$p")
    val exchanges = p.sliding("Exchange".length).count(_ == "Exchange")
    assert(exchanges <= 1, s"one hash exchange expected, got $exchanges:\n$p")
  }
}
