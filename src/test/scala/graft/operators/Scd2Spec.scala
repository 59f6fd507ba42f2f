package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SCD2 run-collapse edges the oracle-gated q93 can't isolate: null
  * values as runs, single-event keys, and interval chaining.
  */
class Scd2Spec extends SparkSpec {

  import spark.implicits._

  private def hist(rows: Seq[(String, Long, Option[String])]) =
    Scd2.history(rows.toDF("k", "t", "v"),
        key = col("k"), ts = col("t"), value = col("v"), tieBreak = col("t"))
      .orderBy(col("k"), col("valid_from"))
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))

  test("consecutive equal values collapse to one interval; intervals chain") {
    val out = hist(Seq(
      ("u", 1L, Some("a")), ("u", 2L, Some("a")), ("u", 3L, Some("b")),
      ("u", 4L, Some("b")), ("u", 5L, Some("a"))))
    assert(out.toSeq == Seq(
      ("u", Some("a"), 1L, Some(3L)),
      ("u", Some("b"), 3L, Some(5L)),
      ("u", Some("a"), 5L, None)))
  }

  test("null value opens a run like any other; leading null is kept") {
    val out = hist(Seq(
      ("u", 1L, None), ("u", 2L, None), ("u", 3L, Some("a")), ("u", 4L, None)))
    assert(out.toSeq == Seq(
      ("u", None, 1L, Some(3L)),
      ("u", Some("a"), 3L, Some(4L)),
      ("u", None, 4L, None)))
  }

  test("single-event keys produce one open interval; keys are independent") {
    val out = hist(Seq(("a", 7L, Some("x")), ("b", 9L, Some("x"))))
    assert(out.toSeq == Seq(
      ("a", Some("x"), 7L, None),
      ("b", Some("x"), 9L, None)))
  }
}
