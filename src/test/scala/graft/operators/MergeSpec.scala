package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Merge clause semantics: conditional update/delete/insert, clause
  * precedence (delete before update), absent clauses, ANSI null-key
  * semantics (null keys never match), and the untouched-target
  * guarantee.
  */
class MergeSpec extends SparkSpec {

  import spark.implicits._

  private val target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))

  private def run(
      source: Seq[(Long, String, Double)],
      del: Option[org.apache.spark.sql.Column] = None,
      upd: Option[org.apache.spark.sql.Column] = Some(lit(true)),
      ins: Option[org.apache.spark.sql.Column] = Some(lit(true))) =
    Merge.merge(target.toDF("k", "name", "v"), source.toDF("k", "name", "v"),
        Seq("k"), del, upd, ins)
      .orderBy("k").as[(Long, String, Double)].collect().toList

  test("unconditional upsert: update matched, insert new, keep the rest") {
    val got = run(Seq((2L, "B", 99.0), (9L, "z", 1.0)))
    assert(got == List((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0),
      (4L, "d", 40.0), (9L, "z", 1.0)))
  }

  test("ANSI null keys: never match — null-key source inserts, null-key targets untouched") {
    // the null-safe <=> join this replaces matched null keys: a
    // null-key source row UPDATED (instead of inserting beside) every
    // null-key target row — and with two null-key target rows, BOTH
    // full-outer-matched the one source row (fan-out rewrite). ANSI
    // MERGE (and Delta) treat null keys as NOT MATCHED.
    val t = Seq((Option.empty[Long], "t1", 1.0), (Option.empty[Long], "t2", 2.0),
      (Some(5L), "e", 50.0)).toDF("k", "name", "v")
    val s = Seq((Option.empty[Long], "s1", 9.0)).toDF("k", "name", "v")
    val got = Merge.merge(t, s, Seq("k"))
      .orderBy("name").as[(Option[Long], String, Double)].collect().toList
    assert(got == List(
      (Some(5L), "e", 50.0),
      (None, "s1", 9.0),  // inserted, not matched
      (None, "t1", 1.0), (None, "t2", 2.0))) // untouched, no fan-out
  }

  test("conditional update compares target and source values") {
    // update only when the source value is LARGER
    val got = run(Seq((1L, "A", 5.0), (2L, "B", 25.0)),
      upd = Some(col("s.v") > col("t.v")))
    assert(got == List((1L, "a", 10.0), (2L, "B", 25.0), (3L, "c", 30.0),
      (4L, "d", 40.0)))
  }

  test("matched delete wins over update; condition is row-local") {
    val got = run(Seq((1L, "A", -1.0), (2L, "B", 99.0)),
      del = Some(col("s.v") < 0), upd = Some(lit(true)))
    assert(got == List((2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("absent insert clause: source-only rows are ignored") {
    val got = run(Seq((2L, "B", 99.0), (9L, "z", 1.0)), ins = None)
    assert(got == List((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0),
      (4L, "d", 40.0)))
  }

  test("conditional insert filters new rows") {
    val got = run(Seq((8L, "y", -5.0), (9L, "z", 5.0)),
      ins = Some(col("s.v") > 0))
    assert(got == List((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0), (9L, "z", 5.0)))
  }

  test("null condition value means the clause does NOT fire") {
    val src = Seq((Some(2L), "B", Option.empty[Double]))
      .toDF("k", "name", "v")
    val got = Merge.merge(target.toDF("k", "name", "v"), src, Seq("k"),
        whenMatchedUpdate = Some(col("s.v") > col("t.v")))
      .orderBy("k").select("k", "name").as[(Long, String)].collect().toList
    assert(got.contains((2L, "b")), "null comparison must not update")
  }

  test("empty source returns the target unchanged") {
    val got = run(Seq.empty)
    assert(got == target.toList.sortBy(_._1))
  }

  test("source missing a target column is rejected") {
    intercept[IllegalArgumentException] {
      Merge.merge(target.toDF("k", "name", "v"),
        Seq((1L, "x")).toDF("k", "name"), Seq("k"))
    }
  }
}
