package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins every CDC path of [[ChangelogApply]] plus the plan shape that
  * makes it scale: one aggregate with map-side partials, no per-key
  * window sort. */
class ChangelogApplySpec extends SparkSpec {
  import spark.implicits._

  private def base =
    Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("key", "v")

  private def changes =
    Seq(
      (2L, "U", "b2", 1), (2L, "U", "b3", 5), // update, latest wins
      (3L, "D", "x", 2),                      // delete a base key
      (4L, "U", "d1", 1), (4L, "D", "x", 2),  // insert, delete,
      (4L, "U", "d3", 7),                     // …then re-insert
      (5L, "D", "x", 1),                      // delete of an absent key
      (6L, "U", "f", 1)                       // plain insert
    ).toDF("key", "op", "v", "seq")

  test("apply folds updates, deletes, re-inserts, and inserts; " +
      "untouched base rows survive as 'base'") {
    val out = ChangelogApply(base, changes, Seq("key"), Seq("seq"), "op")
      .orderBy($"key")
      .as[(Long, String, String)].collect().toSeq
    assert(out === Seq(
      (1L, "a", "base"),   // untouched
      (2L, "b3", "cdc"),   // latest update wins over base and older U
      (4L, "d3", "cdc"),   // U after D re-inserts
      (6L, "f", "cdc")))   // insert of a key base never had
    // key 3 (deleted from base) and key 5 (delete of absent) are gone
  }

  test("compact keeps one latest row per key INCLUDING tombstones") {
    val out = ChangelogApply.compact(changes, Seq("key"), Seq("seq"), "op")
      .orderBy($"key")
      .as[(Long, String, String)].collect().toSeq
    assert(out === Seq(
      (2L, "U", "b3"), (3L, "D", "x"), (4L, "U", "d3"),
      (5L, "D", "x"), (6L, "U", "f")))
  }

  test("out-of-order arrival is irrelevant: any row order, same result") {
    val shuffled = changes.orderBy(rand(42)).repartition(7)
    val a = ChangelogApply(base, shuffled, Seq("key"), Seq("seq"), "op")
      .orderBy($"key").collect().toSeq
    val b = ChangelogApply(base, changes, Seq("key"), Seq("seq"), "op")
      .orderBy($"key").collect().toSeq
    assert(a === b)
  }

  test("plan shape: aggregate with partial max_by, no window sort") {
    val plan = ChangelogApply(base, changes, Seq("key"), Seq("seq"), "op")
      .queryExecution.executedPlan.toString
    assert(plan.contains("max_by"), s"expected max_by aggregate:\n$plan")
    assert(!plan.contains("Window"),
      s"CDC apply must not fall back to a window sort:\n$plan")
  }
}
