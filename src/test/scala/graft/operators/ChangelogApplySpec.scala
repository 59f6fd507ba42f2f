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

  test("compact keeps one latest row per key INCLUDING tombstones, sequences carried") {
    val out = ChangelogApply.compact(changes, Seq("key"), Seq("seq"), "op")
      .orderBy($"key")
      .as[(Long, String, Int, String)].collect().toSeq
    assert(out === Seq(
      (2L, "U", 5, "b3"), (3L, "D", 2, "x"), (4L, "U", 7, "d3"),
      (5L, "D", 1, "x"), (6L, "U", 1, "f")))
  }

  test("compact output IS a changelog: apply composes over it (the documented contract)") {
    // pre-fix compact dropped the seq columns, so this exact
    // composition — the one compact's scaladoc and Merge's docs
    // direct callers to — failed on a missing column
    val compacted = ChangelogApply.compact(changes, Seq("key"), Seq("seq"), "op")
    val viaCompact = ChangelogApply(base, compacted, Seq("key"), Seq("seq"), "op")
      .orderBy($"key").collect().toSeq
    val direct = ChangelogApply(base, changes, Seq("key"), Seq("seq"), "op")
      .orderBy($"key").collect().toSeq
    assert(viaCompact === direct)
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
