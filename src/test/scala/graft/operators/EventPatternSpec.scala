package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** EventPattern first-match semantics: window bound, negative guard,
  * boundary instants (B at A's time matches; C at A's time guards;
  * C at B's time does not), per-key isolation, first-B binding.
  */
class EventPatternSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def run(rows: (Long, Long, Long, String)*): Map[Long, (Option[Long], Boolean)] =
    EventPattern.firstMatch(
      rows.map { case (id, k, t, ty) => (id, k, ts(t), ty) }
        .toDF("event_id", "user_id", "ts", "event_type"),
      "user_id", "ts", "event_id", "event_type",
      aType = "A", bType = "B", guardType = "C",
      within = expr("INTERVAL 100 SECONDS"))
      .collect().map(r => r.getLong(1) ->
        ((if (r.isNullAt(3)) None else Some(r.getLong(3))), r.getBoolean(5)))
      .toMap

  test("A binds the FIRST B in window; later Bs are ignored") {
    val got = run((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"), (3L, 1L, 160L, "B"))
    assert(got(1L) == (Some(2L), true))
  }

  test("B outside the window does not match") {
    val got = run((1L, 1L, 100L, "A"), (2L, 1L, 250L, "B"))
    assert(got(1L) == (None, false))
  }

  test("C strictly between A and B blocks; C after B does not") {
    val blocked = run((1L, 1L, 100L, "A"), (2L, 1L, 120L, "C"), (3L, 1L, 150L, "B"))
    assert(blocked(1L)._2 == false, "guard between A and B must block")
    val clean = run((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"), (3L, 1L, 160L, "C"))
    assert(clean(1L) == (Some(2L), true))
  }

  test("boundary instants: B at A's time matches; C at A's time guards; C at B's time passes") {
    val bAtA = run((1L, 1L, 100L, "A"), (2L, 1L, 100L, "B"))
    assert(bAtA(1L) == (Some(2L), true))
    val cAtA = run((1L, 1L, 100L, "A"), (2L, 1L, 100L, "C"), (3L, 1L, 150L, "B"))
    assert(cAtA(1L)._2 == false, "inclusive start: C at A's instant guards")
    val cAtB = run((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"), (3L, 1L, 150L, "C"))
    assert(cAtB(1L) == (Some(2L), true), "exclusive end: C at B's instant passes")
  }

  test("keys are isolated: another user's B never matches") {
    val got = run((1L, 1L, 100L, "A"), (2L, 2L, 150L, "B"))
    assert(got(1L) == (None, false))
  }
}
