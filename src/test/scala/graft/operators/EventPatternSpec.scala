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

  // ---- chain (the generalized form firstMatch now runs on) ----

  private def runChain(steps: Seq[EventPattern.Step],
      rows: (Long, Long, Long, String)*) =
    EventPattern.chain(
      rows.map { case (id, k, t, ty) => (id, k, ts(t), ty) }
        .toDF("event_id", "user_id", "ts", "event_type"),
      "user_id", "ts", "event_id", "event_type", seedType = "A", steps = steps)

  private val within100 = expr("INTERVAL 100 SECONDS")

  test("chain: each positive step anchors on the previous match, not the seed") {
    // A@100 → B@150 (within 100 of A) → D@240 (within 100 of B but 140
    // after A): a seed-anchored matcher would reject D
    val got = runChain(
      Seq(EventPattern.Pos("B", within100), EventPattern.Pos("D", within100)),
      (1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"), (3L, 1L, 240L, "D"))
      .collect().head
    assert(got.getAs[Long]("s1_id") == 2L && got.getAs[Long]("s2_id") == 3L)
    assert(got.getAs[Boolean]("matched"))
  }

  test("chain: a dead step leaves later step columns NULL, never the globally-earliest event") {
    // no B for user 1 → the D pass must NOT surface user 1's D@50
    // (which precedes the null anchor in the carry) as a match
    val out = runChain(
      Seq(EventPattern.Pos("B", within100), EventPattern.Pos("D", within100)),
      (1L, 1L, 100L, "A"), (2L, 1L, 50L, "D"), (3L, 1L, 110L, "D"))
      .collect().head
    assert(out.isNullAt(out.fieldIndex("s1_id")), "no B: step 1 null")
    assert(out.isNullAt(out.fieldIndex("s2_id")),
      "dead chain must mask step 2, not asof-join a null anchor")
    assert(!out.getAs[Boolean]("matched"))
  }

  test("chain: a between-Neg guards [anchor, nextAnchor) with q142's boundary rules") {
    val steps = Seq(EventPattern.Pos("B", within100),
      EventPattern.Neg("C"), EventPattern.Pos("D", within100))
    def m(rows: (Long, Long, Long, String)*) =
      runChain(steps, rows: _*).collect().head.getAs[Boolean]("matched")
    // C between B and D blocks
    assert(!m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"),
      (3L, 1L, 170L, "C"), (4L, 1L, 200L, "D")))
    // C at B's instant blocks (inclusive start)
    assert(!m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"),
      (3L, 1L, 150L, "C"), (4L, 1L, 200L, "D")))
    // C at D's instant passes (exclusive end)
    assert(m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"),
      (3L, 1L, 200L, "C"), (4L, 1L, 200L, "D")))
    // C before the B anchor is history, not a guard
    assert(m((1L, 1L, 100L, "A"), (3L, 1L, 120L, "C"),
      (2L, 1L, 150L, "B"), (4L, 1L, 200L, "D")))
  }

  test("chain: a CAPPED between-Neg guards [anchor, nextAnchor) ∩ [anchor, anchor+within] — inclusive cap boundary") {
    // Neg("C", Some(50s)) between B and D: the guard interval is
    // [b_ts, d_ts) ∩ [b_ts, b_ts + 50] (cap edge INCLUSIVE — the
    // trailing form's boundary rule; interval end stays exclusive). A C inside the cap blocks; a C
    // past the cap but still before D is OUTSIDE the guard.
    val steps = Seq(EventPattern.Pos("B", within100),
      EventPattern.Neg("C", Some(expr("INTERVAL 50 SECONDS"))),
      EventPattern.Pos("D", within100))
    def m(rows: (Long, Long, Long, String)*) =
      runChain(steps, rows: _*).collect().head.getAs[Boolean]("matched")
    // C inside both the interval and the cap blocks
    assert(!m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"),
      (3L, 1L, 180L, "C"), (4L, 1L, 240L, "D")))
    // boundary: C exactly AT anchor+within (150+50=200) blocks —
    // inclusive cap, same rule as the trailing form
    assert(!m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"),
      (3L, 1L, 200L, "C"), (4L, 1L, 240L, "D")))
    // boundary: C one past the cap (201 > 200), still before D — passes
    assert(m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"),
      (3L, 1L, 201L, "C"), (4L, 1L, 240L, "D")))
    // the interval end still applies inside the cap: C at D's instant
    // passes (exclusive end) even though it is within anchor+within
    assert(m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"),
      (3L, 1L, 180L, "C"), (4L, 1L, 180L, "D")))
    // C before the B anchor is history even when the cap would reach it
    assert(m((1L, 1L, 100L, "A"), (3L, 1L, 120L, "C"),
      (2L, 1L, 150L, "B"), (4L, 1L, 200L, "D")))
  }

  test("chain: TWO consecutive Negs (one capped, one not) both resolve against the SAME next anchor") {
    // Pos(B) → Neg(C, uncapped) → Neg(E, capped 50s) → Pos(D): both
    // pendings anchor at B's instant and fold against D's — the
    // multi-pending accumulate-then-fold path (EventPattern.chain's
    // `pending` list) that q186-style interleaved chains never drive
    // with more than one entry.
    val steps = Seq(EventPattern.Pos("B", within100),
      EventPattern.Neg("C"),
      EventPattern.Neg("E", Some(expr("INTERVAL 50 SECONDS"))),
      EventPattern.Pos("D", within100))
    def m(rows: (Long, Long, Long, String)*) =
      runChain(steps, rows: _*).collect().head.getAs[Boolean]("matched")
    // neither guard fires
    assert(m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"), (4L, 1L, 240L, "D")))
    // the UNCAPPED C fires alone — anywhere in [B, D)
    assert(!m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"),
      (3L, 1L, 230L, "C"), (4L, 1L, 240L, "D")))
    // the CAPPED E fires alone — inside [B, D) ∩ [B, B+50]
    assert(!m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"),
      (3L, 1L, 180L, "E"), (4L, 1L, 240L, "D")))
    // the caps are PER-PENDING, not shared: at instant 201 (one past
    // E's cap of 150+50) an E passes while a C — uncapped — blocks
    assert(m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"),
      (3L, 1L, 201L, "E"), (4L, 1L, 240L, "D")))
    assert(!m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"),
      (3L, 1L, 201L, "C"), (4L, 1L, 240L, "D")))
    // both fire → still blocked (the fold is an OR, not a last-wins)
    assert(!m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"),
      (3L, 1L, 170L, "C"), (5L, 1L, 180L, "E"), (4L, 1L, 240L, "D")))
    // and a dead next-Pos defers both to nothing: with no D the
    // between-guards never decide the chain (it is already unmatched)
    assert(!m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"), (3L, 1L, 170L, "C")))
  }

  test("chain: a quantified step (atLeast=n) needs n events inside the window; the n-th binds and anchors") {
    val steps = Seq(EventPattern.Pos("B", within100, atLeast = 2),
      EventPattern.Pos("D", within100))
    def head(rows: (Long, Long, Long, String)*) =
      runChain(steps, rows: _*).collect().head
    // two Bs inside the window: the 2nd (B@160) binds step 1 and the
    // chain anchors there — D@250 is within 100 of B@160, not of B@150
    val ok = head((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"),
      (3L, 1L, 160L, "B"), (4L, 1L, 250L, "D"))
    assert(ok.getAs[Long]("s1_id") == 3L && ok.getAs[Long]("s2_id") == 4L)
    assert(ok.getAs[Boolean]("matched"))
    // only ONE B: the quantifier is unmet — step 1 null, chain dead
    val one = head((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"))
    assert(one.isNullAt(one.fieldIndex("s1_id")) && !one.getAs[Boolean]("matched"))
    // 2nd B OUTSIDE the window (201 > 100+100): dead even though the
    // 1st is inside — ALL n must land within `within` of the anchor
    val late = head((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"),
      (3L, 1L, 201L, "B"))
    assert(late.isNullAt(late.fieldIndex("s1_id")) && !late.getAs[Boolean]("matched"))
    // boundary: 2nd B exactly AT anchor+within (200) counts (inclusive)
    val edge = head((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"),
      (3L, 1L, 200L, "B"), (4L, 1L, 250L, "D"))
    assert(edge.getAs[Long]("s1_id") == 3L && edge.getAs[Boolean]("matched"))
    // same-instant events both count (raw-event quantifier, (ts, id)
    // order): two Bs at 150 satisfy atLeast=2, the larger id binds
    val tie = head((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"),
      (3L, 1L, 150L, "B"), (4L, 1L, 200L, "D"))
    assert(tie.getAs[Long]("s1_id") == 3L && tie.getAs[Boolean]("matched"))
  }

  test("chain: a between-Neg before a quantified step guards up to the n-th event's instant") {
    val steps = Seq(EventPattern.Neg("C"),
      EventPattern.Pos("B", within100, atLeast = 2))
    def m(rows: (Long, Long, Long, String)*) =
      runChain(steps, rows: _*).collect().head.getAs[Boolean]("matched")
    // C between the seed and the 2nd B fires — even BETWEEN the two Bs
    assert(!m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"),
      (3L, 1L, 155L, "C"), (4L, 1L, 160L, "B")))
    // C at the 2nd B's instant passes (exclusive interval end)
    assert(m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"),
      (3L, 1L, 160L, "C"), (4L, 1L, 160L, "B")))
  }

  test("chain: alternation (B|E) binds the earliest of EITHER type and s<i>_type names it") {
    val steps = Seq(
      EventPattern.Pos("B", within100, orTypes = Seq("E")),
      EventPattern.Pos("D", within100))
    def first(rows: (Long, Long, Long, String)*) = {
      val r = runChain(steps, rows: _*).collect().head
      (r.getAs[Long]("s1_id"), r.getAs[String]("s1_type"),
        r.getAs[Boolean]("matched"))
    }
    // E earlier than B: the alternative binds, anchors, and is named
    assert(first((1L, 1L, 100L, "A"), (2L, 1L, 120L, "E"),
      (3L, 1L, 150L, "B"), (4L, 1L, 180L, "D")) == ((2L, "E", true)))
    // B earlier than E: the primary binds
    assert(first((1L, 1L, 100L, "A"), (2L, 1L, 120L, "B"),
      (3L, 1L, 150L, "E"), (4L, 1L, 180L, "D")) == ((2L, "B", true)))
    // the ANCHOR advances to the bound alternative: D within 100 of
    // E@120 but 180 after A would fail a seed-anchored matcher — and a
    // D inside the window measured from the LATER unbound B must not
    // resurrect a chain whose bound E left it out of reach
    val r2 = runChain(steps, (1L, 1L, 100L, "A"), (2L, 1L, 120L, "E"),
      (3L, 1L, 190L, "B"), (4L, 1L, 280L, "D")).collect().head
    assert(r2.getAs[String]("s1_type") == "E" && !r2.getAs[Boolean]("matched"),
      "window must be measured from the BOUND alternative (E@120), not B@190")
    // same-instant tie ACROSS the alternatives: max id decides, and
    // the surfaced type is that winner's own (arg-max, not primary-
    // type-wins)
    assert(first((1L, 1L, 100L, "A"), (2L, 1L, 120L, "B"),
      (5L, 1L, 120L, "E"), (4L, 1L, 180L, "D")) == ((5L, "E", true)))
    // both alternatives outside the window: dead step, typed NULL
    val dead = runChain(steps, (1L, 1L, 100L, "A"), (2L, 1L, 300L, "E"),
      (3L, 1L, 350L, "B")).collect().head
    assert(dead.isNullAt(dead.fieldIndex("s1_type")) &&
      !dead.getAs[Boolean]("matched"))
  }

  test("chain: a quantified alternation counts occurrences of ANY alternative; the n-th's own type binds") {
    val steps = Seq(
      EventPattern.Pos("B", within100, atLeast = 2, orTypes = Seq("E")))
    def got(rows: (Long, Long, Long, String)*) = {
      val r = runChain(steps, rows: _*).collect().head
      (if (r.isNullAt(r.fieldIndex("s1_id"))) None
       else Some((r.getAs[Long]("s1_id"), r.getAs[String]("s1_type"))),
        r.getAs[Boolean]("matched"))
    }
    // one B + one E inside the window = the quantifier's 2; the 2nd
    // in (ts, id) order is the E and its type surfaces
    assert(got((1L, 1L, 100L, "A"), (2L, 1L, 120L, "B"),
      (3L, 1L, 150L, "E")) == ((Some((3L, "E")), true)))
    // two of ONE alternative also satisfy (B|E){2,}
    assert(got((1L, 1L, 100L, "A"), (2L, 1L, 120L, "E"),
      (3L, 1L, 150L, "E")) == ((Some((3L, "E")), true)))
    // one of each but the 2nd outside the window: quantifier unmet
    assert(got((1L, 1L, 100L, "A"), (2L, 1L, 120L, "B"),
      (3L, 1L, 250L, "E")) == ((None, false)))
  }

  test("chain: alternation argument hygiene — self-repeats and duplicates are rejected") {
    intercept[IllegalArgumentException](
      EventPattern.Pos("B", within100, orTypes = Seq("B")))
    intercept[IllegalArgumentException](
      EventPattern.Pos("B", within100, orTypes = Seq("E", "E")))
    // and s<i>_type is reserved ONLY for alternation steps: a key
    // column named s1_type under a PLAIN step chain keeps working
    val df = runChain(Seq(EventPattern.Pos("B", within100)),
      (1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"))
    assert(!df.columns.contains("s1_type"))
    intercept[IllegalArgumentException] {
      EventPattern.chain(
        Seq((1L, 1L, ts(100L), "A")).toDF("event_id", "s1_type", "ts", "event_type"),
        "s1_type", "ts", "event_id", "event_type", seedType = "A",
        steps = Seq(EventPattern.Pos("B", within100, orTypes = Seq("E"))))
    }
  }

  test("chain: input column names colliding with generated step names are rejected loudly") {
    // a key column named s1_id would be silently shadowed by step 1's
    // generated id column — chain must fail fast (AsofJoin's
    // reserveNames discipline), naming the offending parameter
    val df = Seq((1L, 1L, ts(100L), "A"))
      .toDF("event_id", "s1_id", "ts", "event_type")
    val e = intercept[IllegalArgumentException] {
      EventPattern.chain(df, "s1_id", "ts", "event_id", "event_type",
        seedType = "A", steps = Seq(EventPattern.Pos("B", within100)))
    }
    assert(e.getMessage.contains("keyCol") && e.getMessage.contains("s1_id"))
    // only names THIS chain actually generates are reserved: n1_ts is
    // never generated when step 1 is a Pos (which makes s1_*), and
    // _q_rk only exists for quantified steps — both accepted here
    val ok = Seq((1L, 1L, ts(100L), "A"))
      .toDF("event_id", "n1_ts", "ts", "event_type")
    assert(EventPattern.chain(ok, "n1_ts", "ts", "event_id", "event_type",
      seedType = "A", steps = Seq(EventPattern.Pos("B", within100)))
      .collect().length == 1)
    val ok2 = Seq((1L, 1L, ts(100L), "A"))
      .toDF("event_id", "_q_rk", "ts", "event_type")
    assert(EventPattern.chain(ok2, "_q_rk", "ts", "event_id", "event_type",
      seedType = "A", steps = Seq(EventPattern.Pos("B", within100)))
      .collect().length == 1)
    // ... but a quantified chain DOES generate _q_rk: rejected there
    val e2 = intercept[IllegalArgumentException] {
      EventPattern.chain(ok2, "_q_rk", "ts", "event_id", "event_type",
        seedType = "A",
        steps = Seq(EventPattern.Pos("B", within100, atLeast = 2)))
    }
    assert(e2.getMessage.contains("_q_rk"))
  }

  test("chain: a trailing Neg is time-bounded from the last anchor, inclusive end") {
    val steps = Seq(EventPattern.Pos("B", within100),
      EventPattern.Neg("C", Some(expr("INTERVAL 50 SECONDS"))))
    def m(rows: (Long, Long, Long, String)*) =
      runChain(steps, rows: _*).collect().head.getAs[Boolean]("matched")
    assert(!m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"), (3L, 1L, 180L, "C")),
      "C inside the trailing window fires")
    assert(!m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"), (3L, 1L, 200L, "C")),
      "inclusive end: C at anchor+within fires")
    assert(m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B"), (3L, 1L, 201L, "C")),
      "C past the trailing window does not fire")
    assert(m((1L, 1L, 100L, "A"), (2L, 1L, 150L, "B")),
      "no C at all passes")
  }

  test("chain: a trailing Neg without `within` is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      runChain(Seq(EventPattern.Pos("B", within100), EventPattern.Neg("C")),
        (1L, 1L, 100L, "A"))
    }
    assert(e.getMessage.contains("trailing"))
  }

  test("chain: an empty step list returns every seed, matched") {
    val out = runChain(Seq.empty, (1L, 1L, 100L, "A"), (2L, 1L, 200L, "A"))
      .collect()
    assert(out.length == 2 && out.forall(_.getAs[Boolean]("matched")))
  }
}
