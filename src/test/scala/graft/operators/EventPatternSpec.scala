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

  // ---- randomized differential oracle ----

  /** Brute-force O(seeds × steps × events) reference implementation of
    * the chain semantics, written independently of the engine's
    * asof-pass construction: per seed, each step searches the key's
    * full event list from the current anchor under the documented
    * rules (inclusive window start/end, max-id instant ties with
    * arg-max type, (ts, id)-total-order quantifier counting from the
    * bound instant's FIRST raw event, Neg `[anchor, nextAnchor)` with
    * inclusive cap, trailing Neg `[anchor, anchor + w]`). The engine
    * must agree on every step binding, bound type, and verdict for
    * every seed across randomized event streams and step mixes —
    * same-instant ties, dead chains, and guard caps all land by
    * generation. */
  private final case class Ev(id: Long, key: Long, t: Long, tpe: String)

  private def bruteChain(events: Seq[Ev], steps: Seq[EventPattern.Step],
      withinSecs: Map[Int, Long], negCapSecs: Map[Int, Long])
      : Map[Long, (Seq[Option[(Long, Long, String)]], Boolean)] = {
    val byKey = events.groupBy(_.key)
    events.filter(_.tpe == "A").map { seed =>
      val evts = byKey(seed.key)
      var anchor: Option[Long] = Some(seed.t)
      // (guard-instant, anchor at the Neg, cap) pending the next Pos
      var pending = List.empty[(Option[Long], Long, Option[Long])]
      val fired = Seq.newBuilder[Boolean]
      val bounds = Seq.newBuilder[Option[(Long, Long, String)]]
      steps.zipWithIndex.foreach {
        case (EventPattern.Pos(tpe, _, n, alts), i0) =>
          val w = withinSecs(i0)
          val pool = anchor.toSeq.flatMap { at =>
            evts.filter(e => (e.tpe == tpe || alts.contains(e.tpe)) &&
              e.t >= at).sortBy(e => (e.t, e.id))
          }
          val bound: Option[(Long, Long, String)] = anchor.flatMap { at =>
            pool.headOption.map(_.t).filter(_ <= at + w).flatMap { t0 =>
              if (n == 1) {
                val e = pool.filter(_.t == t0).maxBy(_.id)
                Some((e.id, e.t, e.tpe))
              } else {
                val nth = pool.indexWhere(_.t == t0) + (n - 1)
                if (nth < pool.length && pool(nth).t <= at + w)
                  Some((pool(nth).id, pool(nth).t, pool(nth).tpe))
                else None
              }
            }
          }
          pending.foreach { case (gOpt, anch, cap) =>
            fired += ((gOpt, bound) match {
              case (Some(g), Some((_, bt, _))) =>
                g < bt && cap.forall(c => g <= anch + c)
              case _ => false
            })
          }
          pending = Nil
          bounds += bound
          anchor = bound.map(_._2)
        case (EventPattern.Neg(tpe, capOpt), i0) =>
          val g = anchor.flatMap(at =>
            evts.filter(e => e.tpe == tpe && e.t >= at)
              .map(_.t).minOption)
          pending ::= ((g, anchor.getOrElse(0L),
            capOpt.map(_ => negCapSecs(i0))))
      }
      pending.foreach { case (gOpt, anch, cap) => // trailing
        fired += gOpt.exists(_ <= anch + cap.get)
      }
      val bs = bounds.result()
      seed.id -> ((bs,
        bs.forall(_.isDefined) && !fired.result().contains(true)))
    }.toMap
  }

  test("chain: differential oracle — engine agrees with the brute-force reference on randomized streams and step mixes") {
    val types = Seq("B", "C", "D", "E")
    (1 to 14).foreach { caseSeed =>
      val rnd = new scala.util.Random(caseSeed * 7919L)
      val events = (1 to 28).map { id =>
        val tpe = if (rnd.nextInt(4) == 0) "A" else types(rnd.nextInt(4))
        Ev(id.toLong, 1L + rnd.nextInt(3), rnd.nextInt(60).toLong, tpe)
      } :+ Ev(100L, 1L, 5L, "A") // at least one seed
      val nSteps = 1 + rnd.nextInt(4)
      val raw = (0 until nSteps).map { _ =>
        if (rnd.nextInt(10) < 7) {
          val t = types(rnd.nextInt(4))
          val nAlts = rnd.nextInt(10) match {
            case x if x < 5 => 0
            case x if x < 8 => 1
            case _ => 2 // full two-alternative pool: A then (B|C|D)
          }
          val alts = rnd.shuffle(types.filterNot(_ == t)).take(nAlts)
          val n = if (rnd.nextInt(10) < 4) 2 + rnd.nextInt(3) else 1
          Left((t, 5L + rnd.nextInt(25), n, alts))
        } else Right((types(rnd.nextInt(4)),
          if (rnd.nextInt(2) == 0) Some(5L + rnd.nextInt(20)) else None))
      }
      // a Neg with no later Pos is trailing and MUST carry a cap
      val lastPos = raw.lastIndexWhere(_.isLeft)
      val withinSecs = raw.zipWithIndex.collect {
        case (Left((_, w, _, _)), i) => i -> w }.toMap
      val negCapSecs = raw.zipWithIndex.collect {
        case (Right((_, c)), i) =>
          i -> c.getOrElse(5L + (i + 3).toLong) }.toMap
      val steps = raw.zipWithIndex.map {
        case (Left((t, w, n, alts)), _) =>
          EventPattern.Pos(t, expr(s"INTERVAL $w SECONDS"),
            atLeast = n, orTypes = alts)
        case (Right((t, cap)), i) =>
          val capped = if (i > lastPos) Some(negCapSecs(i)) else cap
          EventPattern.Neg(t,
            capped.map(c => expr(s"INTERVAL $c SECONDS")))
      }
      val expected = bruteChain(events, steps, withinSecs, negCapSecs)

      val got = EventPattern.chain(
        events.map(e => (e.id, e.key, ts(e.t), e.tpe))
          .toDF("event_id", "user_id", "ts", "event_type"),
        "user_id", "ts", "event_id", "event_type", "A", steps)
        .collect().map { r =>
          val perStep = steps.zipWithIndex.collect {
            case (p: EventPattern.Pos, i0) =>
              val i = i0 + 1
              if (r.isNullAt(r.fieldIndex(s"s${i}_id"))) None
              else Some((r.getAs[Long](s"s${i}_id"),
                r.getAs[Timestamp](s"s${i}_ts").getTime / 1000L,
                if (p.orTypes.isEmpty) p.eventType
                else r.getAs[String](s"s${i}_type")))
          }
          r.getAs[Long]("a_id") -> ((perStep, r.getAs[Boolean]("matched")))
        }.toMap

      // the reference records every Pos bound even past a dead step's
      // None — the engine masks them identically, so compare directly
      assert(got.keySet == expected.keySet,
        s"case $caseSeed: seed sets differ (steps=$steps)")
      expected.foreach { case (aId, (expBounds, expMatched)) =>
        val (gotBounds, gotMatched) = got(aId)
        assert(gotBounds == expBounds && gotMatched == expMatched,
          s"case $caseSeed seed $aId (steps=$steps):\n" +
            s"  engine: $gotBounds matched=$gotMatched\n" +
            s"  oracle: $expBounds matched=$expMatched\n" +
            s"  events: ${events.filter(_.key == events.find(e => e.id == aId).get.key).sortBy(e => (e.t, e.id))}")
      }
    }
  }
}
