package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Complex-event-processing pattern matching, first-match form: per
  * key, `A → B within T, with no C strictly between` — the
  * MATCH_RECOGNIZE / CEP staple (funnel q68 counts ordered steps; this
  * binds the actual matched pair and enforces the negative guard).
  *
  * Composed entirely from [[AsofJoin.asofJoinForward]]: the earliest B
  * at/after each A (tolerance = the window), the earliest C at/after
  * each A, then a row-local verdict — B must exist inside the window
  * and the first C (if any) must not fall strictly before B. Two
  * union-carry passes on the key: linear, no pair-space join, no
  * per-key state machine (first-match semantics need only the two
  * earliest successors — a general regex CEP would need
  * `flatMapGroupsWithState`; this covers the overwhelmingly common
  * funnel-with-guard shape declaratively).
  *
  * Simultaneous timestamps (pinned by EventPatternSpec): B at A's
  * instant matches (`>=`); C at A's instant guards (it is "between" —
  * inclusive start); C at B's instant does NOT block (exclusive end).
  * B events sharing (key, ts) resolve to the max `idCol` (the
  * [[AsofJoin.latestPerKeyTime]] determinism rule).
  *
  * Output: every A row `(keyCol, a_id, a_ts)` plus `b_id`/`b_ts`
  * (null when unmatched) and `matched` (false when no B in window OR
  * the guard fired).
  */
object EventPattern {

  /** One step of a [[chain]] pattern. */
  sealed trait Step
  /** Positive step: the next `atLeast` events of `eventType` must ALL
    * occur within `within` of the current anchor (equivalently: the
    * `atLeast`-th successor must — it is the latest of the group);
    * that event's (id, ts) bind and the chain's anchor advances to it.
    * `atLeast = 1` is the plain `A then B within T` form
    * (MATCH_RECOGNIZE `B`); `atLeast = n` is the quantified
    * `B{n,} within T` form ("n or more B's in the window" — the
    * engagement/escalation staple).
    *
    * Tie rules: for `atLeast = 1` an instant's duplicate events
    * resolve to the max `idCol` (the [[AsofJoin.latestPerKeyTime]]
    * rule firstMatch pins). For `atLeast > 1` every RAW event counts
    * toward the quantifier, ordered by `(ts, id)` — two events at one
    * instant are two occurrences, and the n-th in that total order
    * binds (deterministic for any input).
    *
    * Alternation (`A then (B|C) within T`, MATCH_RECOGNIZE's `(B|C)`):
    * `orTypes` widens the step's event pool to the UNION of
    * `eventType +: orTypes` — the earliest pool event in the window
    * binds (or the n-th, under a quantifier: occurrences of ANY
    * alternative count toward it), and the output gains `s<i>_type`
    * naming which alternative bound. Same tie rules over the pooled
    * events (max-id at an instant for n=1, its type riding along via
    * arg-max). The pool is ONE widened filter on the same single scan
    * of the step's side — alternation adds no exchange and no extra
    * pass (never one-pass-per-alternative unioned after the fact). */
  final case class Pos(eventType: String, within: Column,
      atLeast: Int = 1, orTypes: Seq[String] = Nil) extends Step {
    require(atLeast >= 1, s"atLeast must be >= 1: $atLeast")
    require(!orTypes.contains(eventType),
      s"orTypes repeats the step's own eventType '$eventType'")
    require(orTypes.distinct == orTypes, s"orTypes has duplicates: $orTypes")
  }
  /** Negated step: NO event of `eventType` may occur in the guarded
    * interval. Followed by a later [[Pos]], the interval is
    * `[anchor, nextAnchor)` (inclusive start, exclusive end — q142's
    * pinned simultaneity rules; `within`, when also given, caps it at
    * `anchor + within`). As the chain's TRAILING step the interval is
    * `[anchor, anchor + within]` and `within` is required. The anchor
    * does not advance. */
  final case class Neg(eventType: String, within: Option[Column] = None)
    extends Step

  /** General first-match CEP chain: per key, a seed event followed by
    * an arbitrary sequence of positive and negated steps —
    * `A then B within T1 then NOT C until D within T2 then NOT E
    * within T3`, the absence/SLA monitoring staple MATCH_RECOGNIZE
    * expresses with `^` patterns.
    *
    * One [[AsofJoin.asofJoinForward]] union-carry pass per step from
    * the step's anchor (first-match semantics need only each anchor's
    * EARLIEST successor of the step type): linear in |events| per
    * step, one hash exchange each, never a pair-space join or a
    * per-key state machine. A quantified step (`Pos(..., atLeast = n)`,
    * n > 1) adds exactly one more hash exchange — a per-key ranking
    * window whose `lead(n-1)` carries the n-th successor into the same
    * asof pass — and still scans its event side once. A chain already
    * dead at step k (no match within the window) keeps its row with
    * `matched = false` and NULL step columns from k on — the null
    * anchor is masked, never joined through.
    *
    * Output: every seed row `(keyCol, a_id, a_ts)`, then
    * `s<i>_id`/`s<i>_ts` for each positive step i (1-based over
    * `steps`; plus `s<i>_type` when the step is an alternation —
    * which alternative bound), and `matched`.
    */
  def chain(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      seedType: String,
      steps: Seq[Step]): DataFrame = {
    // generated names fail fast (the AsofJoin reserveNames discipline):
    // a key column named "a_ts" or "s1_id" would be silently shadowed
    // by the step columns and echoed back corrupted in the output.
    // Only the names THIS chain actually generates are reserved —
    // rejecting e.g. a key named n1_ts when step 1 is a Pos (which
    // generates s1_*, never n1_ts) would break a working call.
    val generated = Seq("a_id", "a_ts", "matched") ++
      steps.zipWithIndex.flatMap {
        case (Pos(_, _, n, alts), i0) =>
          Seq(s"s${i0 + 1}_id", s"s${i0 + 1}_ts") ++
            (if (alts.nonEmpty) Seq(s"s${i0 + 1}_type") else Nil) ++
            (if (n > 1) Seq("_q_rk", "_q_rk0") else Nil)
        case (Neg(_, _), i0) => Seq(s"n${i0 + 1}_ts")
      }.distinct
    Seq("keyCol" -> keyCol, "tsCol" -> tsCol, "idCol" -> idCol,
        "typeCol" -> typeCol).foreach { case (param, name) =>
      require(!generated.contains(name),
        s"$param = $name collides with a column name generated by " +
          s"EventPattern.chain for this step sequence " +
          s"(${generated.mkString(", ")}) — rename the input column")
    }
    var df = events.filter(col(typeCol) === seedType)
      .select(col(keyCol), col(idCol).as("a_id"), col(tsCol).as("a_ts"))
      .withColumn(tsCol, col("a_ts"))
    var anchor = "a_ts"
    // a Neg's verdict needs the NEXT anchor — pend it until the
    // following Pos lands (or the chain ends: trailing form)
    final case class Pending(tsName: String, anchorName: String,
      within: Option[Column])
    var pending = List.empty[Pending]
    val posTs = List.newBuilder[String]
    val fired = List.newBuilder[Column]

    steps.zipWithIndex.foreach { case (st, i0) =>
      val i = i0 + 1
      st match {
        case Pos(tpe, within, atLeast, orTypes) =>
          val idN = s"s${i}_id"; val tsN = s"s${i}_ts"
          // alternation: ONE widened filter on the same single scan —
          // the pooled alternatives ride every downstream step
          // unchanged, and s<i>_type records which alternative bound
          val hasAlt = orTypes.nonEmpty
          val typeN = s"s${i}_type"
          val poolFilter =
            if (!hasAlt) col(typeCol) === tpe
            else col(typeCol).isin(tpe +: orTypes: _*)
          if (atLeast == 1) {
            // unique per (key, ts), ties to max id — the
            // latestPerKeyTime determinism rule firstMatch pins; under
            // alternation the bound type is the max-id event's own
            // (arg-max, so the tie rule decides the type too)
            val b = events.filter(poolFilter)
              .groupBy(col(keyCol), col(tsCol))
              .agg(max(col(idCol)).as(idN),
                (if (hasAlt) Seq(max_by(col(typeCol), col(idCol)).as(typeN))
                 else Nil): _*)
              .withColumn(tsN, col(tsCol))
            val joined = AsofJoin.asofJoinForward(
              df.withColumn(tsCol, col(anchor)), b, keyCol, tsCol,
              payloadCols = Seq(idN, tsN) ++ (if (hasAlt) Seq(typeN) else Nil),
              inner = false,
              tolerance = Some((lt, rt) => rt <= lt + within))
            // mask through a dead chain: a null anchor sorts PAST every
            // right row in the descending carry and would surface the
            // globally-earliest event as its "match"
            val masked = joined
              .withColumn(idN,
                when(col(anchor).isNotNull, col(s"asof_$idN")))
              .withColumn(tsN,
                when(col(anchor).isNotNull, col(s"asof_$tsN")))
              .drop(s"asof_$idN", s"asof_$tsN")
            df = if (!hasAlt) masked else masked
              .withColumn(typeN,
                when(col(anchor).isNotNull, col(s"asof_$typeN")))
              .drop(s"asof_$typeN")
          } else {
            // quantified step (B{n,} within T): rank the step's RAW
            // events per key by (ts, id) — a total order, so the n-th
            // successor is deterministic — and attach to every
            // instant the (id, ts) of the event (n-1) positions ahead
            // of the instant's FIRST raw event (lead over the same
            // sort). The asof pass then binds each anchor's earliest
            // successor instant, whose payload IS the n-th event.
            // One scan of the step's events, ONE hash exchange (the
            // lead window, the per-instant dedup window, and the
            // min-rank filter all run on the key clustering), one
            // asof union pass — linear, never the pair-space
            // count-matches-per-anchor expansion a range join would
            // plan, and never a second reference to the ranked
            // subtree (which Catalyst would re-execute per branch).
            val rkW = Window.partitionBy(col(keyCol))
              .orderBy(col(tsCol), col(idCol))
            val instW = Window.partitionBy(col(keyCol), col(tsCol))
            val ranked0 = events.filter(poolFilter)
              .select(Seq(col(keyCol), col(tsCol), col(idCol)) ++
                (if (hasAlt) Seq(col(typeCol)) else Nil): _*)
              .withColumn("_q_rk", row_number().over(rkW))
              .withColumn(idN, lead(col(idCol), atLeast - 1).over(rkW))
              .withColumn(tsN, lead(col(tsCol), atLeast - 1).over(rkW))
            // under alternation the n-th event's own type rides the
            // same lead pass (no extra window, no second reference)
            val ranked = if (!hasAlt) ranked0 else ranked0
              .withColumn(typeN, lead(col(typeCol), atLeast - 1).over(rkW))
            val nthAhead = ranked
              // unique per (key, ts) — the asof determinism contract:
              // keep the instant's FIRST raw event (its lead spans the
              // whole same-instant group, so every raw event counts)
              .withColumn("_q_rk0", min(col("_q_rk")).over(instW))
              .filter(col("_q_rk") === col("_q_rk0"))
              .select(Seq(col(keyCol), col(tsCol), col(idN), col(tsN)) ++
                (if (hasAlt) Seq(col(typeN)) else Nil): _*)
            val joined = AsofJoin.asofJoinForward(
              df.withColumn(tsCol, col(anchor)), nthAhead, keyCol, tsCol,
              payloadCols = Seq(idN, tsN) ++ (if (hasAlt) Seq(typeN) else Nil),
              inner = false,
              // early prune only — if even the FIRST successor is
              // outside the window the n-th cannot be inside it; the
              // binding check is the n-th's own bound below
              tolerance = Some((lt, rt) => rt <= lt + within))
            // dead-chain mask as in the n=1 path, plus the witness for
            // "all n inside the window": the n-th (latest of the
            // group) must land at/before anchor + within — inclusive,
            // the step rule; lead's null (fewer than n successors)
            // falls out of the same `when`
            val bind = col(anchor).isNotNull &&
              col(s"asof_$tsN") <= col(anchor) + within
            // bind references asof_<tsN>: every when() must land before
            // the asof_* columns drop
            val bound = joined
              .withColumn(idN, when(bind, col(s"asof_$idN")))
              .withColumn(tsN, when(bind, col(s"asof_$tsN")))
            val typed = if (!hasAlt) bound else bound
              .withColumn(typeN, when(bind, col(s"asof_$typeN")))
            df = typed.drop(Seq(s"asof_$idN", s"asof_$tsN") ++
              (if (hasAlt) Seq(s"asof_$typeN") else Nil): _*)
          }
          pending.foreach { p =>
            val inInterval = col(p.tsName) < col(tsN)
            val capped = p.within.fold(inInterval)(w =>
              inInterval && col(p.tsName) <= col(p.anchorName) + w)
            fired += coalesce(capped, lit(false))
          }
          pending = Nil
          posTs += tsN
          anchor = tsN
        case Neg(tpe, within) =>
          val tsN = s"n${i}_ts"
          val g = events.filter(col(typeCol) === tpe)
            .select(col(keyCol), col(tsCol)).distinct()
            .withColumn(tsN, col(tsCol))
          val joined = AsofJoin.asofJoinForward(
            df.withColumn(tsCol, col(anchor)), g, keyCol, tsCol,
            payloadCols = Seq(tsN), inner = false)
          df = joined
            .withColumn(tsN,
              when(col(anchor).isNotNull, col(s"asof_$tsN")))
            .drop(s"asof_$tsN")
          pending ::= Pending(tsN, anchor, within)
      }
    }
    pending.foreach { p => // trailing negations: time-bounded
      val w = p.within.getOrElse(throw new IllegalArgumentException(
        "a trailing Neg step needs `within` — an unbounded \"never " +
          "again\" guard cannot be decided on a growing corpus"))
      fired += coalesce(
        col(p.tsName) <= col(p.anchorName) + w, lit(false))
    }

    val present = posTs.result().map(c => col(c).isNotNull)
      .reduceOption(_ && _).getOrElse(lit(true))
    val guarded = fired.result().reduceOption(_ || _).getOrElse(lit(false))
    val keep = Seq(keyCol, "a_id", "a_ts") ++
      steps.zipWithIndex.collect { case (Pos(_, _, _, alts), i0) =>
        Seq(s"s${i0 + 1}_id", s"s${i0 + 1}_ts") ++
          (if (alts.nonEmpty) Seq(s"s${i0 + 1}_type") else Nil)
      }.flatten
    df.withColumn("matched", present && !guarded)
      .select((keep :+ "matched").map(col): _*)
  }

  /** The q142 shape — `A → B within T, no C strictly between` — as a
    * two-step [[chain]] (Neg(guard) then Pos(b): the guard's interval
    * is `[a_ts, b_ts)`, B's window `[a_ts, a_ts + within]`), keeping
    * the original output column names. */
  def firstMatch(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      aType: String,
      bType: String,
      guardType: String,
      within: Column): DataFrame =
    chain(events, keyCol, tsCol, idCol, typeCol, aType,
        Seq(Neg(guardType), Pos(bType, within)))
      .select(col(keyCol), col("a_id"), col("a_ts"),
        col("s2_id").as("b_id"), col("s2_ts").as("b_ts"), col("matched"))
}
