package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  /** Positive step: the NEXT event of `eventType` must occur within
    * `within` of the current anchor (inclusive both ends, the
    * firstMatch tie rules); its (id, ts) bind and the chain's anchor
    * advances to it. */
  final case class Pos(eventType: String, within: Column) extends Step
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
    * per-key state machine. A chain already dead at step k (no match
    * within the window) keeps its row with `matched = false` and NULL
    * step columns from k on — the null anchor is masked, never joined
    * through.
    *
    * Output: every seed row `(keyCol, a_id, a_ts)`, then
    * `s<i>_id`/`s<i>_ts` for each positive step i (1-based over
    * `steps`), and `matched`.
    */
  def chain(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      seedType: String,
      steps: Seq[Step]): DataFrame = {
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
        case Pos(tpe, within) =>
          val idN = s"s${i}_id"; val tsN = s"s${i}_ts"
          // unique per (key, ts), ties to max id — the
          // latestPerKeyTime determinism rule firstMatch pins
          val b = events.filter(col(typeCol) === tpe)
            .groupBy(col(keyCol), col(tsCol))
            .agg(max(col(idCol)).as(idN))
            .withColumn(tsN, col(tsCol))
          val joined = AsofJoin.asofJoinForward(
            df.withColumn(tsCol, col(anchor)), b, keyCol, tsCol,
            payloadCols = Seq(idN, tsN), inner = false,
            tolerance = Some((lt, rt) => rt <= lt + within))
          // mask through a dead chain: a null anchor sorts PAST every
          // right row in the descending carry and would surface the
          // globally-earliest event as its "match"
          df = joined
            .withColumn(idN,
              when(col(anchor).isNotNull, col(s"asof_$idN")))
            .withColumn(tsN,
              when(col(anchor).isNotNull, col(s"asof_$tsN")))
            .drop(s"asof_$idN", s"asof_$tsN")
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
      steps.zipWithIndex.collect { case (Pos(_, _), i0) =>
        Seq(s"s${i0 + 1}_id", s"s${i0 + 1}_ts")
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
