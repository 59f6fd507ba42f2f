package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit: evaluate a rule set against a table
  * and return one row per rule — `(rule, checked, violations)` — the
  * Deequ/expectations staple every production pipeline runs before
  * promoting a batch (the reference's poison-queue middleware is the
  * per-message form of the same contract: detect the bad row, count it,
  * don't let it poison downstream — `message/router.go`'s ack/nack
  * boundary generalized to batch constraints).
  *
  * Scale shape: ALL rules on a table fold into ONE pass — the audited
  * table is scanned ONCE, left-joined against each referential rule's
  * DISTINCT parent keys (row-count-preserving: parent keys are
  * distinct, so no multiplication; Catalyst/AQE broadcasts a
  * dimension-sized key set), and every rule (scalar and referential)
  * becomes a conditional aggregate over that single joined scan —
  * adding a rule adds a column, not a job or a scan. Nothing here is
  * per-row driver work; the audit of a 10^11-row table is one scan
  * plus one parent-key-side scan per foreign key. (The previous shape
  * ran one extra full child scan PER referential rule.)
  *
  * Semantics (pinned by DataAuditSpec and the q123 gate):
  *  - [[NotNull]]: violation when ANY listed column is null; checked =
  *    all rows.
  *  - [[Unique]]: violations = count(key) − count(DISTINCT key) (each
  *    extra copy counts once; null keys are not duplicates); checked =
  *    non-null keys.
  *  - [[Satisfies]]: violation when the predicate is false OR null
  *    (an unevaluable constraint is a failing one); checked = all rows.
  *  - [[RefIntegrity]]: violations = non-null child keys with no match
  *    in the parent (SQL FK semantics: null children vacuously pass);
  *    checked = non-null child keys.
  */
object DataAudit {

  sealed trait Rule { def name: String }

  final case class NotNull(name: String, cols: Seq[String]) extends Rule
  final case class Unique(name: String, keyCol: String) extends Rule
  final case class Satisfies(name: String, predicate: Column) extends Rule
  final case class RefIntegrity(
      name: String,
      childCol: String,
      parent: DataFrame,
      parentCol: String) extends Rule

  /** Range-constraint convenience (inclusive bounds). */
  def inRange(name: String, c: String, lo: Column, hi: Column): Satisfies =
    Satisfies(name, col(c).isNotNull && col(c) >= lo && col(c) <= hi)

  /** Run `rules` against `df`. Output: `rule STRING, checked BIGINT,
    * violations BIGINT`, one row per rule (unordered — gate queries
    * add their own orderBy). */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "audit rule names must be unique")
    // validated here, not at the reduce: an empty cols list would die
    // in Catalyst with an opaque empty.reduceLeft, naming no rule
    rules.foreach {
      case NotNull(n, cols) => require(cols.nonEmpty,
        s"NotNull rule '$n' needs at least one column")
      case _ => ()
    }
    val referential = rules.collect { case r: RefIntegrity => r }

    // reserved internal names, same fail-fast as Merge (_t_ex/_s_ex)
    // and TableDiff (_l_ex/_r_ex): a child table carrying its own
    // _pk_i/_hit_i (a prior audit's intermediate, a join product) would
    // otherwise resolve ambiguously and kill the whole audit
    locally {
      val reserved = referential.indices
        .flatMap(i => Seq(s"_pk_$i", s"_hit_$i")).toSet
      val clash = df.columns.filter(reserved.contains)
      require(clash.isEmpty,
        s"DataAudit: column names ${clash.mkString(", ")} are reserved " +
          "by RefIntegrity rules")
    }
    // ONE audited-table scan for every rule: each referential rule
    // left-joins the DISTINCT non-null parent keys (row-count
    // preserving — each child row matches at most one distinct key),
    // then scalar AND referential rules aggregate over the single
    // joined scan. FK semantics unchanged: checked counts non-null
    // child keys, a violation is a non-null child key with no parent
    // hit (null children vacuously pass).
    val withHits = referential.zipWithIndex.foldLeft(df) {
      case (acc, (r, i)) =>
        val keys = r.parent.select(col(r.parentCol).as(s"_pk_$i"))
          .where(col(s"_pk_$i").isNotNull).distinct()
        acc.join(keys.withColumn(s"_hit_$i", lit(1)),
          acc(r.childCol) === col(s"_pk_$i"), "left")
    }
    val refIdx = referential.zipWithIndex.toMap
    val aggs = rules.flatMap {
      case NotNull(n, cols) => Seq(
        count(lit(1)).as(s"_c_$n"),
        sum(when(cols.map(col(_).isNull).reduce(_ || _), 1L)
          .otherwise(0L)).as(s"_v_$n"))
      case Unique(n, k) => Seq(
        count(col(k)).as(s"_c_$n"),
        (count(col(k)) - count_distinct(col(k))).as(s"_v_$n"))
      case Satisfies(n, p) => Seq(
        count(lit(1)).as(s"_c_$n"),
        sum(when(!coalesce(p, lit(false)), 1L).otherwise(0L)).as(s"_v_$n"))
      case r: RefIntegrity =>
        val i = refIdx(r)
        Seq(
          count(col(r.childCol)).as(s"_c_${r.name}"),
          sum(when(col(r.childCol).isNotNull && col(s"_hit_$i").isNull, 1L)
            .otherwise(0L)).as(s"_v_${r.name}"))
    }
    val row = withHits.agg(aggs.head, aggs.tail: _*)
    val triples = rules.map(r => struct(
      lit(r.name).as("rule"),
      col(s"_c_${r.name}").cast("long").as("checked"),
      coalesce(col(s"_v_${r.name}"), lit(0L)).cast("long").as("violations")))
    row.select(explode(array(triples: _*)).as("_r")).select("_r.*")
  }
}
