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
  * Scale shape: ALL scalar rules on a table fold into ONE conditional-
  * aggregation pass (a single scan, map-side partial aggs, one
  * 1-row result — adding a rule adds a column, not a job), and each
  * referential rule is one LEFT join against the DISTINCT parent keys
  * (no row multiplication; Catalyst/AQE broadcasts the key set when it
  * is dimension-sized). Nothing here is per-row driver work; the audit
  * of a 10^11-row table is one scan for ALL scalar rules, plus one
  * child-side scan + join per foreign key.
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
    val scalar = rules.filter(!_.isInstanceOf[RefIntegrity])
    val referential = rules.collect { case r: RefIntegrity => r }

    val scalarOut: Option[DataFrame] =
      if (scalar.isEmpty) None
      else {
        val aggs = scalar.flatMap {
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
            throw new IllegalStateException(s"unreachable: ${r.name}")
        }
        val row = df.agg(aggs.head, aggs.tail: _*)
        val triples = scalar.map(r => struct(
          lit(r.name).as("rule"),
          col(s"_c_${r.name}").cast("long").as("checked"),
          coalesce(col(s"_v_${r.name}"), lit(0L)).cast("long").as("violations")))
        Some(row.select(explode(array(triples: _*)).as("_r")).select("_r.*"))
      }

    val refOuts = referential.map { r =>
      // reserved internal names, same fail-fast as Merge (_t_ex/_s_ex)
      // and TableDiff (_l_ex/_r_ex): a child table carrying its own
      // _pk/_hit (a prior audit's intermediate, a join product) would
      // otherwise resolve ambiguously and kill the whole audit
      val clash = df.columns.filter(Seq("_pk", "_hit").contains)
      require(clash.isEmpty,
        s"DataAudit: column names ${clash.mkString(", ")} are reserved " +
          s"by RefIntegrity '${r.name}'")
      val keys = r.parent.select(col(r.parentCol).as("_pk"))
        .where(col("_pk").isNotNull).distinct()
      df.where(col(r.childCol).isNotNull)
        .join(keys.withColumn("_hit", lit(1)),
          col(r.childCol) === col("_pk"), "left")
        .agg(
          count(lit(1)).cast("long").as("checked"),
          coalesce(sum(when(col("_hit").isNull, 1L).otherwise(0L)), lit(0L))
            .cast("long").as("violations"))
        .select(lit(r.name).as("rule"), col("checked"), col("violations"))
    }

    (scalarOut.toSeq ++ refOuts).reduce(_ unionByName _)
  }
}
