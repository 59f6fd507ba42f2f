package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational MERGE (ANSI `MERGE INTO` / Delta-Hudi-Iceberg upsert) as
  * one declarative plan: join target and source on the key, then apply
  * WHEN MATCHED [AND cond] UPDATE / DELETE and WHEN NOT MATCHED
  * [AND cond] INSERT row-wise.
  *
  * [[ChangelogApply]] is the op-log special case (ordered U/D stream);
  * MERGE is the conditional-snapshot general case — actions depend on
  * COMPARING target and source values ("update if newer", "delete if
  * the source says quantity 0"), which an op column can't express.
  *
  * Scale shape: ONE full-outer shuffle join on the key (broadcast when
  * the source is dimension-sized — Catalyst/AQE decide), then pure
  * row-local projection/filter. No window, no driver state; this is
  * exactly the plan Delta's MERGE lowers to, minus the file-level
  * skipping a table format would add.
  *
  * Conditions reference the joined row via the `t`/`s` aliases —
  * `col("s.ts") > col("t.ts")`. Clause semantics (MergeSpec + q127):
  *  - matched + `whenMatchedDelete` true → row dropped.
  *  - else matched + `whenMatchedUpdate` true → source values win.
  *  - else matched → target row unchanged.
  *  - source-only + `whenNotMatchedInsert` true → source row inserted.
  *  - target-only → target row unchanged. `None` = clause absent.
  *
  * `source` must carry every target column (same names) and be UNIQUE
  * per key — MERGE on a duplicate-key source is nondeterministic in
  * every engine; compact first ([[ChangelogApply.compact]]).
  *
  * Null keys follow ANSI `ON t.k = s.k`: they never match — a
  * null-key source row is NOT MATCHED (inserts under the clause), a
  * null-key target row stays untouched (MergeSpec pins this; Delta
  * behaves the same).
  */
object Merge {

  def merge(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      whenMatchedDelete: Option[Column] = None,
      whenMatchedUpdate: Option[Column] = Some(lit(true)),
      whenNotMatchedInsert: Option[Column] = Some(lit(true))): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val missing = target.columns.filterNot(source.columns.contains)
    require(missing.isEmpty,
      s"source is missing target columns: ${missing.mkString(", ")}")
    require(!target.columns.contains("_t_ex") && !source.columns.contains("_s_ex"),
      "column names _t_ex/_s_ex are reserved by Merge")

    val t = target.withColumn("_t_ex", lit(true)).alias("t")
    val s = source.withColumn("_s_ex", lit(true)).alias("s")
    // plain equality, NOT <=> : ANSI MERGE's `ON t.k = s.k` never
    // matches null keys — a null-key source row is NOT MATCHED (it
    // inserts), a null-key target row stays untouched. The null-safe
    // form also fanned out: EVERY null-key target row full-outer-
    // matched the single null-key source row and got rewritten.
    val joinCond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val joined = t.join(s, joinCond, "full_outer")

    val matched = col("t._t_ex").isNotNull && col("s._s_ex").isNotNull
    val sourceOnly = col("t._t_ex").isNull
    def cond(c: Option[Column]): Column =
      c.map(x => coalesce(x, lit(false))).getOrElse(lit(false))

    val deleted = matched && cond(whenMatchedDelete)
    val updated = matched && !cond(whenMatchedDelete) && cond(whenMatchedUpdate)
    val inserted = sourceOnly && cond(whenNotMatchedInsert)

    val kept = joined.filter(!deleted && (matched || col("s._s_ex").isNull || inserted))
    val out = target.columns.toSeq.map { c =>
      when(updated || inserted, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
    }
    kept.select(out: _*)
  }
}
