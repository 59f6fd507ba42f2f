package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Cast discipline over the DuckDB oracle SQL, as a TEST instead of a
  * convention. The flake class this kills: DuckDB widens `sum(BIGINT)`
  * to HUGEINT while Spark stays LongType, so an uncast integer sum
  * that reaches the compared output hash-mismatches even when every
  * value is identical — it shipped three times (a81616f's legacy
  * sweep, then q76 in round 8, then the q41/q88 hygiene pass in round
  * 9). `count(*)`-family is exempt by type: DuckDB count returns
  * BIGINT, which already equals Spark's long.
  *
  * Heuristic (string-level, by design — the oracle strings are the
  * artifact under test): every `sum(` occurrence must be directly
  * wrapped in `CAST(`, or appear in [[Allowed]] with a reason. The
  * allowlist is exact (query, 20-char context) pairs, so reverting
  * any shipped cast fix (q76's roll_sum, q41/q88's window sums)
  * surfaces a NEW unlisted occurrence and fails this spec.
  */
class OracleCastDisciplineSpec extends AnyFunSuite {

  /** Reviewed uncast sums, each safe for a stated reason:
    *  - "double": sum over a DOUBLE column (value, ln(…)) — DOUBLE in
    *    both engines, and a CAST AS BIGINT would be WRONG;
    *  - "downstream-cast": the sum is cast before it reaches the
    *    compared output, just not directly at the call site;
    *  - "integer-div": q97's rank recurrence divides the HUGEINT sum
    *    with `//` inside CTEs whose final output IS cast (hash-green
    *    since round 5).
    */
  private val Allowed: Set[(String, String)] = Set(
    ("q97_pagerank", "sum(r0.rank // deg.d"), // integer-div
    ("q97_pagerank", "sum(r1.rank // deg.d"), // integer-div
    ("q97_pagerank", "sum(r2.rank // deg.d"), // integer-div
    ("q97_pagerank", "sum(r3.rank // deg.d"), // integer-div
    ("q97_pagerank", "sum(r4.rank // deg.d"), // integer-div
    ("q104_set_ops", "sum(user_id), 0) AS "), // downstream-cast (CAST(coalesce(…)))
    ("q41_pack", "sum(n_tok) OVER ( PA"), // downstream-cast (consumed via CAST in cum)
    ("q48_simhash_portable", "sum(CASE WHEN (h >> "), // downstream-cast (bit vote)
    ("q57_mixture_sample", "sum(n_g) AS total FR"), // downstream-cast (quota arithmetic)
    ("q91_lm_quality", "sum(ln((c2.n2 + 1.0)"), // double
    ("q159_mann_whitney", "sum(sum(m)) OVER (OR"), // downstream-cast (mid2's outer CAST)
    ("q159_mann_whitney", "sum(m)) OVER (ORDER "), // downstream-cast (same expression, inner call)
    ("q159_mann_whitney", "sum(m) + 1 AS BIGINT")) // downstream-cast (the outer CAST itself)

  private val SumCall = """(?i)(?<![a-z0-9_])sum\s*\(""".r
  private val CastBefore = """(?i)cast\s*\(\s*$""".r

  test("every oracle sum( is CAST-wrapped or explicitly allowlisted") {
    val violations = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      m <- SumCall.findAllMatchIn(sql)
      if CastBefore.findFirstIn(sql.substring(0, m.start)).isEmpty
      ctx = sql.substring(m.start, math.min(sql.length, m.start + 60))
        .replaceAll("\\s+", " ").take(20)
      if !Allowed.contains((name, ctx))
    } yield s"""("$name", "$ctx")"""
    assert(violations.isEmpty,
      "uncast sum( in oracle SQL — wrap in CAST(... AS BIGINT) (integer " +
        "sums: DuckDB widens to HUGEINT) or allowlist with a reason:\n  " +
        violations.mkString("\n  "))
  }

  test("the allowlist carries no dead entries") {
    // a stale entry means the occurrence it excused changed or went
    // away — re-review rather than let the list rot
    val live = (for {
      (name, sql) <- SparkEntry.oracleSql.toSeq
      m <- SumCall.findAllMatchIn(sql)
      if CastBefore.findFirstIn(sql.substring(0, m.start)).isEmpty
    } yield (name, sql.substring(m.start, math.min(sql.length, m.start + 60))
        .replaceAll("\\s+", " ").take(20))).toSet
    val dead = Allowed.diff(live)
    assert(dead.isEmpty, s"allowlist entries no longer present: $dead")
  }
}
