package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join split can't help (e.g. the skew is in a single key that
  * exceeds one task's memory even after splitting, or AQE is off in a
  * streaming micro-batch). The classic transform:
  *
  *  - the SKEWED side gets a deterministic salt in [0, n) derived by
  *    hashing its row identity (never `rand()` — retried tasks must
  *    re-derive the same salt or a retry duplicates/loses rows);
  *  - the other side is replicated n× with every salt value;
  *  - the join key becomes (key, salt), so the hot key's rows spread
  *    over n partitions instead of one straggler task.
  *
  * Cost model: replication multiplies the build side by n — use for a
  * big-skewed ⋈ small-ish join where broadcast is too big but n× the
  * build side still fits comfortably. Results are identical to the
  * plain join (oracle-gated by q40).
  */
object SkewJoin {

  /** Inner equi-join `skewed(keyL) = other(keyR)`, salted with
    * `nSalts`. `saltBy` seeds the salt (any column(s) of the skewed
    * side — uniqueness not required, only spread; the key itself is a
    * BAD seed since one hot key would then still land in one salt). */
  def saltedJoin(skewed: DataFrame, other: DataFrame,
      keyL: String, keyR: String, nSalts: Int,
      saltBy: Column): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive: $nSalts")
    // internal name fails fast: a caller's real _salt column would be
    // silently replaced and then dropped from the result
    Seq(skewed, other).foreach(d => require(!d.columns.contains("_salt"),
      "column name _salt is reserved by SkewJoin.saltedJoin"))
    val l = skewed.withColumn("_salt", pmod(xxhash64(saltBy), lit(nSalts.toLong)))
    // one generator row per salt value, exploded on the build side
    val r = other.withColumn("_salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    l.join(r, l(keyL) === r(keyR) && l("_salt") === r("_salt"))
      .drop("_salt")
  }
}
