package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC changelog application: fold a stream of keyed upserts and
  * tombstone deletes onto a base snapshot, latest-wins per key.
  *
  * This is the batch form of what the reference's durable transports do
  * per message (offset-ordered apply of publishes onto consumer state —
  * `pubsub/gochannel/pubsub.go`'s ordered in-flight queue generalized to
  * keyed state), and the table-maintenance staple every warehouse pairs
  * with it (Delta `MERGE`, Hudi compaction, Paimon changelog-apply).
  *
  * Scale shape: ONE hash shuffle of `base ∪ changes` on the key. The
  * winner per key is picked with `max_by(payload, struct(gen, seq…))`
  * — an ordinary aggregate, so Catalyst runs map-side partial
  * aggregation (each task pre-reduces its slice to one candidate per
  * key) and no per-key sort or window buffer ever materializes. A
  * window `row_number` formulation would sort every key group and
  * cannot partial-aggregate; at 10^11 change rows that is the
  * difference between a merge and a full sort of the changelog.
  *
  * Semantics (all pinned by ChangelogApplySpec and the q119 gate):
  *  - `changes` rows carry `opCol` ∈ {"U","D"} and a total-order
  *    sequence in `seqCols` (CDC LSN / (ts, event_id)); ties are the
  *    caller's bug — document feeds must be totally ordered per key.
  *  - base rows sort before every change (generation 0 vs 1), so a
  *    key untouched by the changelog survives unchanged.
  *  - latest "D" deletes the key even if it exists in base; a "U"
  *    AFTER a "D" re-inserts (delete is not sticky).
  *  - a "U" for a key absent from base inserts it.
  *  - `base` must be unique per key (it is a snapshot).
  */
object ChangelogApply {

  /** Compact a changelog to its latest row per key (tombstones kept —
    * downstream appliers still need them). Payload = every non-key,
    * non-seq, non-op column of `changes`. The winner's SEQUENCE
    * columns ride along in the output: a compacted changelog must
    * remain a valid changelog, or the documented compositions —
    * [[apply]] over a compacted frame, Merge conditions comparing
    * sequences — die on a missing column. */
  def compact(
      changes: DataFrame,
      keyCols: Seq[String],
      seqCols: Seq[String],
      opCol: String): DataFrame = {
    val payload =
      changes.columns.filterNot(c =>
        keyCols.contains(c) || seqCols.contains(c) || c == opCol).toSeq
    val carried = (opCol +: seqCols) ++ payload
    val winner = struct(carried.map(col): _*)
    val ord = struct(seqCols.map(col): _*)
    changes
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(winner, ord).as("_w"))
      .select(keyCols.map(col) ++ carried.map(c =>
        col(s"_w.$c").as(c)): _*)
  }

  /** Apply `changes` onto `base`. Output: key columns, the payload
    * columns of `base`, and `src` ("base" = untouched snapshot row,
    * "cdc" = value written by the changelog). Deleted keys are absent.
    */
  def apply(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      seqCols: Seq[String],
      opCol: String): DataFrame = {
    val payload = base.columns.filterNot(keyCols.contains).toSeq
    val seqTypes = seqCols.map(c => changes.schema(c).dataType)
    // Base rows become generation-0 upserts whose seq is never compared
    // against a change's (generation decides first), only against
    // another base row's — excluded by snapshot uniqueness.
    val b = base.select(
      keyCols.map(col) ++
        Seq(lit(0).as("_gen")) ++
        seqCols.zip(seqTypes).map { case (c, dt) => lit(null).cast(dt).as(c) } ++
        Seq(lit("U").as(opCol)) ++
        payload.map(col): _*)
    val c = changes.select(
      keyCols.map(col) ++
        Seq(lit(1).as("_gen")) ++
        seqCols.map(col) ++
        Seq(col(opCol)) ++
        payload.map(col): _*)
    val winner = struct((Seq(opCol, "_gen") ++ payload).map(col): _*)
    val ord = struct((Seq("_gen") ++ seqCols).map(col): _*)
    b.unionByName(c)
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(winner, ord).as("_w"))
      .where(col(s"_w.$opCol") =!= "D")
      .select(keyCols.map(col) ++
        payload.map(p => col(s"_w.$p").as(p)) :+
        when(col("_w._gen") === 1, lit("cdc")).otherwise(lit("base"))
          .as("src"): _*)
  }

  /** Convenience: derive an op column from a predicate. */
  def opFrom(isDelete: Column): Column =
    when(isDelete, lit("D")).otherwise(lit("U"))
}
