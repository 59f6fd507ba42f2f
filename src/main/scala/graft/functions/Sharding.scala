package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding: each key goes to the
  * shard whose salted hash of the key is highest. The two properties
  * that matter at fleet scale:
  *   - NO shard map to store or coordinate — any writer/reader
  *     computes the same assignment from (key, shardCount) alone;
  *   - MINIMAL disruption on resize — growing n -> n+1 moves only the
  *     keys the new shard wins (~1/(n+1) of them); no key ever moves
  *     BETWEEN existing shards (ShardingSpec pins this), vs modulo
  *     hashing which reshuffles nearly everything.
  * The hash is the repo's portable md5 family, so shard routing is
  * reproducible across engines and languages (a Go producer and this
  * engine agree on every assignment) — and the oracle can gate it.
  */
object Sharding {

  /** Shard id in `0 until shards` for a STRING key. Per row this
    * evaluates `shards` hashes inside one codegen'd projection — for
    * routing tiers (shards <= a few hundred) that is cheaper than any
    * coordination; for massive n use consistent-hash rings instead. */
  def rendezvousShard(key: Column, shards: Int): Column = {
    require(shards >= 1, s"shards must be positive: $shards")
    val cands = transform(
      sequence(lit(0), lit(shards - 1)),
      s => struct(
        Hashes.md5Long(concat(key, lit(":"), s.cast("string"))).as("h"),
        s.as("s")))
    array_max(cands).getField("s")
  }
}
