package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The rendezvous property the oracle gate can't show: resizing n -> n+1
  * moves keys ONLY onto the new shard — never between existing shards —
  * and the move fraction is ~1/(n+1). Plus reasonable balance.
  */
class ShardingSpec extends SparkSpec {

  import spark.implicits._

  private val keys = (0 until 4000).map(i => s"key-$i")

  private def assign(shards: Int): Map[String, Int] =
    keys.toDF("k")
      .select(col("k"), Sharding.rendezvousShard(col("k"), shards).as("s"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap

  test("resize moves keys only to the NEW shard, ~1/(n+1) of them") {
    val before = assign(10)
    val after = assign(11)
    val moved = keys.filter(k => before(k) != after(k))
    assert(moved.nonEmpty, "some keys must move to the new shard")
    moved.foreach { k =>
      assert(after(k) == 10, s"moved key $k went to old shard ${after(k)}")
    }
    val frac = moved.size.toDouble / keys.size
    assert(frac > 0.04 && frac < 0.15,
      s"expected ~1/11 of keys to move, got $frac")
  }

  test("assignments are reasonably balanced and in range") {
    val byShard = assign(8).values.groupBy(identity).view.mapValues(_.size)
    assert(byShard.keySet == (0 until 8).toSet)
    val (lo, hi) = (byShard.values.min, byShard.values.max)
    assert(hi < 2 * lo, s"balance off: min=$lo max=$hi")
  }
}
