package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Hashes

/** Bloom semi join: exact result (FPs removed by the real join) and a
  * genuinely selective pre-filter (rows entering the join are close to
  * the true match count, not the fact count).
  */
class BloomJoinSpec extends SparkSpec {

  import spark.implicits._

  test("result equals the plain semi join; prefilter prunes the scan") {
    val fact = (0L until 20000L).map(i => (i % 5000, i)).toDF("k", "payload")
    val build = (0L until 5000L).filter(_ % 40 == 0).toDF("k") // 125 keys

    val expect = fact.join(build, Seq("k"), "left_semi")
      .agg(count(lit(1)), sum(col("payload"))).collect().head
    val got = BloomJoin.semiJoin(fact, build, "k", expectedKeys = 200)
      .agg(count(lit(1)), sum(col("payload"))).collect().head
    assert(got == expect, s"bloom semi join must be exact: $got vs $expect")

    // the filter alone (before the join) passes match rows + few FPs
    val bf = build.stat.bloomFilter(col("k"), 200, 0.01)
    val passed = fact.filter(Hashes.bloomContains(col("k"), bf)).count()
    val trueMatches = expect.getLong(0)
    assert(passed >= trueMatches, "no false negatives ever")
    assert(passed <= trueMatches + (20000 * 0.05).toLong,
      s"prefilter should prune most non-matches: passed=$passed of 20000, " +
        s"true=$trueMatches")
  }
}
