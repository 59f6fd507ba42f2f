package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted skew join: bit-identical results to the plain join, with the
  * hot key actually spread across salts (the whole point — one
  * straggler task becomes nSalts balanced ones).
  */
class SkewJoinSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("salted join result equals the plain join") {
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = agg(SkewJoin.saltedJoin(l, o, "l_orderkey", "o_orderkey",
      nSalts = 8, saltBy = col("l_partkey")))
    val plain = agg(l.join(o, l("l_orderkey") === o("o_orderkey")))
    assert(salted == plain)
  }

  test("a hot key spreads across salts; task retry derives the same salt") {
    // one key with 10k rows (the skew), distinct payloads to salt by
    val hot = (0 until 10000).map(i => (1L, i.toLong)).toDF("k", "payload")
    val dim = Seq((1L, "only")).toDF("k", "name")
    val salted = hot.withColumn("_salt",
      pmod(xxhash64(col("payload")), lit(8L)))
    val spread = salted.groupBy("_salt").count().collect().map(_.getLong(1))
    assert(spread.length == 8, s"hot key must hit all 8 salts, got ${spread.length}")
    assert(spread.max < 10000 * 0.25, s"no salt may dominate: ${spread.toSeq}")
    // determinism: recomputing (a retried task) assigns identical salts
    val a = salted.collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val b = salted.collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    // and the join still returns every hot row exactly once
    val joined = SkewJoin.saltedJoin(hot, dim, "k", "k", nSalts = 8,
      saltBy = col("payload"))
    assert(joined.count() == 10000)
    assert(joined.select(countDistinct(col("payload"))).as[Long].head() == 10000)
  }
}
