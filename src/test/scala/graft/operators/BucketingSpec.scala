package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed co-located joins: identical results to the plain join,
  * with ZERO shuffle exchanges in the join's physical plan — the
  * repeated-fact-join pattern at 100 TB (pay the layout shuffle once
  * at write, join for free forever after).
  */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed orders x lineitem join is exchange-free and result-identical") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")

    val ob = Bucketing.writeBucketed(orders, "graft_test_orders_b", "o_orderkey", 4)
    val lb = Bucketing.writeBucketed(lineitem, "graft_test_lineitem_b", "l_orderkey", 4)
    try {
      def agg(o: org.apache.spark.sql.DataFrame, l: org.apache.spark.sql.DataFrame) =
        o.join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))

      val bucketed = agg(ob, lb)
      // the JOIN itself must not shuffle either side; the groupBy
      // aggregation above the join still exchanges (that's its job),
      // so assert on the bare join
      val bareJoin = ob.join(lb, ob("o_orderkey") === lb("l_orderkey"))
      assert(Bucketing.isExchangeFree(bareJoin),
        "bucketed join must read bucket i vs bucket i with no exchange:\n"
          + bareJoin.queryExecution.executedPlan)

      // negative control: the same join on NON-bucketed inputs must
      // shuffle, and isExchangeFree must see through the AQE wrapper
      // to report it (regression guard for the AQE-leaf blind spot).
      // At sf0.001 the join would broadcast (legitimately shuffle-free),
      // so force the shuffle path for this assertion only.
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plainJoin = orders.join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"))
        assert(!Bucketing.isExchangeFree(plainJoin),
          "non-bucketed join must report a shuffle even under AQE:\n"
            + plainJoin.queryExecution.executedPlan)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

      val plain = agg(orders, lineitem)
      val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
        .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSet
      assert(key(bucketed) == key(plain), "bucketing must not change results")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_test_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_test_lineitem_b")
      ()
    }
  }
}
