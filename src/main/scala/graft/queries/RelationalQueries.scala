package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QuerySpec.t

/** The relational restatement of the reference's operator surface
  * (SURVEY.md §2.10): every watermill dataflow operator, expressed as
  * the batch-verifiable Spark plan the engine produces for it, paired
  * with the DuckDB oracle SQL. Streaming/component forms of the same
  * operators live in graft.router / graft.streaming / graft.topology;
  * these batch forms share the column logic.
  */
object RelationalQueries {

  /** Co-purchase graph shared by q97 (PageRank) and q107 (triangles):
    * user pairs purchasing on the same day, support >= 8 days, one
    * directed edge per pair (u < v). ONE definition — a threshold or
    * slot change must move both gates (and [[CoPurchaseEdgeCtes]])
    * together or their graphs silently diverge. */
  private def coPurchaseEdges(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct()
      .groupBy(col("d"))
      .agg(sort_array(collect_set(col("user_id"))).as("us"))
      // spread the quadratic per-day pair explode across tasks: the
      // day rows are tiny in BYTES, so AQE coalesces the post-agg
      // stage to one task and the whole |users/day|² explode runs
      // serially (measured: one 1.7 s task inside q97/q107/q172 on 32
      // idle cores). Explode the first level, then repartition by `u`
      // BEFORE the second explode — every (u, *) pair instance from
      // every day lands in the same task, so the map-side partial
      // aggregation of the supp count stays as effective as the old
      // single-task plan (a keyless day-row spread was measured to
      // 2.3× the shuffle and push the combine work into the final
      // agg), while the quadratic explode runs parallel across users.
      .select(explode(col("us")).as("u"), col("us"))
      .repartition(col("u"))
      .select(col("u"), explode(col("us")).as("v"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("supp"))
      .filter(col("supp") >= 8)
      .select(col("u"), col("v"))

  /** The oracle twin of [[coPurchaseEdges]]: CTEs `s` (purchase slots)
    * and `e0` (directed edges, u < v, support >= 8). */
  private val CoPurchaseEdgeCtes =
    """s AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts) AS d
      |  FROM events WHERE event_type = 'purchase'),
      |e0 AS (
      |  SELECT a.user_id AS u, b.user_id AS v
      |  FROM s a JOIN s b ON a.d = b.d AND a.user_id < b.user_id
      |  GROUP BY 1, 2 HAVING count(*) >= 8)""".stripMargin

  val specs: Seq[QuerySpec] = Seq(

    // ---- aggregation baseline (metrics-style rollup over lineitem) ----
    // TPC-H Q1 shape: one shuffle, map-side partial aggregation.
    // Integer-exact measures: the original round(sum(double), 2) /
    // round(avg, 4) forms were latent gate flakes — a ~150k-double sum
    // reordered across engines can flip a cent at a .005 boundary, and
    // Spark/DuckDB round division results differently (HALF_UP vs
    // multiply-then-round). Cents/micros sums and a truncating integer
    // average are bit-portable under ANY accumulation order.
    QuerySpec("q01_pricing_summary",
      (s, dir) => {
        t(s, dir, "lineitem")
          // string literal cast in the SESSION zone (pinned UTC), never
          // Timestamp.valueOf — that parses in the JVM DEFAULT zone,
          // which is NOT pinned, so on a UTC+2 machine the boundary
          // would shift two hours off the DuckDB oracle's naive value
          .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).cast("long").as("sum_qty"), // whole-valued
            sum(round(col("l_extendedprice") * 100).cast("long")).as("base_cents"),
            sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
              .cast("long")).as("disc_price_micro"),
            count(lit(1)).as("count_order"))
          .withColumn("avg_qty_micro",
            expr("sum_qty * 10000L div count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             |    AS base_cents,
             |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
             |    AS BIGINT)) AS BIGINT) AS disc_price_micro,
             |  CAST(count(*) AS BIGINT) AS count_order,
             |  CAST(sum(l_quantity) AS BIGINT) * 10000 // CAST(count(*) AS BIGINT)
             |    AS avg_qty_micro
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- projection/filter: HandlerFunc transform (SURVEY §2.2) ----
    QuerySpec("q02_filter_project",
      (s, dir) => t(s, dir, "events")
        .filter(col("event_type") === "click" && col("value") > 50)
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id, value FROM events
             |WHERE event_type = 'click' AND value > 50
             |ORDER BY event_id""".stripMargin)),

    // ---- flatMap 1->N: HandlerFunc fan-out (message/router.go:23-32) ----
    QuerySpec("q03_flatmap_explode",
      (s, dir) => t(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("word")),
      Some("""SELECT word, CAST(count(*) AS BIGINT) AS n
             |FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
             |GROUP BY word ORDER BY word""".stripMargin)),

    // ---- FanIn: N topics -> 1 (components/fanin/fanin.go:15-32) ----
    QuerySpec("q04_fanin_union",
      (s, dir) => {
        val e = t(s, dir, "events")
        val clicks = e.filter(col("event_type") === "click").select(col("user_id"), col("value"))
        val purchases = e.filter(col("event_type") === "purchase").select(col("user_id"), col("value"))
        clicks.unionByName(purchases)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"), (sum(floor(col("value") * 100)) / 100.0).as("sum_value"))
          .orderBy(col("user_id"))
      },
      Some("""WITH u AS (
             |  SELECT user_id, value FROM events WHERE event_type = 'click'
             |  UNION ALL
             |  SELECT user_id, value FROM events WHERE event_type = 'purchase')
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE)
             |    / 100.0 AS sum_value
             |FROM u GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- windowed dedup: Deduplicator middleware (deduplicator.go:64-126)
    // batch oracle form: first row per (key, hour) survives.
    QuerySpec("q06_dedup_window",
      (s, dir) => {
        val w = Window
          .partitionBy(col("user_id"), col("event_type"), date_trunc("hour", col("ts")))
          .orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .groupBy(col("event_type")).agg(count(lit(1)).as("survivors"))
          .orderBy(col("event_type"))
      },
      Some("""WITH d AS (
             |  SELECT event_type, row_number() OVER (
             |    PARTITION BY user_id, event_type, date_trunc('hour', ts)
             |    ORDER BY ts, event_id) AS rn
             |  FROM events)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS survivors
             |FROM d WHERE rn = 1 GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- top-k / limit: BulkRead (message/subscriber/read.go:10-27) ----
    QuerySpec("q07_topk",
      (s, dir) => t(s, dir, "events")
        .orderBy(col("value").desc, col("event_id"))
        .limit(100)
        .select(col("event_id"), col("value")),
      Some("""SELECT event_id, value FROM events
             |ORDER BY value DESC, event_id LIMIT 100""".stripMargin)),

    // ---- routing by key: Forwarder envelope destination
    // (components/forwarder/envelope.go:12-33) ----
    QuerySpec("q08_route_topic",
      (s, dir) => t(s, dir, "events")
        .select(concat(lit("topic_"), col("event_type")).as("topic"))
        .groupBy(col("topic")).agg(count(lit(1)).as("n"))
        .orderBy(col("topic")),
      Some("""SELECT 'topic_' || event_type AS topic, CAST(count(*) AS BIGINT) AS n
             |FROM events GROUP BY 1 ORDER BY topic""".stripMargin)),

    // ---- stateful counter: exactly-once counter example / requeue
    // retries (components/requeuer/requeuer.go:123-153) ----
    QuerySpec("q09_stateful_counter",
      (s, dir) => t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), (sum(floor(col("value") * 100)) / 100.0).as("total_value"))
        .filter(col("n_events") > 60)
        .orderBy(col("user_id")),
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE)
             |    / 100.0 AS total_value
             |FROM events GROUP BY user_id HAVING count(*) > 60
             |ORDER BY user_id""".stripMargin)),

    // ---- event-time delay: delayed consumption filter
    // (components/delay/delay.go:16-68, docs delayed-messages.md) ----
    QuerySpec("q10_delay_filter",
      (s, dir) => {
        val e = t(s, dir, "events")
        val mx = e.agg(max(col("ts")).as("mx"))
        e.crossJoin(broadcast(mx))
          .filter(col("ts") + expr("INTERVAL 1 HOUR") <= col("mx"))
          .groupBy(col("event_type")).agg(count(lit(1)).as("deliverable"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS deliverable
             |FROM events
             |WHERE ts + INTERVAL 1 HOUR <= (SELECT max(ts) FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- request/reply correlation: reply within timeout window
    // (components/requestreply/requestreply.go:14-66) ----
    QuerySpec("q11_request_reply",
      (s, dir) => {
        val e = t(s, dir, "events")
        val req = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("req_ts"))
        val rep = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("rep_ts"))
        req.join(rep, Seq("user_id"))
          .filter(col("rep_ts") > col("req_ts") &&
            col("rep_ts") <= col("req_ts") + expr("INTERVAL 1 HOUR"))
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT r.user_id AS user_id, CAST(count(*) AS BIGINT) AS n_pairs
             |FROM events r JOIN events p
             |  ON r.user_id = p.user_id
             | AND r.event_type = 'click' AND p.event_type = 'purchase'
             | AND p.ts > r.ts AND p.ts <= r.ts + INTERVAL 1 HOUR
             |GROUP BY r.user_id ORDER BY user_id""".stripMargin)),

    // ---- metrics aggregation: per-window handler stats
    // (components/metrics/handler.go:36-65) ----
    QuerySpec("q12_metrics_window",
      (s, dir) => t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          // sum, not avg: round(avg) can land on exact .0005 ties where
          // Spark (HALF_UP) and DuckDB (half-even) disagree
          (sum(floor(col("value") * 100)) / 100.0).as("sum_value"),
          countDistinct(col("user_id")).as("uniq_users"))
        .orderBy(col("bucket"), col("event_type")),
      Some("""SELECT date_trunc('hour', ts) AS bucket, event_type,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE)
             |    / 100.0 AS sum_value,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS uniq_users
             |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin)),

    // ---- per-key ordering: TestPublishSubscribeInOrder
    // (pubsub/tests/test_pubsub.go:405-482) ----
    QuerySpec("q13_order_per_key",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 3)
          .select(col("user_id"), col("event_id").as("third_event"))
          .orderBy(col("user_id"))
      },
      Some("""WITH r AS (
             |  SELECT user_id, event_id, row_number() OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events)
             |SELECT user_id, event_id AS third_event FROM r WHERE rn = 3
             |ORDER BY user_id""".stripMargin)),

    // ---- star join (harness star schema; dims broadcast) ----
    QuerySpec("q14_star_join",
      (s, dir) => {
        val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name").as("region"))
          // micro-unit revenue: 5 region groups x the whole lineitem
          // table is the biggest double accumulation of any gate — the
          // regime where cross-engine sum reorder can flip a cent at
          // round(,2); exact longs are order-immune
          .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
              .cast("long")).as("revenue_micro"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("region"))
      },
      Some("""SELECT r_name AS region,
             |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
             |    AS BIGINT)) AS BIGINT) AS revenue_micro,
             |  CAST(count(*) AS BIGINT) AS n_lines
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY region""".stripMargin)),

    // ---- anti join (orders that never produced messages; NOT EXISTS) ----
    QuerySpec("q15_anti_join",
      (s, dir) => {
        val o = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
        o.join(li, col("o_orderkey") === col("l_orderkey"), "left_anti")
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- CQRS type dispatch: filter by type name + unmarshal payload
    // (components/cqrs/command_processor.go:315-375) ----
    QuerySpec("q16_cqrs_dispatch",
      (s, dir) => t(s, dir, "events")
        .filter(col("event_type") === "signup")
        .select((regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long") % 10).as("k_bucket"))
        .groupBy(col("k_bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("k_bucket")),
      Some("""SELECT TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) % 10 AS k_bucket,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM events WHERE event_type = 'signup'
             |GROUP BY 1 ORDER BY k_bucket""".stripMargin)),

    // ---- throttle / bulk-read: first 100 messages per topic
    // (middleware/throttle.go:11-31, subscriber/read.go) ----
    QuerySpec("q25_throttle_bulk",
      (s, dir) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 100)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), (sum(floor(col("value") * 100)) / 100.0).as("sum_value"))
          .orderBy(col("event_type"))
      },
      Some("""WITH r AS (
             |  SELECT event_type, value, row_number() OVER (
             |    PARTITION BY event_type ORDER BY ts, event_id) AS rn
             |  FROM events)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE)
             |    / 100.0 AS sum_value
             |FROM r WHERE rn <= 100 GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // ---- poison-queue split: per-row error channel
    // (middleware/poison.go:30-60) ----
    QuerySpec("q26_poison_split",
      (s, dir) => t(s, dir, "events")
        .select(col("event_type"),
          when(col("value") < 1, lit("poison")).otherwise(lit("ok")).as("channel"))
        .groupBy(col("event_type"), col("channel")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("channel")),
      Some("""SELECT event_type,
             |  CASE WHEN value < 1 THEN 'poison' ELSE 'ok' END AS channel,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM events GROUP BY 1, 2 ORDER BY event_type, channel""".stripMargin)),

    // ---- sessionization: per-key gap detection (ordering assertions
    // generalized; lag window) ----
    QuerySpec("q28_sessions",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .withColumn("prev", lag(col("ts").cast("double"), 1).over(w))
          .withColumn("new_sess",
            when(col("prev").isNull || col("ts").cast("double") - col("prev") > 1800.0, 1)
              .otherwise(0))
          .groupBy(col("user_id"))
          .agg(sum(col("new_sess")).cast("long").as("n_sessions"))
          .orderBy(col("user_id"))
      },
      Some("""WITH g AS (
             |  SELECT user_id,
             |    CASE WHEN lag(epoch(ts)) OVER w IS NULL
             |           OR epoch(ts) - lag(epoch(ts)) OVER w > 1800.0
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- FanOut: broadcast/multicast, 1 row -> M consumers
    // (pubsub/gochannel/fanout.go:23-91; the batch form of
    // graft.topology.FanOut's per-row multi-topic routing) ----
    QuerySpec("q32_fanout_multicast",
      (s, dir) => t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"),
          explode(array(lit("audit"), lit("billing"), lit("analytics"))).as("consumer"),
          col("value"))
        .groupBy(col("consumer"))
        .agg(count(lit(1)).as("n"), (sum(floor(col("value") * 100)) / 100.0).as("total"))
        .orderBy(col("consumer")),
      Some("""SELECT consumer, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE)
             |    / 100.0 AS total
             |FROM (SELECT event_id,
             |        unnest(['audit', 'billing', 'analytics']) AS consumer,
             |        value
             |      FROM events WHERE event_type = 'purchase')
             |GROUP BY consumer ORDER BY consumer""".stripMargin)),

    // ---- salted skew join: results must be IDENTICAL to the plain
    // join (the oracle runs the unsalted SQL) — salting only respreads
    // a hot key over nSalts partitions at the cost of replicating the
    // build side nSalts× ----
    QuerySpec("q40_salted_join",
      (s, dir) => graft.operators.SkewJoin.saltedJoin(
          t(s, dir, "lineitem"), t(s, dir, "orders"),
          "l_orderkey", "o_orderkey", nSalts = 8, saltBy = col("l_partkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          // l_quantity is integral-valued; the BIGINT cast keeps the
          // sum exact so engine fp-accumulation order can't matter
          sum(col("l_quantity")).cast("long").as("qty"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(l_quantity) AS BIGINT) AS qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)),

    // ---- as-of join: each click picks up the latest prior view's
    // value per user. Union-carry plan (one shuffle + in-partition
    // sort), never a range-join pair space; the oracle is DuckDB's
    // native ASOF JOIN. Right side pre-deduped per (user, ts) with
    // max_by(event_id) on both engines so "latest" is deterministic ----
    QuerySpec("q47_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val views = graft.operators.AsofJoin.latestPerKeyTime(
          ev.filter(col("event_type") === "view"),
          "user_id", "ts", tiebreak = "event_id", payloadCols = Seq("value"))
        graft.operators.AsofJoin
          .asofJoin(clicks, views, "user_id", "ts", payloadCols = Seq("value"))
          .select(col("event_id"), col("user_id"), col("value"),
            col("asof_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH c AS (SELECT event_id, user_id, ts, value FROM events
             |      WHERE event_type = 'click'),
             |v AS (SELECT user_id, ts, max_by(value, event_id) AS value
             |      FROM events WHERE event_type = 'view' GROUP BY 1, 2)
             |SELECT c.event_id, c.user_id, c.value, v.value AS asof_value
             |FROM c ASOF JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts
             |ORDER BY event_id""".stripMargin)),

    // ---- latest-wins compaction (CDC/upsert materialization): one
    // surviving row per key = the newest by (ts, event_id). The state
    // compaction a changelog consumer runs before serving reads; one
    // shuffle on the key, WindowGroupLimit prunes the rank
    // materialization ----
    QuerySpec("q59_latest_event",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        t(s, dir, "events")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_type"))
          .orderBy(col("user_id"))
      },
      Some("""WITH r AS (
             |  SELECT user_id, event_id, event_type, row_number() OVER (
             |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
             |  FROM events)
             |SELECT user_id, event_id AS last_event_id, event_type AS last_type
             |FROM r WHERE rk = 1 ORDER BY user_id""".stripMargin)),

    // ---- exact multi-distinct cardinality profile: per event type,
    // event count + distinct users + distinct active days. Exercises
    // the expand-based multi-distinct aggregate (each COUNT(DISTINCT)
    // gets its own partial-dedup lane — still one shuffle round-trip,
    // no driver involvement). The exact twin of an HLL profile; at
    // 100 TB swap approx_count_distinct in when ±2% is acceptable ----
    QuerySpec("q60_cardinality_profile",
      (s, dir) => t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(to_date(col("ts"))).as("n_days"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             |  CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // ---- hierarchical rollup: per (type, day), per type, and grand
    // total in ONE pass (Expand-based — each input row fans to its
    // grouping sets before the single shuffle; no re-scan per level).
    // NULL grouping keys order first in both engines by explicit
    // direction ----
    QuerySpec("q64_rollup",
      // rollup NULL keys surface as a '(all)' sentinel: the compare
      // harness sorts row tuples, and None is unorderable against
      // strings — sentinel-ize in BOTH engines instead
      (s, dir) => t(s, dir, "events")
        .rollup(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("event_type"), lit("(all)")).as("event_type"),
          coalesce(col("d").cast("string"), lit("(all)")).as("d"), col("n"))
        .orderBy(col("event_type"), col("d")),
      Some("""WITH r AS (
             |  SELECT event_type, CAST(ts AS DATE) AS d,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY ROLLUP(event_type, d))
             |SELECT coalesce(event_type, '(all)') AS event_type,
             |  coalesce(CAST(d AS VARCHAR), '(all)') AS d, n
             |FROM r ORDER BY event_type, d""".stripMargin)),

    // ---- ntile bucketing: users quartiled by total event count.
    // NOT the textbook `ntile(4) OVER (ORDER BY …)` — that window has
    // no partitionBy, so Spark funnels EVERY per-user row through one
    // task (the 100 TB cliff; users grow with the corpus). Instead:
    // GlobalIndex assigns the global rank partition-parallel (range
    // partition + per-partition numbering + control-plane offset
    // prefix-sum), and the quartile is then a closed-form function of
    // (rank, n) — exactly ntile's bucket arithmetic: with n rows and
    // k tiles the first n%k tiles hold n/k+1 rows, the rest n/k. The
    // (n_events, user_id) key is a total order, so the rank (and thus
    // the tile) is deterministic. The total n rides out of the SAME
    // control-plane offsets relation the ranking builds
    // (withRowIndexAndCount), so the per-user frame is consumed
    // exactly once — no checkpoint, no second count pass ----
    QuerySpec("q65_ntile",
      (s, dir) => {
        val users = t(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"))
        graft.operators.GlobalIndex.withRowIndexAndCount(
            users, Seq(col("n_events").desc, col("user_id")), "idx", "_n")
          // ntile(k) from 0-based rank: cut = (n%k)·(n/k+1) splits the
          // big tiles from the small; greatest(…,1) keeps the dead
          // branch ANSI-safe when n < 4 (then every idx < cut)
          .withColumn("quartile", expr(
            """CAST(CASE WHEN idx < (_n % 4) * (_n div 4 + 1)
              |  THEN idx div (_n div 4 + 1)
              |  ELSE _n % 4 + (idx - (_n % 4) * (_n div 4 + 1)) div greatest(_n div 4, 1)
              |END + 1 AS INT)""".stripMargin))
          .groupBy(col("quartile"))
          .agg(count(lit(1)).as("n_users"), sum(col("n_events")).as("total_events"))
          .orderBy(col("quartile"))
      },
      Some("""WITH u AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
             |  FROM events GROUP BY 1),
             |q AS (
             |  SELECT n_events, ntile(4) OVER (
             |    ORDER BY n_events DESC, user_id) AS quartile
             |  FROM u)
             |SELECT quartile, CAST(count(*) AS BIGINT) AS n_users,
             |  CAST(sum(n_events) AS BIGINT) AS total_events
             |FROM q GROUP BY 1 ORDER BY quartile""".stripMargin)),

    // ---- join-key skew profile: group-size histogram by decimal
    // magnitude — the pre-flight audit before choosing plain shuffle
    // vs broadcast vs salting vs AQE skew split. Column-pruned scan
    // of just the key + two aggregations ----
    QuerySpec("q66_key_skew_profile",
      (s, dir) => graft.functions.Diagnostics
        .keyLoadProfile(t(s, dir, "events"), col("user_id")),
      Some("""WITH c AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1)
             |SELECT CAST(length(CAST(n AS VARCHAR)) AS INTEGER) AS magnitude,
             |  CAST(count(*) AS BIGINT) AS n_keys,
             |  CAST(max(n) AS BIGINT) AS max_group,
             |  CAST(sum(n) AS BIGINT) AS n_rows
             |FROM c GROUP BY 1 ORDER BY magnitude""".stripMargin)),

    // ---- pivot (wide counts): per-user event-type matrix with an
    // EXPLICIT value list (schema fixed at plan time — the open-ended
    // form needs a values-discovery pre-pass and is an anti-pattern
    // at scale). One shuffle; pivot lowers to conditional aggregation,
    // which is exactly what the oracle spells out ----
    QuerySpec("q67_pivot",
      (s, dir) => t(s, dir, "events")
        .filter(col("user_id") < 40)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "view", "purchase"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
             |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase
             |FROM events WHERE user_id < 40
             |GROUP BY 1 ORDER BY user_id""".stripMargin)),

    // ---- ordered funnel: per-stage user counts where each stage must
    // happen AFTER the previous one for that user (view -> click ->
    // purchase). One shuffle (user), three conditional min-ts
    // aggregates, then a single-row count roll-up ----
    QuerySpec("q68_funnel",
      (s, dir) => t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_buy"))
        .agg(
          sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_view"),
          sum(when(col("t_click") > col("t_view"), 1L).otherwise(0L)).as("n_click_after_view"),
          sum(when(col("t_buy") > col("t_click") && col("t_click") > col("t_view"), 1L)
            .otherwise(0L)).as("n_full_funnel")),
      Some("""WITH u AS (
             |  SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
             |  FROM events GROUP BY 1)
             |SELECT
             |  CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
             |  CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after_view,
             |  CAST(sum(CASE WHEN t_buy > t_click AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
             |FROM u""".stripMargin)),

    // ---- CUBE: all four grouping sets of (event_type, user bucket)
    // in one pass — completes the grouping-sets family q64's ROLLUP
    // opened (cube = rollup + the column-wise marginals). Same
    // Expand-before-shuffle lowering: each row fans to its 4 grouping
    // sets ahead of ONE shuffle, no per-level re-scan; the multi-
    // distinct lane (q60's shape) rides the same pass. NULL grouping
    // keys sentinel-ized in both engines (the compare harness sorts
    // row tuples; None is unorderable against strings) ----
    QuerySpec("q73_cube",
      (s, dir) => t(s, dir, "events")
        .cube(col("event_type"), pmod(col("user_id"), lit(4)).as("ub"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .select(coalesce(col("event_type"), lit("(all)")).as("event_type"),
          coalesce(col("ub").cast("string"), lit("(all)")).as("ub"),
          col("n"), col("n_users"))
        .orderBy(col("event_type"), col("ub")),
      Some("""WITH r AS (
             |  SELECT event_type, user_id % 4 AS ub,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |  FROM events GROUP BY CUBE(event_type, ub))
             |SELECT coalesce(event_type, '(all)') AS event_type,
             |  coalesce(CAST(ub AS VARCHAR), '(all)') AS ub, n, n_users
             |FROM r ORDER BY event_type, ub""".stripMargin)),

    // ---- rolling anomaly screen: per event_type, flag events whose
    // value exceeds 3x the rolling mean of the preceding 20 events —
    // the monitoring primitive behind spike alerts on a metrics
    // stream. Integer-exact core: milli-unit values (floor(v*1000) —
    // IEEE multiply + floor are bit-identical across engines, unlike
    // CAST, which truncates in Spark but rounds in DuckDB) and a
    // cross-multiplied threshold (v_m * cnt > 3 * roll_sum ≡
    // v_m > 3 * mean) — no float division to round differently.
    // One shuffle (event_type), one sliding ROWS frame; at corpus
    // scale the partition-by key count bounds per-task state ----
    QuerySpec("q76_rolling_anomaly",
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("ts"), col("event_id")).rowsBetween(-20, -1)
        t(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("ts"),
            floor(col("value") * 1000).cast("long").as("v_m"))
          .withColumn("roll_sum", sum(col("v_m")).over(w))
          .withColumn("cnt", count(lit(1)).over(w))
          // warm-up guard: a 1-row history makes every second event a
          // "spike"; demand >= 10 observations before judging
          .filter(col("cnt") >= 10 && col("v_m") * col("cnt") > lit(3) * col("roll_sum"))
          .select(col("event_id"), col("event_type"), col("v_m"),
            col("cnt"), col("roll_sum"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (
             |  SELECT event_id, event_type, ts,
             |    CAST(floor(value * 1000) AS BIGINT) AS v_m
             |  FROM events),
             |w AS (
             |  SELECT event_id, event_type, v_m,
             |    CAST(sum(v_m) OVER (PARTITION BY event_type ORDER BY ts, event_id
             |      ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS BIGINT) AS roll_sum,
             |    count(*) OVER (PARTITION BY event_type ORDER BY ts, event_id
             |      ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS cnt
             |  FROM e)
             |SELECT event_id, event_type, v_m, cnt, roll_sum
             |FROM w WHERE cnt >= 10 AND v_m * cnt > 3 * roll_sum
             |ORDER BY event_id""".stripMargin)),

    // ---- retention curve: users active N days after their first
    // purchase — the cohort-analysis primitive (cohorts collapse to
    // one on this synthetic corpus's 30-day dense window, so the
    // offset curve IS the informative axis; the cohort_week column
    // a production pipeline adds is one more groupBy key). Two
    // shuffles: first-touch per user, then offset rollup. All-integer
    // output; day arithmetic on DATE is engine-identical under the
    // session's UTC timezone ----
    QuerySpec("q79_retention",
      (s, dir) => {
        val p = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").cast("date").as("d"))
        val f = p.groupBy(col("user_id")).agg(min(col("d")).as("f0"))
        p.join(f, Seq("user_id"))
          .select(col("user_id"), datediff(col("d"), col("f0")).as("offset_d"))
          .groupBy(col("offset_d"))
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))
          .orderBy(col("offset_d"))
      },
      Some("""WITH p AS (
             |  SELECT user_id, CAST(ts AS DATE) AS d FROM events
             |  WHERE event_type = 'purchase'),
             |f AS (SELECT user_id, min(d) AS f0 FROM p GROUP BY 1)
             |SELECT CAST(date_diff('day', f0, d) AS INTEGER) AS offset_d,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             |  CAST(count(*) AS BIGINT) AS n_events
             |FROM p JOIN f USING (user_id)
             |GROUP BY 1 ORDER BY offset_d""".stripMargin)),

    // ---- attribution-window range join: clicks by the same user in
    // the 30 minutes before each purchase. The scale path for a
    // bounded-range temporal join: bucket both sides into range-width
    // bins on INTEGER microseconds, explode the probe side to (bin,
    // bin-1) — a window of width W crosses at most 2 W-wide bins — and
    // equi-join on (user_id, bin) before the exact range filter, so
    // Spark plans a hash/sort-merge join instead of the BNLJ a raw
    // inequality join degenerates to. A click matches at most one of
    // the two probe bins: no dedup needed. Integer microsecond
    // arithmetic end-to-end (both engines truncate the parquet ns the
    // same way) ----
    QuerySpec("q80_attribution",
      (s, dir) => {
        val binUs = 1800000000L // 30 min of microseconds
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), expr("unix_micros(ts)").as("c_us"))
          .withColumn("bin", expr(s"c_us div $binUs"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("p_us"))
          .select(col("user_id"), col("event_id"), col("p_us"),
            explode(array(expr(s"p_us div $binUs"), expr(s"p_us div $binUs - 1"))).as("bin"))
        purchases.join(clicks, Seq("user_id", "bin"))
          .filter(col("c_us") >= col("p_us") - binUs && col("c_us") < col("p_us"))
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("n_clicks"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, event_type,
             |    CAST(epoch_ns(ts) AS BIGINT) // 1000 AS us
             |  FROM events),
             |c AS (SELECT user_id, us FROM e WHERE event_type = 'click'),
             |p AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase')
             |SELECT p.event_id, CAST(count(*) AS BIGINT) AS n_clicks
             |FROM p JOIN c ON p.user_id = c.user_id
             |  AND c.us >= p.us - 1800000000 AND c.us < p.us
             |GROUP BY 1 ORDER BY event_id""".stripMargin)),

    // ---- semi-structured extraction: pull a typed field out of the
    // JSON `props` payload and aggregate on it — the schema-on-read
    // pattern for event property bags. `from_json` with an explicit
    // schema (codegen'd, single parse) rather than per-field
    // `get_json_object` re-parses; a production pipeline would
    // project the parsed struct once and prune to the fields it
    // reads. One shuffle ----
    QuerySpec("q82_json_extract",
      (s, dir) => t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"),
          countDistinct(col("k")).as("n_distinct_k"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
             |  CAST(count(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS n_distinct_k
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // ---- behavior transition matrix: counts of adjacent event-type
    // pairs within each user's timeline — the Markov-chain estimate
    // behind next-action prediction and funnel DISCOVERY (q68 checks
    // one known funnel; this surfaces which transitions exist at all).
    // One shuffle (user), one lead() window, one count rollup; ties
    // broken by event_id so the sequence is engine-deterministic ----
    QuerySpec("q84_transitions",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("event_type").as("from_type"), col("to_type"), col("n"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH s AS (
             |  SELECT event_type,
             |    lead(event_type) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events)
             |SELECT event_type AS from_type, to_type,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM s WHERE to_type IS NOT NULL
             |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin)),

    // ---- co-occurrence (market-basket) matrix: for each unordered
    // pair of event types, how many users exhibit both — the support
    // counts behind association rules. Pairs come from ONE grouped
    // sorted collect_set + double explode (the established
    // no-self-join pattern: a distinct-projection self-join would
    // re-evaluate the upstream per branch); the per-user set is
    // bounded by the closed type vocabulary, so collect_set state is
    // control-plane-sized. Lift's numerator/denominators stay integer
    // (n_users, per-type supports via a broadcast join) — the division
    // happens downstream where rounding doesn't gate ----
    QuerySpec("q85_cooccurrence",
      (s, dir) => {
        // the deduped (user, type) set feeds the pair fold AND the
        // support fold — localCheckpoint so the dedup shuffle over the
        // event stream runs once, not per consumer
        val d = t(s, dir, "events")
          .select(col("user_id"), col("event_type")).distinct()
          .localCheckpoint()
        val pairs = d.groupBy(col("user_id"))
          .agg(sort_array(collect_set(col("event_type"))).as("ts"))
          .select(explode(col("ts")).as("t1"), col("ts"))
          .select(col("t1"), explode(col("ts")).as("t2"))
          .filter(col("t1") < col("t2"))
          .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("n_both"))
        val support = d.groupBy(col("event_type")).agg(count(lit(1)).as("s"))
        pairs
          .join(broadcast(support).withColumnRenamed("event_type", "t1")
            .withColumnRenamed("s", "n_t1"), Seq("t1"))
          .join(broadcast(support).withColumnRenamed("event_type", "t2")
            .withColumnRenamed("s", "n_t2"), Seq("t2"))
          .select(col("t1"), col("t2"), col("n_both"), col("n_t1"), col("n_t2"))
          .orderBy(col("t1"), col("t2"))
      },
      Some("""WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
             |p AS (
             |  SELECT a.event_type AS t1, b.event_type AS t2,
             |    CAST(count(*) AS BIGINT) AS n_both
             |  FROM d a JOIN d b
             |    ON a.user_id = b.user_id AND a.event_type < b.event_type
             |  GROUP BY 1, 2),
             |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS s FROM d GROUP BY 1)
             |SELECT t1, t2, n_both, s1.s AS n_t1, s2.s AS n_t2
             |FROM p JOIN s s1 ON p.t1 = s1.event_type
             |       JOIN s s2 ON p.t2 = s2.event_type
             |ORDER BY t1, t2""".stripMargin)),

    // ---- sliding-window active users (the WAU curve): per observed
    // day, distinct users active in the trailing 7 days. Each distinct
    // (day, user) contributes itself to the 7 FORWARD days (explode of
    // a bounded sequence — window width, not data, scales the fanout),
    // then a semi-join restricts to observed days and one distinct
    // count per day. Days index as integers from the corpus epoch so
    // the gate compares no DATE encodings ----
    QuerySpec("q86_rolling_active",
      (s, dir) => {
        val du = t(s, dir, "events")
          .select(datediff(col("ts").cast("date"),
            lit(java.sql.Date.valueOf("2024-01-01"))).as("d"),
            col("user_id")).distinct()
        val days = du.select(col("d")).distinct()
        du.select(explode(sequence(col("d"), col("d") + 6)).as("d"), col("user_id"))
          .join(days, Seq("d"), "left_semi")
          .groupBy(col("d"))
          .agg(countDistinct(col("user_id")).as("wau"))
          .orderBy(col("d"))
      },
      Some("""WITH du AS (
             |  SELECT DISTINCT CAST(date_diff('day', DATE '2024-01-01',
             |    CAST(ts AS DATE)) AS INTEGER) AS d, user_id
             |  FROM events),
             |days AS (SELECT DISTINCT d FROM du)
             |SELECT days.d AS d, CAST(count(DISTINCT du.user_id) AS BIGINT) AS wau
             |FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
             |GROUP BY days.d ORDER BY days.d""".stripMargin)),

    // ---- session STATS via the built-in session_window operator — the
    // q28 semantics carried by Spark's native session state machine
    // (and the batch twin of streaming.StreamingSessionize). The
    // oracle is the independent gaps-and-islands formulation, so the
    // gate pins session_window's merge boundary (diff > gap splits,
    // diff == gap merges) against a from-first-principles rebuild.
    // One shuffle on user_id; session assembly is per-key linear ----
    QuerySpec("q88_session_stats",
      (s, dir) => graft.streaming.StreamingSessionize.sessionsBatch(
          t(s, dir, "events"), "user_id", "ts", "30 minutes")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          max(col("n_events")).as("max_events"),
          sum(col("n_events")).as("n_events_total"))
        .orderBy(col("user_id")),
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN lag(epoch(ts)) OVER w IS NULL
             |           OR epoch(ts) - lag(epoch(ts)) OVER w > 1800.0
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id,
             |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
             |  FROM g),
             |c AS (SELECT user_id, sess_id, count(*) AS n_ev FROM s GROUP BY 1, 2)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
             |  CAST(max(n_ev) AS BIGINT) AS max_events,
             |  CAST(sum(n_ev) AS BIGINT) AS n_events_total
             |FROM c GROUP BY 1 ORDER BY user_id""".stripMargin)),

    // ---- robust outlier screen: per-event-type median/MAD with exact
    // rank-pick centers (q70's rule — no interpolation, so the doubles
    // are bit-identical cross-engine and the k·mad comparison is
    // decision-exact). The heavy-tail-safe twin of a z-score audit;
    // one shuffle carries every window pass ----
    QuerySpec("q89_robust_outliers",
      (s, dir) => graft.functions.Diagnostics.robustOutliers(
          t(s, dir, "events"), col("event_type"), col("value"),
          col("event_id"), k = 3)
        .withColumnRenamed("g", "event_type")
        .orderBy(col("event_type")),
      Some("""WITH r AS (
             |  SELECT event_type AS g, event_id AS tb, value AS v,
             |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk,
             |    count(*) OVER (PARTITION BY event_type) AS n_g
             |  FROM events),
             |m AS (SELECT g, v AS med FROM r WHERE rk = (n_g + 1) // 2),
             |d AS (
             |  SELECT r.g, r.tb, abs(r.v - m.med) AS dev, m.med, r.n_g
             |  FROM r JOIN m ON r.g = m.g),
             |r2 AS (
             |  SELECT g, dev, med, n_g,
             |    row_number() OVER (PARTITION BY g ORDER BY dev, tb) AS rk2
             |  FROM d),
             |m2 AS (SELECT g, dev AS mad FROM r2 WHERE rk2 = (n_g + 1) // 2)
             |SELECT d.g AS event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN d.dev > 3.0 * m2.mad THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_outliers,
             |  max(d.med) AS med, max(m2.mad) AS mad
             |FROM d JOIN m2 ON d.g = m2.g
             |GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // ---- z-order (Morton) layout keys: the Delta/Iceberg OPTIMIZE
    // ZORDER primitive — interleaved-bit codes whose sort order keeps
    // rows close in BOTH dimensions, turning parquet min/max stats
    // into boxes instead of stripes (ZOrderSpec asserts the pruning
    // win; this gate pins the bit math cross-engine). Codegen'd
    // expression, pure scan shape ----
    QuerySpec("q92_zorder_keys",
      (s, dir) => {
        val x = col("user_id").bitwiseAND(lit(65535L))
        val y = floor(col("value") * 100).bitwiseAND(lit(65535L))
        t(s, dir, "events")
          .select(col("event_id"), x.as("x"), y.as("y"),
            graft.functions.ZOrder.zvalue16(x, y).as("z"))
          .orderBy(col("z"), col("event_id"))
          .limit(20)
      },
      Some("""WITH k AS (
             |  SELECT event_id,
             |    user_id & 65535 AS x,
             |    CAST(floor(value * 100) AS BIGINT) & 65535 AS y
             |  FROM events),
             |z AS (
             |  SELECT event_id, x, y,
             |    list_sum(list_transform(generate_series(0, 15),
             |      i -> (((x >> i) & 1) << (2 * i))
             |         + (((y >> i) & 1) << (2 * i + 1)))) AS z
             |  FROM k)
             |SELECT event_id, x, y, CAST(z AS BIGINT) AS z
             |FROM z ORDER BY z, event_id LIMIT 20""".stripMargin)),

    // ---- SCD2 dimension history: per-user event-type runs collapsed
    // to validity intervals (valid_to null on the current run) — the
    // warehouse-standard change-history shape; compose with the as-of
    // join (q47) for "state as of t". One shuffle carries lag + filter
    // + lead; timestamps surface as epoch micros (both engines
    // truncate the parquet ns values identically) ----
    QuerySpec("q93_scd2_history",
      (s, dir) => graft.operators.Scd2.history(
          t(s, dir, "events"),
          key = col("user_id"), ts = unix_micros(col("ts")),
          value = col("event_type"), tieBreak = col("event_id"))
        .withColumnsRenamed(Map("k" -> "user_id", "v" -> "event_type"))
        .orderBy(col("user_id"), col("valid_from")),
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type
             |  FROM events),
             |o AS (
             |  SELECT user_id, event_type, tsu, event_id,
             |    row_number() OVER w AS rn,
             |    lag(event_type) OVER w AS prev
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
             |c AS (
             |  SELECT user_id, event_type, tsu AS valid_from, event_id
             |  FROM o WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
             |SELECT user_id, event_type, valid_from,
             |  lead(valid_from) OVER (
             |    PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to
             |FROM c ORDER BY user_id, valid_from""".stripMargin)),

    // ---- bucketized interval join: clicks landing within 4 hours
    // after a purchase by the same user. The equi-join-on-(key,bucket)
    // rewrite of a range join — the naive form plans BroadcastNestedLoop
    // and dies at scale; this shape is a plain shuffled hash join with
    // ~2 extra rows per interval. id_sum pins exact pair membership ----
    QuerySpec("q94_interval_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val iv = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("p_ts"))
        val pt = ev.filter(col("event_type") === "click")
          .select(col("user_id"), unix_micros(col("ts")).as("c_ts"),
            col("event_id").as("click_id"))
        graft.operators.IntervalJoin.pointInInterval(
            iv, pt, "user_id",
            lo = col("p_ts"), hi = col("p_ts") + lit(14400000000L),
            x = col("c_ts"), bucketWidth = 14400000000L)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_hits"), sum(col("click_id")).as("id_sum"))
          .orderBy(col("user_id"))
      },
      Some("""WITH p AS (
             |  SELECT user_id, epoch_us(ts) AS lo, epoch_us(ts) + 14400000000 AS hi
             |  FROM events WHERE event_type = 'purchase'),
             |c AS (
             |  SELECT user_id, epoch_us(ts) AS x, event_id
             |  FROM events WHERE event_type = 'click')
             |SELECT p.user_id, CAST(count(*) AS BIGINT) AS n_hits,
             |  CAST(sum(c.event_id) AS BIGINT) AS id_sum
             |FROM p JOIN c ON p.user_id = c.user_id
             |  AND c.x >= p.lo AND c.x <= p.hi
             |GROUP BY 1 ORDER BY p.user_id""".stripMargin)),

    // ---- incremental aggregate maintenance: a mid-month snapshot and
    // the tail delta merge into the SAME table a full recompute gives —
    // the oracle computes it the direct way, so the gate IS the
    // merge==recompute proof. Refresh cost scales with the delta ----
    QuerySpec("q96_incremental_agg",
      (s, dir) => {
        // session-zone cast, not Timestamp.valueOf (JVM-default-zone) —
        // the q01 rule
        val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
        // integer-cents sums: this gate's Spark side accumulates as
        // snapshot-sum + delta-sum while the oracle sums directly — a
        // GUARANTEED different double-accumulation grouping, the worst
        // case for the round(sum,2) cent-flip; exact longs are immune
        def rollup(df: org.apache.spark.sql.DataFrame) =
          df.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(round(col("value") * 100).cast("long")).as("cents"),
              min(col("value")).as("min_v"), max(col("value")).as("max_v"))
        val ev = t(s, dir, "events")
        val snapshot = rollup(ev.filter(col("ts") < cutoff))
        val delta = rollup(ev.filter(col("ts") >= cutoff))
        graft.operators.IncrementalAgg.merge(
            Seq(snapshot, delta), keys = Seq("event_type"),
            counts = Seq("n"), sums = Seq("cents"),
            mins = Seq("min_v"), maxs = Seq("max_v"))
          .select(col("event_type"), col("n"),
            col("cents"), col("min_v"), col("max_v"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
             |  min(value) AS min_v, max(value) AS max_v
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // ---- integer fixed-point PageRank over the user co-purchase
    // graph (edges: purchases on the same day, support >= 8 days).
    // Iterative join+agg rounds with NO floats — ranks in millionths,
    // truncating div — so even the 5th iteration hash-matches the
    // oracle's unrolled CTEs exactly. Pairs come from collect_set +
    // double explode (one shuffle), never a self-join of the distinct
    // scan; the single-type slot keeps per-day member lists (and the
    // quadratic pair fanout) bounded — the all-types variant is 30×
    // the candidate volume for the same ranking signal ----
    QuerySpec("q97_pagerank",
      (s, dir) => {
        graft.operators.PageRank.ranks(coPurchaseEdges(s, dir), iterations = 5)
          .withColumnRenamed("node", "user_id")
          .orderBy(col("rank").desc, col("user_id"))
      },
      Some(s"""WITH $CoPurchaseEdgeCtes,
             |e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
             |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
             |r0 AS (SELECT u AS node, CAST(1000000 AS BIGINT) AS rank FROM deg),
             |r1 AS (
             |  SELECT e.v AS node,
             |    150000 + (850000 * sum(r0.rank // deg.deg)) // 1000000 AS rank
             |  FROM e JOIN r0 ON e.u = r0.node JOIN deg ON e.u = deg.u
             |  GROUP BY 1),
             |r2 AS (
             |  SELECT e.v AS node,
             |    150000 + (850000 * sum(r1.rank // deg.deg)) // 1000000 AS rank
             |  FROM e JOIN r1 ON e.u = r1.node JOIN deg ON e.u = deg.u
             |  GROUP BY 1),
             |r3 AS (
             |  SELECT e.v AS node,
             |    150000 + (850000 * sum(r2.rank // deg.deg)) // 1000000 AS rank
             |  FROM e JOIN r2 ON e.u = r2.node JOIN deg ON e.u = deg.u
             |  GROUP BY 1),
             |r4 AS (
             |  SELECT e.v AS node,
             |    150000 + (850000 * sum(r3.rank // deg.deg)) // 1000000 AS rank
             |  FROM e JOIN r3 ON e.u = r3.node JOIN deg ON e.u = deg.u
             |  GROUP BY 1),
             |r5 AS (
             |  SELECT e.v AS node,
             |    150000 + (850000 * sum(r4.rank // deg.deg)) // 1000000 AS rank
             |  FROM e JOIN r4 ON e.u = r4.node JOIN deg ON e.u = deg.u
             |  GROUP BY 1)
             |SELECT node AS user_id, CAST(rank AS BIGINT) AS rank
             |FROM r5 ORDER BY rank DESC, user_id""".stripMargin)),

    // ---- Bloom-prefiltered semi join: probe a Bloom filter of the
    // build keys AT THE SCAN so non-matching fact rows never enter the
    // exchange — the manual, persistable form of AQE's runtime filter.
    // False positives are removed by the real join, so the gate proves
    // bit-equality with the plain semi join (the oracle's IN form) ----
    QuerySpec("q101_bloom_semijoin",
      (s, dir) => {
        val fact = t(s, dir, "lineitem")
        val build = t(s, dir, "part").filter(col("p_size") >= 48)
          .select(col("p_partkey").as("l_partkey"))
        graft.operators.BloomJoin.semiJoin(
            fact, build, "l_partkey", expectedKeys = 200)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), (sum(floor(col("l_quantity") * 100)) / 100.0).as("qty"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS DOUBLE)
             |    / 100.0 AS qty
             |FROM lineitem
             |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 48)
             |GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // ---- analytic window family in one pass: percent_rank/cume_dist
    // (exact integer ratios), lag/lead, first/last with EXPLICIT
    // unbounded frames (default frames differ subtly per engine —
    // pinning ROWS UNBOUNDED..UNBOUNDED is what makes this portable).
    // One shuffle on the partition key serves all seven columns ----
    QuerySpec("q102_window_family",
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "events")
          .select(col("event_type"), col("event_id"), col("value"))
          .withColumn("pr", percent_rank().over(w))
          .withColumn("cd", cume_dist().over(w))
          .withColumn("prev_v", lag(col("value"), 1).over(w))
          .withColumn("next_v", lead(col("value"), 1).over(w))
          .withColumn("lo_id", first(col("event_id")).over(wFull))
          .withColumn("hi_id", last(col("event_id")).over(wFull))
          .filter(col("value") > 99.5)
          .orderBy(col("event_type"), col("event_id"))
      },
      Some("""WITH x AS (
             |  SELECT event_type, event_id, value,
             |    percent_rank() OVER w AS pr,
             |    cume_dist() OVER w AS cd,
             |    lag(value, 1) OVER w AS prev_v,
             |    lead(value, 1) OVER w AS next_v,
             |    first_value(event_id) OVER (w ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND UNBOUNDED FOLLOWING) AS lo_id,
             |    last_value(event_id) OVER (w ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND UNBOUNDED FOLLOWING) AS hi_id
             |  FROM events
             |  WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id))
             |SELECT * FROM x WHERE value > 99.5
             |ORDER BY event_type, event_id""".stripMargin)),

    // ---- edit-distance fuzzy matching within blocking groups: the
    // record-linkage shape (block on a cheap key — brand — THEN pay
    // Levenshtein only inside blocks; all-pairs edit distance at 100 TB
    // is never on the table). Pairs via collect_set + double explode;
    // both engines share the classic Levenshtein definition ----
    QuerySpec("q103_fuzzy_match",
      (s, dir) => {
        val names = t(s, dir, "part")
          .select(col("p_brand"), col("p_name")).distinct()
        names.groupBy(col("p_brand"))
          .agg(sort_array(collect_set(col("p_name"))).as("ns"))
          .select(col("p_brand"), explode(col("ns")).as("n1"), col("ns"))
          .select(col("p_brand"), col("n1"), explode(col("ns")).as("n2"))
          .filter(col("n1") < col("n2"))
          .select(col("p_brand"), levenshtein(col("n1"), col("n2")).as("d"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_pairs"), min(col("d")).as("min_d"),
            sum(when(col("d") <= 10, 1L).otherwise(0L)).as("n_close"))
          .orderBy(col("p_brand"))
      },
      Some("""WITH n AS (SELECT DISTINCT p_brand, p_name FROM part),
             |p AS (
             |  SELECT a.p_brand, levenshtein(a.p_name, b.p_name) AS d
             |  FROM n a JOIN n b
             |    ON a.p_brand = b.p_brand AND a.p_name < b.p_name)
             |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_pairs,
             |  CAST(min(d) AS INT) AS min_d,
             |  CAST(sum(CASE WHEN d <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_close
             |FROM p GROUP BY 1 ORDER BY p_brand""".stripMargin)),

    // ---- set operations: INTERSECT (clicked AND purchased) and
    // EXCEPT (clicked, never purchased) with SQL's distinct-set
    // semantics — each plans as one hash-partitioned distinct +
    // co-partitioned semi/anti match, no sort. id-sums pin exact
    // membership of both result sets ----
    QuerySpec("q104_set_ops",
      (s, dir) => {
        val ev = t(s, dir, "events")
        def users(et: String) =
          ev.filter(col("event_type") === et && col("value") > 99)
            .select(col("user_id"))
        val both = users("click").intersect(users("purchase"))
        val only = users("click").except(users("purchase"))
        // coalesce: sum over an EMPTY set is NULL in both engines, and
        // a NULL in a sort key crashes the compare harness's row sort
        // (None < int) — taking the whole round's report down with it
        def summary(df: org.apache.spark.sql.DataFrame, op: String) =
          df.agg(count(lit(1)).as("n"),
              coalesce(sum(col("user_id")), lit(0L)).as("id_sum"))
            .withColumn("set_op", lit(op))
        summary(both, "intersect")
          .unionByName(summary(only, "except"))
          .select(col("set_op"), col("n"), col("id_sum"))
          .orderBy(col("set_op"))
      },
      Some("""WITH i AS (
             |  SELECT user_id FROM events WHERE event_type = 'click' AND value > 99
             |  INTERSECT
             |  SELECT user_id FROM events
             |  WHERE event_type = 'purchase' AND value > 99),
             |e AS (
             |  SELECT user_id FROM events WHERE event_type = 'click' AND value > 99
             |  EXCEPT
             |  SELECT user_id FROM events
             |  WHERE event_type = 'purchase' AND value > 99)
             |SELECT 'except' AS set_op, CAST(count(*) AS BIGINT) AS n,
             |  CAST(COALESCE(sum(user_id), 0) AS BIGINT) AS id_sum FROM e
             |UNION ALL
             |SELECT 'intersect' AS set_op, CAST(count(*) AS BIGINT) AS n,
             |  CAST(COALESCE(sum(user_id), 0) AS BIGINT) AS id_sum FROM i
             |ORDER BY set_op""".stripMargin)),

    // ---- time-series gap fill + forward fill: regularize an irregular
    // event stream onto a daily spine (sequence + explode — the spine
    // is |keys| × |days| rows, generated, never shuffled) and carry the
    // last observation forward with last(ignoreNulls) over ROWS
    // UNBOUNDED PRECEDING..CURRENT. One shuffle on user_id serves the
    // left join and the fill window; the span row is broadcast ----
    QuerySpec("q105_gap_fill",
      (s, dir) => {
        // daily is (user × day)-sized and feeds THREE consumers (span,
        // spine, the fill join) — localCheckpoint so the event-stream
        // fold runs once, not per reference
        val daily = t(s, dir, "events")
          .filter(col("user_id") < 40)
          .groupBy(col("user_id"), to_date(col("ts")).as("d"))
          .agg((sum(floor(col("value") * 100)) / 100.0).as("day_v"))
          .localCheckpoint()
        val span = daily.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
        val spine = daily.select(col("user_id")).distinct()
          .crossJoin(broadcast(span))
          .select(col("user_id"),
            explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("d"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(daily, Seq("user_id", "d"), "left")
          .select(col("user_id"), col("d"),
            round(coalesce(last(col("day_v"), ignoreNulls = true).over(w), lit(0.0)), 2)
              .as("filled_v"),
            when(col("day_v").isNull, 1).otherwise(0).as("gap"))
          .orderBy(col("user_id"), col("d"))
      },
      Some("""WITH daily AS (
             |  SELECT user_id, CAST(ts AS DATE) AS d,
             |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE)
             |      / 100.0 AS day_v
             |  FROM events WHERE user_id < 40 GROUP BY 1, 2),
             |span AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
             |spine AS (
             |  SELECT u.user_id,
             |    CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
             |  FROM (SELECT DISTINCT user_id FROM daily) u, span)
             |SELECT s.user_id, s.d,
             |  round(COALESCE(last_value(day_v IGNORE NULLS) OVER (
             |    PARTITION BY s.user_id ORDER BY s.d
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0), 2) AS filled_v,
             |  CAST(CASE WHEN day_v IS NULL THEN 1 ELSE 0 END AS INT) AS gap
             |FROM spine s LEFT JOIN daily ON s.user_id = daily.user_id AND s.d = daily.d
             |ORDER BY s.user_id, s.d""".stripMargin)),

    // ---- unpivot (wide→long melt) + per-column profile: the schema-
    // drift / data-quality scan. Dataset.unpivot multiplies rows by
    // |value columns| at the SCAN (no shuffle — struct explode inside
    // codegen), then one hash aggregate profiles every column in a
    // single pass. Sums are integer cents (exact under any partition
    // order — a 60k-double sum reordered across engines can flip a
    // cent at round(,2)) ----
    QuerySpec("q106_unpivot_profile",
      (s, dir) => {
        t(s, dir, "lineitem")
          .unpivot(
            Array.empty[org.apache.spark.sql.Column],
            Array(col("l_quantity"), col("l_extendedprice"),
              col("l_discount"), col("l_tax")),
            "col_name", "val")
          .groupBy(col("col_name"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("val")).as("n_distinct"),
            min(col("val")).as("min_v"), max(col("val")).as("max_v"),
            sum(round(col("val") * 100).cast("long")).as("cents"))
          .orderBy(col("col_name"))
      },
      Some("""WITH long AS (
             |  SELECT 'l_quantity' AS col_name, l_quantity AS val FROM lineitem
             |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
             |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
             |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
             |SELECT col_name, CAST(count(*) AS BIGINT) AS n,
             |  CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
             |  min(val) AS min_v, max(val) AS max_v,
             |  CAST(sum(CAST(round(val * 100) AS BIGINT)) AS BIGINT) AS cents
             |FROM long GROUP BY 1 ORDER BY col_name""".stripMargin)),

    // ---- triangle counting on the co-purchase graph (same bounded
    // edge derivation as q97): orient every edge low→high id so each
    // triangle is emitted exactly once as a<b<c — two equi-joins, no
    // distinct, no double counting. At corpus scale the orientation
    // would be by DEGREE (the classic wedge-bound: Σ d(v)² work
    // becomes Σ m^1.5) and the edge list materialized once instead of
    // re-derived per join branch ----
    QuerySpec("q107_triangles",
      (s, dir) => {
        val edges = coPurchaseEdges(s, dir)
          .localCheckpoint() // materialize once: three join branches reuse it
        val tri = edges.as("e1")
          .join(edges.as("e2"), col("e1.v") === col("e2.u"))
          .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
          .join(edges.as("e3"), col("a") === col("e3.u") && col("c") === col("e3.v"))
          .select(col("a"), col("b"), col("c"))
        tri.select(explode(array(col("a"), col("b"), col("c"))).as("user_id"))
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_tri"))
          .orderBy(col("n_tri").desc, col("user_id"))
      },
      Some(s"""WITH $CoPurchaseEdgeCtes,
             |tri AS (
             |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
             |  FROM e0 e1 JOIN e0 e2 ON e1.v = e2.u
             |            JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v),
             |m AS (SELECT a AS user_id FROM tri
             |  UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_tri
             |FROM m GROUP BY 1 ORDER BY n_tri DESC, user_id""".stripMargin)),

    // ---- GROUPING SETS beyond rollup/cube (q64/q73): two DISJOINT
    // grouping sets in one pass — Catalyst plans a single Expand (2×
    // row multiplier, exactly |sets|) feeding one hash aggregate, vs
    // two scans + a union. Portability: per-column grouping() flags
    // (0/1) instead of grouping_id(), whose BIT ORDER is engine-
    // specific; sums as integer cents ----
    QuerySpec("q108_grouping_sets",
      (s, dir) => {
        t(s, dir, "orders")
          .groupingSets(
            Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(grouping(col("o_orderstatus")).cast("int").as("g_status"),
            grouping(col("o_orderpriority")).cast("int").as("g_prio"),
            count(lit(1)).as("n"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
          .orderBy(col("g_status"), col("g_prio"),
            col("o_orderstatus"), col("o_orderpriority"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
             |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
             |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin)),

    // ---- second-moment statistical aggregates: stddev/var/corr/covar
    // (sample forms — their definitions are engine-invariant, unlike
    // skewness/kurtosis whose population-vs-sample conventions differ).
    // All four ride ONE partial-aggregable pass (Catalyst merges the
    // (n, Σx, Σx², Σxy) buffers map-side), so the shuffle carries 5
    // fixed-width rows per group — the 100 TB shape for corpus-level
    // feature/label screens ----
    QuerySpec("q109_stat_moments",
      (s, dir) => {
        t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            stddev_samp(col("value")).as("sd_v"),
            var_samp(col("value")).as("var_v"),
            corr(col("value"), col("user_id").cast("double")).as("corr_vu"),
            covar_samp(col("value"), col("user_id").cast("double")).as("cov_vu"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  stddev_samp(value) AS sd_v, var_samp(value) AS var_v,
             |  corr(value, CAST(user_id AS DOUBLE)) AS corr_vu,
             |  covar_samp(value, CAST(user_id AS DOUBLE)) AS cov_vu
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // ---- top-k WITH TIES (rank, not row_number): every day tied with
    // the k-th busiest day is kept, so the answer is deterministic
    // without inventing a tiebreak — the semantics dashboards usually
    // mean by "top 3". Integer counts make ties real (the gate input
    // has a genuine two-way rank-1 tie). Plans as one shuffle +
    // WindowGroupLimit pushdown: partitions discard rows past rank k
    // BEFORE the sort completes ----
    QuerySpec("q110_topk_ties",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("n").desc)
        daily.withColumn("rk", rank().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .orderBy(col("event_type"), col("rk"), col("d"))
      },
      Some("""WITH d AS (
             |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1, 2),
             |r AS (
             |  SELECT event_type, d, n,
             |    CAST(rank() OVER (PARTITION BY event_type ORDER BY n DESC) AS BIGINT) AS rk
             |  FROM d)
             |SELECT event_type, d, n, rk FROM r WHERE rk <= 3
             |ORDER BY event_type, rk, d""".stripMargin)),

    // ---- share-of-total (ratio_to_report): each day's fraction of its
    // type's revenue via an unbounded analytic sum sharing the groupBy
    // shuffle. Bit-portability by construction: numerator and
    // denominator are EXACT integer cents, and long→double IEEE
    // division is deterministic across engines — a double-sum
    // denominator would differ in the last ulp by partition order ----
    QuerySpec("q111_share_of_total",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("d"))
          .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
        val w = Window.partitionBy(col("event_type"))
        daily.withColumn("total", sum(col("cents")).over(w))
          .filter(col("d") <= lit(java.sql.Date.valueOf("2024-01-05")))
          .select(col("event_type"), col("d"), col("cents"),
            (col("cents").cast("double") / col("total").cast("double")).as("share"))
          .orderBy(col("event_type"), col("d"))
      },
      Some("""WITH d AS (
             |  SELECT event_type, CAST(ts AS DATE) AS d,
             |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
             |  FROM events GROUP BY 1, 2),
             |t AS (
             |  SELECT event_type, d, cents,
             |    CAST(sum(cents) OVER (PARTITION BY event_type) AS BIGINT) AS total
             |  FROM d)
             |SELECT event_type, d, cents,
             |  CAST(cents AS DOUBLE) / CAST(total AS DOUBLE) AS share
             |FROM t WHERE d <= DATE '2024-01-05'
             |ORDER BY event_type, d""".stripMargin)),

    // ---- null semantics, pinned: NULL group keys collapse to one
    // group and null-safe equality (<=>/IS NOT DISTINCT FROM) matches
    // the NULL buckets a plain `=` would drop from the full outer
    // join. The nulls stay INTERNAL — the output key coalesces to -1
    // because the hash gate (like most sinks) can't order rows on a
    // nullable key. floor() before the int cast: DuckDB's double→int
    // cast rounds, Spark's truncates ----
    QuerySpec("q114_null_semantics",
      (s, dir) => {
        val x = t(s, dir, "events")
          .filter(col("user_id").isin(7, 8))
          .select(col("user_id"),
            // FLOOR division in double space on BOTH engines: the old
            // floor-then-divide-then-cast truncated toward zero in
            // Spark while the oracle's BIGINT // floored — divergent
            // for any negative value (latent on the non-negative
            // fixture, a trap for the next data regen)
            when(col("value") > 99.9, lit(null))
              .otherwise(floor(col("value") / 10).cast("long")).as("bucket"))
        def side(u: Int, as: String) = x.filter(col("user_id") === u)
          .groupBy(col("bucket").as(s"b$u"))
          .agg(count(lit(1)).as(as))
        side(7, "n7").join(side(8, "n8"),
            col("b7") <=> col("b8"), "full_outer")
          .select(coalesce(col("b7"), col("b8"), lit(-1L)).as("bucket"),
            coalesce(col("n7"), lit(0L)).as("n7"),
            coalesce(col("n8"), lit(0L)).as("n8"))
          .orderBy(col("bucket"))
      },
      Some("""WITH x AS (
             |  SELECT user_id,
             |    CASE WHEN value > 99.9 THEN NULL
             |         ELSE CAST(floor(value / 10) AS BIGINT) END AS bucket
             |  FROM events WHERE user_id IN (7, 8)),
             |a AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n7
             |      FROM x WHERE user_id = 7 GROUP BY 1),
             |b AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n8
             |      FROM x WHERE user_id = 8 GROUP BY 1)
             |SELECT COALESCE(a.bucket, b.bucket, -1) AS bucket,
             |  COALESCE(n7, 0) AS n7, COALESCE(n8, 0) AS n8
             |FROM a FULL JOIN b ON a.bucket IS NOT DISTINCT FROM b.bucket
             |ORDER BY bucket""".stripMargin)),

    // ---- hierarchy flattening (BOM/org-chart class): every node's
    // depth, root, and ancestor-path sum over a synthetic binary tree
    // (parent = id div 2; the TREE is synthetic, the OPERATOR isn't).
    // Spark has no recursive CTE — the iterative walk is the engine
    // shape: 16 fixed left-join rounds (covers depth ≤ 16, ids < 2^16;
    // already-rooted rows pass through unchanged), all 16 chained in
    // ONE lazy plan. The per-round localCheckpoint the loop used to
    // carry was paying 16 EAGER materialization jobs for a plan-size
    // problem this loop does not have: the walk references the
    // previous round exactly once (no self-join, unlike q33's label
    // propagation), so the plan grows LINEARLY — 16 broadcast joins of
    // the checkpointed edge leaf, planned and run as one job
    // (measured: 1.84 s → ~0.6 s at sf0.1; at scale it removes 15
    // full materializations of the corpus-sized walk table). The
    // O(log d) production form is graft.operators.Hierarchy.flatten
    // (pointer doubling; HierarchySpec pins it to this walk's
    // semantics) ----
    QuerySpec("q115_hierarchy",
      (s, dir) => {
        val nodes = t(s, dir, "events").select(col("user_id").as("id")).distinct()
        val edges = nodes.filter(col("id") >= 1)
          .select(col("id").as("e_id"), (col("id") / 2).cast("long").as("parent"))
          .localCheckpoint()
        var walk = nodes.select(col("id"), col("id").as("cur"),
          lit(0L).as("depth"), col("id").as("path_sum"))
        (0 until 16).foreach { _ =>
          walk = walk.join(edges, col("cur") === col("e_id"), "left")
            .select(col("id"),
              coalesce(col("parent"), col("cur")).as("cur"),
              (col("depth") + when(col("parent").isNotNull, 1L).otherwise(0L))
                .as("depth"),
              (col("path_sum") + coalesce(col("parent"), lit(0L))).as("path_sum"))
        }
        walk.groupBy(col("depth"))
          .agg(count(lit(1)).as("n"), sum(col("cur")).as("root_sum"),
            sum(col("path_sum")).as("psum"))
          .orderBy(col("depth"))
      },
      Some("""WITH RECURSIVE nodes AS (
             |  SELECT DISTINCT user_id AS id FROM events),
             |edges AS (
             |  SELECT id, id // 2 AS parent FROM nodes WHERE id >= 1),
             |walk AS (
             |  SELECT id, id AS cur, CAST(0 AS BIGINT) AS depth, id AS path_sum
             |  FROM nodes
             |  UNION ALL
             |  SELECT w.id, e.parent, w.depth + 1, w.path_sum + e.parent
             |  FROM walk w JOIN edges e ON w.cur = e.id),
             |final AS (
             |  SELECT id, max(depth) AS depth,
             |    CAST(max_by(cur, depth) AS BIGINT) AS root,
             |    max_by(path_sum, depth) AS path_sum
             |  FROM walk GROUP BY id)
             |SELECT CAST(depth AS BIGINT) AS depth, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(root) AS BIGINT) AS root_sum,
             |  CAST(sum(path_sum) AS BIGINT) AS psum
             |FROM final GROUP BY 1 ORDER BY depth""".stripMargin)),

    // ---- value-based RANGE frames (q102's twin covered ROWS frames):
    // the frame edge is an ORDER-VALUE offset, not a row count — peers
    // (order-by ties) enter the frame together by definition on both
    // engines, which is exactly what makes this portable where a ROWS
    // spelling of the same window would be tie-order-dependent.
    // Integer order key + integer cents: no float boundary ambiguity.
    // Still ONE shuffle on the partition key for both frames ----
    QuerySpec("q117_range_frames",
      (s, dir) => {
        val x = t(s, dir, "events")
          .filter(col("user_id") < 5)
          .select(col("event_id"), col("event_type"),
            floor(col("value")).cast("long").as("v"),
            round(col("value") * 100).cast("long").as("cents"))
        val wTrail = Window.partitionBy(col("event_type")).orderBy(col("v"))
          .rangeBetween(-5, Window.currentRow)
        val wSym = Window.partitionBy(col("event_type")).orderBy(col("v"))
          .rangeBetween(-5, 5)
        x.select(col("event_id"), col("event_type"), col("v"),
            sum(col("cents")).over(wTrail).as("near_sum"),
            count(lit(1)).over(wSym).as("near_n"))
          .orderBy(col("event_type"), col("v"), col("event_id"))
      },
      Some("""WITH x AS (
             |  SELECT event_id, event_type, CAST(floor(value) AS BIGINT) AS v,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events WHERE user_id < 5)
             |SELECT event_id, event_type, v,
             |  CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY v
             |    RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS near_sum,
             |  CAST(count(*) OVER (PARTITION BY event_type ORDER BY v
             |    RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS BIGINT) AS near_n
             |FROM x ORDER BY event_type, v, event_id""".stripMargin)),

    // ---- pointer-doubling hierarchy at DEPTH — the gate q115 can't
    // provide. q115's sequential walk covers depth <= 16; this plants
    // a 199-deep chain (ids < 200, parent = id-1) grafted onto a
    // halving tree (ids >= 200, parent = id div 2, which funnels into
    // the chain), all derived in-plan from events, and flattens it
    // with graft.operators.Hierarchy.flatten at maxDepth=256: 8
    // self-join rounds where the walk form would need ~208. The
    // recursive-CTE oracle is exact at any depth, so a hash match
    // here pins the O(log d) composition algebra (ancestor, hops,
    // path-sum monoid) — not just its O(d) twin. Per-node output
    // (400 rows), the strongest gate shape for it ----
    QuerySpec("q118_hierarchy_doubling",
      (s, dir) => {
        val nodes = t(s, dir, "events")
          .select(pmod(col("event_id"), lit(400)).cast("long").as("id"))
          .distinct()
        val edges = nodes.filter(col("id") >= 1)
          .select(col("id"),
            when(col("id") < 200, col("id") - 1)
              .otherwise((col("id") / 2).cast("long")).as("parent"))
        graft.operators.Hierarchy.flatten(nodes, edges, maxDepth = 256)
          .orderBy(col("id"))
      },
      Some("""WITH RECURSIVE nodes AS (
             |  SELECT DISTINCT CAST(event_id % 400 AS BIGINT) AS id FROM events),
             |edges AS (
             |  SELECT id, CASE WHEN id < 200 THEN id - 1 ELSE id // 2 END AS parent
             |  FROM nodes WHERE id >= 1),
             |walk AS (
             |  SELECT id, id AS cur, CAST(0 AS BIGINT) AS depth,
             |    CAST(0 AS BIGINT) AS anc_sum
             |  FROM nodes
             |  UNION ALL
             |  SELECT w.id, e.parent, w.depth + 1, w.anc_sum + e.parent
             |  FROM walk w JOIN edges e ON w.cur = e.id),
             |final AS (
             |  SELECT id, CAST(max(depth) AS BIGINT) AS depth,
             |    CAST(max_by(cur, depth) AS BIGINT) AS root,
             |    CAST(max_by(anc_sum, depth) AS BIGINT) AS anc_sum
             |  FROM walk GROUP BY id)
             |SELECT id, root, depth, CAST(id + anc_sum AS BIGINT) AS path_sum
             |FROM final ORDER BY id""".stripMargin)),

    // ---- CDC changelog apply: events as a keyed changelog (error =
    // tombstone, anything else = upsert, (ts, event_id) = total order)
    // folded onto the customer snapshot, latest-wins. ONE hash shuffle
    // with map-side partial max_by — no per-key window sort (the
    // oracle uses one; the engine must not). Exercises all four CDC
    // paths: untouched base row, update-over-base, delete-from-base,
    // and insert of a key base never had (user 0). Payload doubles
    // pass through unchanged (no arithmetic), so the hash gate is
    // byte-exact ----
    QuerySpec("q119_cdc_apply",
      (s, dir) => {
        val base = t(s, dir, "customer")
          .select(col("c_custkey").as("key"), col("c_acctbal").as("bal"))
        val changes = t(s, dir, "events")
          .select(col("user_id").as("key"),
            graft.operators.ChangelogApply
              .opFrom(col("event_type") === "error").as("op"),
            col("value").as("bal"), col("ts"), col("event_id"))
        graft.operators.ChangelogApply(
            base, changes, Seq("key"), Seq("ts", "event_id"), "op")
          .orderBy(col("key"))
      },
      Some("""WITH ch AS (
             |  SELECT user_id AS key,
             |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             |    value AS bal, ts, event_id
             |  FROM events),
             |latest AS (
             |  SELECT key, op, bal FROM (
             |    SELECT key, op, bal,
             |      row_number() OVER (PARTITION BY key
             |        ORDER BY ts DESC, event_id DESC) AS rn
             |    FROM ch) WHERE rn = 1),
             |b AS (SELECT c_custkey AS key, c_acctbal AS bal FROM customer)
             |SELECT COALESCE(l.key, b.key) AS key,
             |  CASE WHEN l.key IS NOT NULL THEN l.bal ELSE b.bal END AS bal,
             |  CASE WHEN l.key IS NOT NULL THEN 'cdc' ELSE 'base' END AS src
             |FROM b FULL OUTER JOIN latest l ON b.key = l.key
             |WHERE l.op IS NULL OR l.op <> 'D'
             |ORDER BY key""".stripMargin)),

    // ---- quantile sketch, exact regime: k = 4096 exceeds every
    // event_type group (~2k values at sf0.01), so the compactor
    // ladder never fires under ANY partitioning and the summary IS
    // the sorted value set — quantile(q) = the ⌈q·n⌉-th order
    // statistic, hash-gated against explicit rank selection (same
    // IEEE q·n product on both engines, so the ceiling is
    // decision-identical). Values in integer cents; selection only,
    // no arithmetic. QuantileSketchSpec carries the compacting
    // regime (weight conservation + rank-error envelope), which no
    // SQL oracle can express ----
    QuerySpec("q120_quantile_sketch",
      (s, dir) => {
        val qs = Seq(0.25, 0.5, 0.75, 0.9)
        val agg = graft.functions.QuantileSketch.quantiles(
          col("c"), k = 4096, qs)
        t(s, dir, "events")
          .select(col("event_type"),
            round(col("value") * 100).cast("long").cast("double").as("c"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), agg.as("qv"))
          .select(col("event_type"), col("n"),
            element_at(col("qv"), 1).cast("long").as("p25"),
            element_at(col("qv"), 2).cast("long").as("p50"),
            element_at(col("qv"), 3).cast("long").as("p75"),
            element_at(col("qv"), 4).cast("long").as("p90"))
          .orderBy(col("event_type"))
      },
      Some("""WITH x AS (
             |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events),
             |r AS (
             |  SELECT event_type, c,
             |    row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM x)
             |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             |  CAST(max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
             |    THEN c END) AS BIGINT) AS p25,
             |  CAST(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
             |    THEN c END) AS BIGINT) AS p50,
             |  CAST(max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
             |    THEN c END) AS BIGINT) AS p75,
             |  CAST(max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
             |    THEN c END) AS BIGINT) AS p90
             |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- declarative data-quality audit (the Deequ/expectations
    // staple): 8 rules over 3 tables — not-null, uniqueness, range,
    // predicate caps, and two foreign keys. Scale shape: all scalar
    // rules per table fold into ONE conditional-aggregation scan
    // (adding a rule adds a column, not a job); each FK is one LEFT
    // join against the distinct parent keys, broadcast by AQE at
    // dimension size. The price/discount caps are deliberately
    // violated by the data so the gate pins nonzero counts ----
    QuerySpec("q123_quality_audit",
      (s, dir) => {
        import graft.operators.DataAudit, DataAudit._
        val orders = t(s, dir, "orders")
        val lineitem = t(s, dir, "lineitem")
        val customer = t(s, dir, "customer")
        DataAudit.audit(orders, Seq(
            NotNull("orders_custkey_notnull", Seq("o_custkey")),
            Satisfies("orders_price_cap", col("o_totalprice") <= 250000.0),
            RefIntegrity("orders_custkey_fk", "o_custkey",
              customer, "c_custkey")))
          .unionByName(DataAudit.audit(lineitem, Seq(
            inRange("lineitem_qty_range", "l_quantity", lit(1.0), lit(50.0)),
            Satisfies("lineitem_discount_cap", col("l_discount") <= 0.05),
            RefIntegrity("lineitem_orderkey_fk", "l_orderkey",
              orders, "o_orderkey"))))
          .unionByName(DataAudit.audit(customer, Seq(
            Unique("customer_key_unique", "c_custkey"),
            NotNull("customer_name_notnull", Seq("c_name")))))
          .orderBy(col("rule"))
      },
      Some("""SELECT * FROM (
             |  SELECT 'orders_custkey_notnull' AS rule,
             |    CAST(count(*) AS BIGINT) AS checked,
             |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS violations
             |  FROM orders
             |  UNION ALL
             |  SELECT 'orders_price_cap', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN NOT coalesce(o_totalprice <= 250000.0,
             |      false) THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM orders
             |  UNION ALL
             |  SELECT 'orders_custkey_fk', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM (SELECT c.c_custkey AS pk FROM orders o
             |        LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             |          ON o.o_custkey = c.c_custkey
             |        WHERE o.o_custkey IS NOT NULL)
             |  UNION ALL
             |  SELECT 'lineitem_qty_range', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN NOT coalesce(l_quantity IS NOT NULL
             |      AND l_quantity >= 1.0 AND l_quantity <= 50.0, false)
             |      THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'lineitem_discount_cap', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN NOT coalesce(l_discount <= 0.05, false)
             |      THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'lineitem_orderkey_fk', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM (SELECT o.o_orderkey AS pk FROM lineitem l
             |        LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             |          ON l.l_orderkey = o.o_orderkey
             |        WHERE l.l_orderkey IS NOT NULL)
             |  UNION ALL
             |  SELECT 'customer_key_unique',
             |    CAST(count(c_custkey) AS BIGINT),
             |    CAST(count(c_custkey) - count(DISTINCT c_custkey) AS BIGINT)
             |  FROM customer
             |  UNION ALL
             |  SELECT 'customer_name_notnull', CAST(count(*) AS BIGINT),
             |    CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT)
             |  FROM customer
             |) ORDER BY rule""".stripMargin)),

    // ---- distributed global row index (curriculum ordering): dense
    // 0..n−1 positions in a total order — longest-document-first with
    // doc_id tiebreak, the "schedule the corpus" op of a training
    // pipeline. The naive formulation is a single-partition window
    // (one task sorts the world); GlobalIndex range-partitions, ranks
    // locally, and broadcast-joins control-plane-sized partition
    // offsets — same answer, no global funnel (GlobalIndexSpec pins
    // the reused-exchange plan shape) ----
    QuerySpec("q124_global_index",
      (s, dir) => graft.operators.GlobalIndex.withRowIndex(
          t(s, dir, "documents"),
          Seq(col("n_chars").desc, col("doc_id")),
          numPartitions = Some(8))
        .select(col("doc_id"), col("idx"))
        .orderBy(col("idx")),
      Some("""SELECT doc_id,
             |  CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1
             |    AS BIGINT) AS idx
             |FROM documents ORDER BY idx""".stripMargin)),

    // ---- relational MERGE: conditional matched-update ("newer value
    // wins"), matched-delete (negative balance tombstones), and
    // not-matched insert, all in ONE full-outer join plan (the Delta/
    // Iceberg MERGE INTO lowering — ChangelogApply's conditional
    // generalization). Source is derived in-plan from customer: every
    // 5th key proposes c_acctbal*2−5000 (update if larger, delete if
    // negative), every 50th key also arrives as a new +1M row ----
    QuerySpec("q127_merge",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val upd = cust.filter(pmod(col("c_custkey"), lit(5)) === 0)
          .select(col("c_custkey"), upper(col("c_name")).as("c_name"),
            col("c_nationkey"),
            (col("c_acctbal") * 2 - 5000).as("c_acctbal"),
            col("c_mktsegment"))
        val ins = cust.filter(pmod(col("c_custkey"), lit(50)) === 0)
          .select((col("c_custkey") + 1000000L).as("c_custkey"),
            concat(lit("new_"),
              (col("c_custkey") + 1000000L).cast("string")).as("c_name"),
            col("c_nationkey"), lit(999.0).as("c_acctbal"),
            col("c_mktsegment"))
        graft.operators.Merge.merge(cust, upd.unionByName(ins),
            Seq("c_custkey"),
            whenMatchedDelete = Some(col("s.c_acctbal") < 0),
            whenMatchedUpdate = Some(col("s.c_acctbal") > col("t.c_acctbal")),
            whenNotMatchedInsert = Some(lit(true)))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH src AS (
             |  SELECT c_custkey, upper(c_name) AS c_name, c_nationkey,
             |         c_acctbal * 2 - 5000 AS c_acctbal, c_mktsegment
             |  FROM customer WHERE c_custkey % 5 = 0
             |  UNION ALL
             |  SELECT c_custkey + 1000000,
             |         'new_' || CAST(c_custkey + 1000000 AS VARCHAR),
             |         c_nationkey, 999.0, c_mktsegment
             |  FROM customer WHERE c_custkey % 50 = 0),
             |j AS (
             |  SELECT t.c_custkey AS tk, s.c_custkey AS sk,
             |    t.c_name AS tn, s.c_name AS sn,
             |    t.c_nationkey AS tnat, s.c_nationkey AS snat,
             |    t.c_acctbal AS tb, s.c_acctbal AS sb,
             |    t.c_mktsegment AS tm, s.c_mktsegment AS sm
             |  FROM customer t FULL OUTER JOIN src s
             |    ON t.c_custkey = s.c_custkey)
             |SELECT coalesce(tk, sk) AS c_custkey,
             |  CASE WHEN (tk IS NOT NULL AND sk IS NOT NULL
             |              AND coalesce(sb > tb, false)) OR tk IS NULL
             |       THEN sn ELSE tn END AS c_name,
             |  CASE WHEN (tk IS NOT NULL AND sk IS NOT NULL
             |              AND coalesce(sb > tb, false)) OR tk IS NULL
             |       THEN snat ELSE tnat END AS c_nationkey,
             |  CASE WHEN (tk IS NOT NULL AND sk IS NOT NULL
             |              AND coalesce(sb > tb, false)) OR tk IS NULL
             |       THEN sb ELSE tb END AS c_acctbal,
             |  CASE WHEN (tk IS NOT NULL AND sk IS NOT NULL
             |              AND coalesce(sb > tb, false)) OR tk IS NULL
             |       THEN sm ELSE tm END AS c_mktsegment
             |FROM j
             |WHERE NOT (tk IS NOT NULL AND sk IS NOT NULL
             |           AND coalesce(sb < 0, false))
             |ORDER BY c_custkey""".stripMargin)),

    // ---- keyed snapshot reconciliation: the validation twin of the
    // CDC family — added/removed/changed classification with exact
    // changed-column attribution, one null-safe full-outer join,
    // unchanged rows filtered before anything widens. The bucket-digest
    // tier (compare control-plane-sized per-bucket XOR digests first,
    // drill only mismatched buckets) is spec-pinned in TableDiffSpec —
    // xxhash64 digests are not oracle-expressible. Right side derived
    // in-plan: %13 keys removed, %7 balances bumped, %11 segments
    // altered, %41 keys re-added at +1M ----
    QuerySpec("q128_table_diff",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val right = cust
          .filter(pmod(col("c_custkey"), lit(13)) =!= 0)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            when(pmod(col("c_custkey"), lit(7)) === 0,
              col("c_acctbal") + 10.0).otherwise(col("c_acctbal"))
              .as("c_acctbal"),
            when(pmod(col("c_custkey"), lit(11)) === 0, lit("ALTERED"))
              .otherwise(col("c_mktsegment")).as("c_mktsegment"))
          .unionByName(cust.filter(pmod(col("c_custkey"), lit(41)) === 0)
            .select((col("c_custkey") + 1000000L).as("c_custkey"),
              col("c_name"), col("c_nationkey"), col("c_acctbal"),
              col("c_mktsegment")))
        graft.operators.TableDiff.diff(cust, right, Seq("c_custkey"))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH r AS (
             |  SELECT c_custkey, c_name, c_nationkey,
             |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10.0
             |         ELSE c_acctbal END AS c_acctbal,
             |    CASE WHEN c_custkey % 11 = 0 THEN 'ALTERED'
             |         ELSE c_mktsegment END AS c_mktsegment
             |  FROM customer WHERE c_custkey % 13 <> 0
             |  UNION ALL
             |  SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal,
             |    c_mktsegment
             |  FROM customer WHERE c_custkey % 41 = 0),
             |j AS (
             |  SELECT l.c_custkey AS lk, r.c_custkey AS rk,
             |    l.c_name AS ln, r.c_name AS rn,
             |    l.c_nationkey AS lnat, r.c_nationkey AS rnat,
             |    l.c_acctbal AS lb, r.c_acctbal AS rb,
             |    l.c_mktsegment AS lm, r.c_mktsegment AS rm
             |  FROM customer l FULL OUTER JOIN r
             |    ON l.c_custkey = r.c_custkey)
             |SELECT coalesce(lk, rk) AS c_custkey,
             |  CASE WHEN rk IS NULL THEN 'removed'
             |       WHEN lk IS NULL THEN 'added'
             |       ELSE 'changed' END AS status,
             |  CASE WHEN lk IS NOT NULL AND rk IS NOT NULL THEN
             |    concat_ws(',',
             |      CASE WHEN ln IS DISTINCT FROM rn THEN 'c_name' END,
             |      CASE WHEN lnat IS DISTINCT FROM rnat THEN 'c_nationkey' END,
             |      CASE WHEN lb IS DISTINCT FROM rb THEN 'c_acctbal' END,
             |      CASE WHEN lm IS DISTINCT FROM rm THEN 'c_mktsegment' END)
             |  ELSE '' END AS changed_cols
             |FROM j
             |WHERE (lk IS NULL) <> (rk IS NULL)
             |   OR (lk IS NOT NULL AND rk IS NOT NULL AND (
             |        ln IS DISTINCT FROM rn OR lnat IS DISTINCT FROM rnat
             |        OR lb IS DISTINCT FROM rb OR lm IS DISTINCT FROM rm))
             |ORDER BY c_custkey""".stripMargin)),

    // ---- quantile-sketch state lifecycle (the percentile twin of
    // q125): per-(event_type, day) ladder STATES stored, then merged
    // per type for p50/p90 — the pre-aggregated-slices shape where a
    // year of percentiles is answered from 365 state rows, not a
    // rescan. Exact regime: k=4096 ≥ the merged group size, so merge
    // only concatenates level 0 and the quantiles ARE the exact
    // ⌈q·n⌉ order statistics q120 pins; the compacting regime's
    // rank-error envelope lives in QuantileSketchSpec ----
    QuerySpec("q129_quantile_states",
      (s, dir) => {
        val qs = Seq(0.5, 0.9)
        val daily = t(s, dir, "events")
          .select(col("event_type"), to_date(col("ts")).as("d"),
            round(col("value") * 100).cast("long").cast("double").as("c"))
          .groupBy(col("event_type"), col("d"))
          .agg(
            graft.functions.QuantileSketch.sketchState(col("c"), k = 4096)
              .as("st"),
            count(lit(1)).as("dn"))
        daily.groupBy(col("event_type"))
          .agg(sum(col("dn")).cast("long").as("n"),
            graft.functions.QuantileSketch.mergeQuantiles(col("st"), 4096, qs)
              .as("qv"))
          .select(col("event_type"), col("n"),
            element_at(col("qv"), 1).cast("long").as("p50"),
            element_at(col("qv"), 2).cast("long").as("p90"))
          .orderBy(col("event_type"))
      },
      Some("""WITH x AS (
             |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events),
             |r AS (
             |  SELECT event_type, c,
             |    row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM x)
             |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             |  CAST(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
             |    THEN c END) AS BIGINT) AS p50,
             |  CAST(max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
             |    THEN c END) AS BIGINT) AS p90
             |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- per-type Spearman rank correlation of value vs time (metric
    // drift that survives outliers): tie-broken integer ranks make
    // both rank columns permutations of 1..n, so ρ = 1 − 6Σd²/(n(n²−1))
    // folds to TWO exact integer aggregates and one final double
    // divide of exact operands — bit-identical across engines, no
    // 6-decimal hedging. One shuffle carries both rank windows ----
    QuerySpec("q131_spearman",
      (s, dir) => graft.functions.Diagnostics.spearman(
          t(s, dir, "events"), col("event_type"), col("value"), col("ts"),
          col("event_id"))
        .withColumnRenamed("g", "event_type")
        .orderBy(col("event_type")),
      Some("""WITH r AS (
             |  SELECT event_type,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY value, event_id) AS rx,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY ts, event_id) AS ry
             |  FROM events),
             |a AS (SELECT event_type, count(*) AS n,
             |        CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sd2
             |      FROM r GROUP BY event_type)
             |SELECT event_type, CAST(n AS BIGINT) AS n,
             |  CASE WHEN n * (n * n - 1) = 0 THEN NULL
             |       ELSE 1.0 - 6.0 * CAST(sd2 AS DOUBLE) /
             |            CAST(n * (n * n - 1) AS DOUBLE) END AS rho
             |FROM a ORDER BY event_type""".stripMargin)),

    // ---- FORWARD as-of join with a tolerance bound ("what happened
    // within 30 minutes AFTER each click"): q47's union-carry shape
    // scanned in descending time — one exchange, one in-partition
    // sort, linear; never a range join. Matches past the gap bound
    // null out (attribution-window semantics); left rows with no
    // following view survive with null. Oracle: DuckDB ASOF LEFT
    // JOIN with the <= direction + the same CASE bound ----
    QuerySpec("q135_asof_forward",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val views = graft.operators.AsofJoin.latestPerKeyTime(
          ev.filter(col("event_type") === "view"),
          "user_id", "ts", tiebreak = "event_id", payloadCols = Seq("value"))
        graft.operators.AsofJoin.asofJoinForward(clicks, views,
            "user_id", "ts", payloadCols = Seq("value"), inner = false,
            tolerance = Some((lt, rt) =>
              rt <= lt + expr("INTERVAL 30 MINUTES")))
          .select(col("event_id"), col("user_id"), col("value"),
            col("asof_value").as("next_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH c AS (SELECT event_id, user_id, ts, value FROM events
             |      WHERE event_type = 'click'),
             |v AS (SELECT user_id, ts, max_by(value, event_id) AS value
             |      FROM events WHERE event_type = 'view' GROUP BY 1, 2)
             |SELECT c.event_id, c.user_id, c.value,
             |  CASE WHEN v.ts IS NOT NULL
             |         AND v.ts - c.ts <= INTERVAL 30 MINUTE
             |       THEN v.value END AS next_value
             |FROM c ASOF LEFT JOIN v
             |  ON c.user_id = v.user_id AND c.ts <= v.ts
             |ORDER BY event_id""".stripMargin)),

    // ---- null repair by per-group exact median (the imputation step
    // of metric/feature pipelines): every 13th event's value is nulled
    // in-plan, then repaired with its event type's rank-pick median —
    // robust to outliers AND engine-exact in integer micro-units. ONE
    // shuffle: rank, count, median pick, and the group broadcast are
    // analytic columns over the same partitioning (no join-back) ----
    QuerySpec("q136_impute_median",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            when(pmod(col("event_id"), lit(13)) === 0,
              lit(null).cast("long"))
              .otherwise(round(col("value") * 100).cast("long")).as("c"))
        graft.functions.Diagnostics.imputeGroupMedian(ev,
            col("event_type"), col("c"), col("event_id"))
          .groupBy(col("event_type"))
          .agg(
            sum(when(col("was_null"), 1L).otherwise(0L)).as("n_imputed"),
            sum(col("imputed")).as("sum_c"),
            min(col("imputed")).as("min_c"),
            max(col("imputed")).as("max_c"))
          .orderBy(col("event_type"))
      },
      Some("""WITH x AS (
             |  SELECT event_id, event_type,
             |    CASE WHEN event_id % 13 = 0 THEN NULL
             |         ELSE CAST(round(value * 100) AS BIGINT) END AS c
             |  FROM events),
             |r AS (SELECT event_type, event_id, c,
             |        row_number() OVER (PARTITION BY event_type
             |          ORDER BY (c IS NULL), c, event_id) AS rn,
             |        count(c) OVER (PARTITION BY event_type) AS cnt
             |      FROM x),
             |m AS (SELECT event_type, c,
             |        max(CASE WHEN rn = (cnt + 1) // 2 AND c IS NOT NULL
             |          THEN c END)
             |          OVER (PARTITION BY event_type) AS med
             |      FROM r)
             |SELECT event_type,
             |  CAST(sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_imputed,
             |  CAST(sum(coalesce(c, med)) AS BIGINT) AS sum_c,
             |  CAST(min(coalesce(c, med)) AS BIGINT) AS min_c,
             |  CAST(max(coalesce(c, med)) AS BIGINT) AS max_c
             |FROM m GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- time-weighted average over irregular samples (step
    // interpolation: each sample holds until its successor): value ×
    // gap and gap fold to exact integer micro-unit × microsecond
    // sums; the single final divide takes two exact integers —
    // bit-identical cross-engine. One shuffle carries the lead window
    // and the fold ----
    QuerySpec("q138_twap",
      (s, dir) => graft.functions.TimeSeries.twap(
          t(s, dir, "events").select(col("event_type"),
            round(col("value") * 100).cast("long").as("c"),
            col("ts"), col("event_id")),
          col("event_type"), col("c"), col("ts"), col("event_id"))
        .withColumnRenamed("g", "event_type")
        .orderBy(col("event_type")),
      Some("""WITH x AS (
             |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
             |    epoch_us(ts) AS t, event_id
             |  FROM events),
             |g AS (SELECT event_type, c,
             |        lead(t) OVER (PARTITION BY event_type
             |          ORDER BY t, event_id) - t AS gap
             |      FROM x),
             |a AS (SELECT event_type,
             |        CAST(sum(c * gap) AS BIGINT) AS twap_num,
             |        CAST(sum(gap) AS BIGINT) AS twap_den
             |      FROM g GROUP BY event_type)
             |SELECT event_type, twap_num, twap_den,
             |  CASE WHEN coalesce(twap_den, 0) = 0 THEN NULL
             |       ELSE CAST(twap_num AS DOUBLE) /
             |            CAST(twap_den AS DOUBLE) END AS twap
             |FROM a ORDER BY event_type""".stripMargin)),

    // ---- OHLC candlestick bars per (type, day): open/close by
    // min_by/max_by on the (ts, event_id) struct — ordinary aggregates
    // with map-side partial aggregation, NO per-bucket window sort
    // (the row_number formulation the oracle uses sorts every bucket;
    // the engine side merges candidates) ----
    QuerySpec("q139_ohlc",
      (s, dir) => graft.functions.TimeSeries.ohlc(
          t(s, dir, "events").select(col("event_type"), col("ts"),
            col("event_id"),
            round(col("value") * 100).cast("long").as("c")),
          col("event_type"), to_date(col("ts")), col("c"), col("ts"),
          col("event_id"))
        .withColumnRenamed("g", "event_type")
        .withColumnRenamed("bucket", "day")
        .orderBy(col("event_type"), col("day")),
      Some("""WITH x AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day,
             |    CAST(round(value * 100) AS BIGINT) AS c, ts, event_id
             |  FROM events),
             |r AS (SELECT event_type, day, c,
             |        row_number() OVER (PARTITION BY event_type, day
             |          ORDER BY ts, event_id) AS ra,
             |        row_number() OVER (PARTITION BY event_type, day
             |          ORDER BY ts DESC, event_id DESC) AS rd
             |      FROM x)
             |SELECT event_type, day,
             |  CAST(max(CASE WHEN ra = 1 THEN c END) AS BIGINT) AS open,
             |  CAST(max(CASE WHEN rd = 1 THEN c END) AS BIGINT) AS close,
             |  CAST(max(c) AS BIGINT) AS high,
             |  CAST(min(c) AS BIGINT) AS low,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM r GROUP BY event_type, day
             |ORDER BY event_type, day""".stripMargin)),

    // ---- CUSUM drift detection on daily volumes (pipeline-health
    // monitoring; q76's value-level twin at the series level): the
    // non-associative Page recursion computed window-only via the
    // prefix identity S_t = P_t − min(0, min P_≤t) — two cumulative
    // windows on ONE shuffle, exact integers throughout. Target =
    // per-type integer-mean daily volume; alarms where S > 20 ----
    QuerySpec("q140_cusum",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
        val base = daily.groupBy(col("event_type"))
          .agg(sum(col("x")).as("sx"), count(lit(1)).as("nd"))
          .withColumn("target", expr("sx div nd"))
          .select(col("event_type"), col("target"))
        val scored = graft.functions.TimeSeries.cusum(
          daily.join(base, Seq("event_type")),
          col("event_type"), col("day"), col("x"), col("target"))
        scored.groupBy(col("g").as("event_type"))
          .agg(
            sum(when(col("cusum") > 20, 1L).otherwise(0L)).as("n_alarms"),
            max(col("cusum")).as("max_s"),
            min(when(col("cusum") > 20, col("bucket"))).as("first_alarm"))
          .orderBy(col("event_type"))
      },
      Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |             CAST(count(*) AS BIGINT) AS x
             |           FROM events GROUP BY 1, 2),
             |k AS (SELECT event_type,
             |        CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT)
             |          AS target
             |      FROM d GROUP BY event_type),
             |p AS (SELECT d.event_type, d.day, d.x,
             |        CAST(sum(d.x - k.target) OVER (
             |          PARTITION BY d.event_type ORDER BY d.day)
             |          AS BIGINT) AS pref
             |      FROM d JOIN k USING (event_type)),
             |s AS (SELECT event_type, day,
             |        pref - least(0, min(pref) OVER (
             |          PARTITION BY event_type ORDER BY day)) AS cusum
             |      FROM p)
             |SELECT event_type,
             |  CAST(sum(CASE WHEN cusum > 20 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_alarms,
             |  CAST(max(cusum) AS BIGINT) AS max_s,
             |  min(CASE WHEN cusum > 20 THEN day END) AS first_alarm
             |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- corpus-concentration Gini per source (data-balance
    // diagnostic: is a source's character mass a few giant docs or an
    // even spread?): tie-broken integer ranks make the classic
    // estimator G = (2Σi·x − (n+1)Σx)/(n·Σx) a fold of exact integer
    // sums with ONE final divide — bit-identical cross-engine, the
    // q131/q138 discipline. One shuffle carries rank + fold ----
    QuerySpec("q141_gini",
      (s, dir) => graft.functions.Diagnostics.gini(
          t(s, dir, "documents"), col("source"), col("n_chars"),
          col("doc_id"))
        .withColumnRenamed("g", "source")
        .orderBy(col("source")),
      Some("""WITH r AS (
             |  SELECT source, n_chars,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY n_chars, doc_id) AS i
             |  FROM documents),
             |a AS (SELECT source, count(*) AS n,
             |        CAST(sum(n_chars) AS BIGINT) AS s,
             |        CAST(sum(i * n_chars) AS BIGINT) AS w
             |      FROM r GROUP BY source)
             |SELECT source, CAST(n AS BIGINT) AS n,
             |  CASE WHEN n * s = 0 THEN NULL
             |       ELSE CAST(2 * w - (n + 1) * s AS DOUBLE) /
             |            CAST(n * s AS DOUBLE) END AS gini
             |FROM a ORDER BY source""".stripMargin)),

    // ---- CEP first-match pattern (MATCH_RECOGNIZE-lite): per user,
    // view → purchase within 12h with NO error strictly between —
    // q68's funnel binds counts; this binds the MATCHED PAIR and
    // enforces the negative guard. Composed from two forward as-of
    // passes (earliest B in window, earliest C) + a row-local verdict:
    // linear, no pair-space join, no state machine. The 12h window
    // exercises all three paths at this SF (matched / no-B /
    // guard-blocked) ----
    QuerySpec("q142_cep_pattern",
      (s, dir) => graft.operators.EventPattern.firstMatch(
          t(s, dir, "events"), "user_id", "ts", "event_id", "event_type",
          aType = "view", bType = "purchase", guardType = "error",
          within = expr("INTERVAL 12 HOURS"))
        .select(col("a_id"), col("user_id"),
          when(col("matched"), col("b_id")).as("b_match"), col("matched"))
        .orderBy(col("a_id")),
      Some("""WITH v AS (SELECT event_id AS a_id, user_id, ts
             |           FROM events WHERE event_type = 'view'),
             |p AS (SELECT user_id, ts AS b_ts, max(event_id) AS b_id
             |      FROM events WHERE event_type = 'purchase'
             |      GROUP BY user_id, ts),
             |e AS (SELECT user_id, ts AS c_ts
             |      FROM events WHERE event_type = 'error'
             |      GROUP BY user_id, ts),
             |j1 AS (SELECT v.a_id, v.user_id, v.ts,
             |         CASE WHEN p.b_ts IS NOT NULL
             |                AND p.b_ts - v.ts <= INTERVAL 12 HOUR
             |              THEN p.b_id END AS b_id,
             |         CASE WHEN p.b_ts IS NOT NULL
             |                AND p.b_ts - v.ts <= INTERVAL 12 HOUR
             |              THEN p.b_ts END AS b_ts
             |       FROM v ASOF LEFT JOIN p
             |         ON v.user_id = p.user_id AND v.ts <= p.b_ts),
             |j2 AS (SELECT j1.*, e.c_ts
             |       FROM j1 ASOF LEFT JOIN e
             |         ON j1.user_id = e.user_id AND j1.ts <= e.c_ts)
             |SELECT a_id, user_id,
             |  CASE WHEN b_id IS NOT NULL AND (c_ts IS NULL OR c_ts >= b_ts)
             |       THEN b_id END AS b_match,
             |  (b_id IS NOT NULL AND (c_ts IS NULL OR c_ts >= b_ts))
             |    AS matched
             |FROM j2 ORDER BY a_id""".stripMargin)),

    // ---- CEP negation CHAIN (q142's guard generalized to arbitrary
    // A-then-not-B-within-T sequences — the absence/SLA-monitoring
    // staple): per user, view → click within 6h → purchase within 12h
    // OF THE CLICK, with no error between click and purchase
    // (interval [click, purchase), q142's inclusive-start/exclusive-
    // end rules) and no error within 2h AFTER the purchase (trailing
    // negation — time-bounded, because "never again" cannot be
    // decided on a growing corpus). One forward-asof union-carry pass
    // per step from that step's anchor: linear, one hash exchange
    // each, no pair-space join, no state machine; dead chains keep
    // their row with matched=false and NULL step columns (the null
    // anchor is masked, never joined through). q142 itself now runs
    // on this engine (firstMatch = a 2-step chain), so its oracle
    // re-validates the core on every round ----
    QuerySpec("q186_cep_negation_chain",
      (s, dir) => graft.operators.EventPattern.chain(
          t(s, dir, "events"), "user_id", "ts", "event_id", "event_type",
          seedType = "view", steps = Seq(
            graft.operators.EventPattern.Pos("click", expr("INTERVAL 6 HOURS")),
            graft.operators.EventPattern.Neg("error"),
            graft.operators.EventPattern.Pos("purchase", expr("INTERVAL 12 HOURS")),
            graft.operators.EventPattern.Neg("error",
              Some(expr("INTERVAL 2 HOURS")))))
        .orderBy(col("a_id")),
      Some("""WITH a AS (SELECT event_id AS a_id, user_id, ts AS a_ts
             |           FROM events WHERE event_type = 'view'),
             |s1r AS (SELECT user_id, ts, max(event_id) AS id
             |        FROM events WHERE event_type = 'click' GROUP BY 1, 2),
             |s3r AS (SELECT user_id, ts, max(event_id) AS id
             |        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
             |g AS (SELECT user_id, ts FROM events
             |      WHERE event_type = 'error' GROUP BY 1, 2),
             |j1 AS (SELECT a.a_id, a.user_id, a.a_ts,
             |         CASE WHEN s1r.ts - a.a_ts <= INTERVAL 6 HOUR
             |              THEN s1r.id END AS s1_id,
             |         CASE WHEN s1r.ts - a.a_ts <= INTERVAL 6 HOUR
             |              THEN s1r.ts END AS s1_ts
             |       FROM a ASOF LEFT JOIN s1r
             |         ON a.user_id = s1r.user_id AND a.a_ts <= s1r.ts),
             |j2 AS (SELECT j1.*, g.ts AS n2_ts
             |       FROM j1 ASOF LEFT JOIN g
             |         ON j1.user_id = g.user_id AND j1.s1_ts <= g.ts),
             |j3 AS (SELECT j2.*,
             |         CASE WHEN s3r.ts - j2.s1_ts <= INTERVAL 12 HOUR
             |              THEN s3r.id END AS s3_id,
             |         CASE WHEN s3r.ts - j2.s1_ts <= INTERVAL 12 HOUR
             |              THEN s3r.ts END AS s3_ts
             |       FROM j2 ASOF LEFT JOIN s3r
             |         ON j2.user_id = s3r.user_id AND j2.s1_ts <= s3r.ts),
             |j4 AS (SELECT j3.*, g.ts AS n4_ts
             |       FROM j3 ASOF LEFT JOIN g
             |         ON j3.user_id = g.user_id AND j3.s3_ts <= g.ts)
             |SELECT user_id, a_id, a_ts, s1_id, s1_ts, s3_id, s3_ts,
             |  (s1_ts IS NOT NULL AND s3_ts IS NOT NULL
             |    AND NOT coalesce(n2_ts < s3_ts, false)
             |    AND NOT coalesce(n4_ts <= s3_ts + INTERVAL 2 HOUR, false))
             |    AS matched
             |FROM j4 ORDER BY a_id""".stripMargin)),

    // ---- CEP chain with a CAPPED between-negation (q186's one
    // untested interval form, now oracle-gated): per user, view →
    // click within 6h → purchase within 12h of the click, with no
    // error in [click, purchase) ∩ [click, click+1h] — the guard watches
    // (cap edge INCLUSIVE, interval end exclusive, q142's rules);
    // only the first hour AFTER the click instead of the whole
    // click→purchase span (the "grace window" SLA shape: a late error
    // is a separate incident, not a funnel-killer). Same linear
    // one-asof-pass-per-step engine as q186; the cap is a row-local
    // predicate on the already-joined earliest guard, so the plan
    // shape (and budget) is q142's. The 1h cap vs the 12h window
    // makes the cap BITE at this SF: errors between click and
    // purchase but past click+1h match here and are blocked in the
    // uncapped form ----
    QuerySpec("q187_cep_capped_guard",
      (s, dir) => graft.operators.EventPattern.chain(
          t(s, dir, "events"), "user_id", "ts", "event_id", "event_type",
          seedType = "view", steps = Seq(
            graft.operators.EventPattern.Pos("click", expr("INTERVAL 6 HOURS")),
            graft.operators.EventPattern.Neg("error",
              Some(expr("INTERVAL 1 HOUR"))),
            graft.operators.EventPattern.Pos("purchase", expr("INTERVAL 12 HOURS"))))
        .orderBy(col("a_id")),
      Some("""WITH a AS (SELECT event_id AS a_id, user_id, ts AS a_ts
             |           FROM events WHERE event_type = 'view'),
             |s1r AS (SELECT user_id, ts, max(event_id) AS id
             |        FROM events WHERE event_type = 'click' GROUP BY 1, 2),
             |s3r AS (SELECT user_id, ts, max(event_id) AS id
             |        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
             |g AS (SELECT user_id, ts FROM events
             |      WHERE event_type = 'error' GROUP BY 1, 2),
             |j1 AS (SELECT a.a_id, a.user_id, a.a_ts,
             |         CASE WHEN s1r.ts - a.a_ts <= INTERVAL 6 HOUR
             |              THEN s1r.id END AS s1_id,
             |         CASE WHEN s1r.ts - a.a_ts <= INTERVAL 6 HOUR
             |              THEN s1r.ts END AS s1_ts
             |       FROM a ASOF LEFT JOIN s1r
             |         ON a.user_id = s1r.user_id AND a.a_ts <= s1r.ts),
             |j2 AS (SELECT j1.*, g.ts AS n2_ts
             |       FROM j1 ASOF LEFT JOIN g
             |         ON j1.user_id = g.user_id AND j1.s1_ts <= g.ts),
             |j3 AS (SELECT j2.*,
             |         CASE WHEN s3r.ts - j2.s1_ts <= INTERVAL 12 HOUR
             |              THEN s3r.id END AS s3_id,
             |         CASE WHEN s3r.ts - j2.s1_ts <= INTERVAL 12 HOUR
             |              THEN s3r.ts END AS s3_ts
             |       FROM j2 ASOF LEFT JOIN s3r
             |         ON j2.user_id = s3r.user_id AND j2.s1_ts <= s3r.ts)
             |SELECT user_id, a_id, a_ts, s1_id, s1_ts, s3_id, s3_ts,
             |  (s1_ts IS NOT NULL AND s3_ts IS NOT NULL
             |    AND NOT coalesce(n2_ts < s3_ts
             |      AND n2_ts <= s1_ts + INTERVAL 1 HOUR, false))
             |    AS matched
             |FROM j3 ORDER BY a_id""".stripMargin)),

    // ---- CEP chain with a QUANTIFIED step (B{2,} within T — the
    // engagement/escalation staple, the chain engine's last
    // MATCH_RECOGNIZE staple): per user, view → at least TWO clicks
    // within 48h (the 2nd click binds and anchors — all n must land
    // in the window; every RAW event counts, ordered by (ts, id)) →
    // purchase within 48h of the 2nd click. The 48h windows make all
    // three verdict populations real at sf0.01 (215 matched, 400
    // quantifier-met, 1982 seeds). Stays linear: the ENGINE ranks the
    // step's events per key ONCE and carries each instant's n-th-ahead
    // (id, ts) on that SAME window pass via lead(n-1) — one hash
    // exchange, one scan of the step's side, no second reference to
    // the ranked subtree. (The DuckDB oracle twin below formulates the
    // n-th lookup as a (key, rank) equi-join instead — equivalent
    // semantics, NOT the engine's plan.) Never the pair-space
    // count-matches-per-anchor expansion a range join would plan ----
    QuerySpec("q188_cep_quantified",
      (s, dir) => graft.operators.EventPattern.chain(
          t(s, dir, "events"), "user_id", "ts", "event_id", "event_type",
          seedType = "view", steps = Seq(
            graft.operators.EventPattern.Pos("click",
              expr("INTERVAL 48 HOURS"), atLeast = 2),
            graft.operators.EventPattern.Pos("purchase",
              expr("INTERVAL 48 HOURS"))))
        .orderBy(col("a_id")),
      Some("""WITH a AS (SELECT event_id AS a_id, user_id, ts AS a_ts
             |           FROM events WHERE event_type = 'view'),
             |c AS (SELECT user_id, ts, event_id,
             |        row_number() OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS rk
             |      FROM events WHERE event_type = 'click'),
             |cmin AS (SELECT user_id, ts, min(rk) AS rk0
             |         FROM c GROUP BY 1, 2),
             |j1 AS (SELECT a.a_id, a.user_id, a.a_ts,
             |         CASE WHEN cmin.ts - a.a_ts <= INTERVAL 48 HOUR
             |              THEN cmin.rk0 END AS rk0
             |       FROM a ASOF LEFT JOIN cmin
             |         ON a.user_id = cmin.user_id AND a.a_ts <= cmin.ts),
             |j2 AS (SELECT j1.a_id, j1.user_id, j1.a_ts,
             |         CASE WHEN c2.ts - j1.a_ts <= INTERVAL 48 HOUR
             |              THEN c2.event_id END AS s1_id,
             |         CASE WHEN c2.ts - j1.a_ts <= INTERVAL 48 HOUR
             |              THEN c2.ts END AS s1_ts
             |       FROM j1 LEFT JOIN c c2
             |         ON j1.user_id = c2.user_id AND c2.rk = j1.rk0 + 1),
             |p AS (SELECT user_id, ts, max(event_id) AS id
             |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
             |j3 AS (SELECT j2.*,
             |         CASE WHEN p.ts - j2.s1_ts <= INTERVAL 48 HOUR
             |              THEN p.id END AS s2_id,
             |         CASE WHEN p.ts - j2.s1_ts <= INTERVAL 48 HOUR
             |              THEN p.ts END AS s2_ts
             |       FROM j2 ASOF LEFT JOIN p
             |         ON j2.user_id = p.user_id AND j2.s1_ts <= p.ts)
             |SELECT user_id, a_id, a_ts, s1_id, s1_ts, s2_id, s2_ts,
             |  (s1_ts IS NOT NULL AND s2_ts IS NOT NULL) AS matched
             |FROM j3 ORDER BY a_id""".stripMargin)),

    // ---- CEP chain with an ALTERNATION step (A then (B|C) within T —
    // MATCH_RECOGNIZE's (B|C), the other union-carry staple): per
    // user, view → first click OR signup ≤6h (whichever comes first
    // binds, anchors, and s1_type names it; same-instant ties across
    // the alternatives resolve to max event_id, the type riding by
    // arg-max) → purchase ≤12h of the bound alternative. The ENGINE's
    // pool is ONE widened isin filter on the same single scan — the
    // alternation adds NO exchange and NO extra pass (never
    // one-asof-pass-per-alternative unioned after the fact), so the
    // plan is byte-identical in shape to the plain q186 step class.
    // Windows chosen so every population is real at sf0.01: 222 seeds
    // bind click, 199 bind signup (the alternation BITES — a
    // click-only step gives those 199 a different/absent binding),
    // 80 matched, 1561 unbound ----
    QuerySpec("q189_cep_alternation",
      (s, dir) => graft.operators.EventPattern.chain(
          t(s, dir, "events"), "user_id", "ts", "event_id", "event_type",
          seedType = "view", steps = Seq(
            graft.operators.EventPattern.Pos("click",
              expr("INTERVAL 6 HOURS"), orTypes = Seq("signup")),
            graft.operators.EventPattern.Pos("purchase",
              expr("INTERVAL 12 HOURS"))))
        .orderBy(col("a_id")),
      Some("""WITH a AS (SELECT event_id AS a_id, user_id, ts AS a_ts
             |           FROM events WHERE event_type = 'view'),
             |s1r AS (SELECT user_id, ts, max(event_id) AS id,
             |          arg_max(event_type, event_id) AS tpe
             |        FROM events WHERE event_type IN ('click', 'signup')
             |        GROUP BY 1, 2),
             |s2r AS (SELECT user_id, ts, max(event_id) AS id
             |        FROM events WHERE event_type = 'purchase'
             |        GROUP BY 1, 2),
             |j1 AS (SELECT a.a_id, a.user_id, a.a_ts,
             |         CASE WHEN s1r.ts - a.a_ts <= INTERVAL 6 HOUR
             |              THEN s1r.id END AS s1_id,
             |         CASE WHEN s1r.ts - a.a_ts <= INTERVAL 6 HOUR
             |              THEN s1r.ts END AS s1_ts,
             |         CASE WHEN s1r.ts - a.a_ts <= INTERVAL 6 HOUR
             |              THEN s1r.tpe END AS s1_type
             |       FROM a ASOF LEFT JOIN s1r
             |         ON a.user_id = s1r.user_id AND a.a_ts <= s1r.ts),
             |j2 AS (SELECT j1.*,
             |         CASE WHEN s2r.ts - j1.s1_ts <= INTERVAL 12 HOUR
             |              THEN s2r.id END AS s2_id,
             |         CASE WHEN s2r.ts - j1.s1_ts <= INTERVAL 12 HOUR
             |              THEN s2r.ts END AS s2_ts
             |       FROM j1 ASOF LEFT JOIN s2r
             |         ON j1.user_id = s2r.user_id AND j1.s1_ts <= s2r.ts)
             |SELECT user_id, a_id, a_ts, s1_id, s1_ts, s1_type,
             |  s2_id, s2_ts,
             |  (s1_ts IS NOT NULL AND s2_ts IS NOT NULL) AS matched
             |FROM j2 ORDER BY a_id""".stripMargin)),

    // ---- global running total (cumulative revenue curve) WITHOUT the
    // single-partition window the naive SUM() OVER (ORDER BY) plans:
    // GlobalPrefix range-partitions, runs the local prefix per task,
    // and broadcast-joins control-plane-sized partition offsets — the
    // distributed scan GlobalIndex uses for ranks, generalized to the
    // sum monoid (GlobalPrefixSpec pins the reused-exchange shape).
    // Exact integer micro-units end to end ----
    QuerySpec("q143_running_total",
      (s, dir) => graft.operators.GlobalPrefix.runningSum(
          t(s, dir, "events").select(col("event_id"), col("ts"),
            round(col("value") * 100).cast("long").as("c")),
          Seq(col("ts"), col("event_id")), col("c"),
          numPartitions = Some(8))
        .select(col("event_id"), col("running"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
             |    ORDER BY ts, event_id) AS BIGINT) AS running
             |FROM events ORDER BY event_id""".stripMargin)),

    // ---- score calibration: each event's percentile standing within
    // its type's distribution — percent_rank (share strictly below)
    // and cume_dist (share at-or-below), completing the analytic
    // ranking family (q65 ntile / q110 rank / q102 frames). Both are
    // ratios of exact integer ranks, so the doubles are bit-identical
    // cross-engine; tie-broken by event_id for a total order ----
    QuerySpec("q144_percentile_standing",
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(round(col("value") * 100).cast("long"), col("event_id"))
        t(s, dir, "events")
          .withColumn("pr", percent_rank().over(w))
          .withColumn("cd", cume_dist().over(w))
          .filter(pmod(col("event_id"), lit(17)) === 0) // thin the gate
          .select(col("event_id"), col("event_type"), col("pr"), col("cd"))
          .orderBy(col("event_id"))
      },
      Some("""WITH r AS (
             |  SELECT event_id, event_type,
             |    percent_rank() OVER (PARTITION BY event_type
             |      ORDER BY CAST(round(value * 100) AS BIGINT), event_id)
             |      AS pr,
             |    cume_dist() OVER (PARTITION BY event_type
             |      ORDER BY CAST(round(value * 100) AS BIGINT), event_id)
             |      AS cd
             |  FROM events)
             |SELECT event_id, event_type, pr, cd
             |FROM r WHERE event_id % 17 = 0 ORDER BY event_id""".stripMargin)),

    // ---- gaps-and-islands: per-user consecutive-day activity streaks
    // (longest streak + streak count + last-streak length) — the
    // engagement/continuity profile, and the canonical islands
    // detection the span/gap family (q105 gap fill, duplicateSpans'
    // internal runs) had no USER-level gate for. The island key is
    // day − dense per-user rank: constant within a consecutive run,
    // strictly shifting across a gap — exact integer arithmetic, so
    // the whole query is one rank window + two grouped folds on the
    // SAME user partitioning (one hash shuffle; window sort is
    // per-partition; no self-join, no sequence explode) ----
    QuerySpec("q148_streaks",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        val islands = t(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
          .withColumn("rk", row_number().over(w))
          .withColumn("isl", datediff(col("day"),
            lit(java.sql.Date.valueOf("2024-01-01"))) - col("rk"))
          .groupBy(col("user_id"), col("isl"))
          .agg(count(lit(1)).as("len"), max(col("day")).as("end_day"))
        islands.groupBy(col("user_id"))
          .agg(max(col("len")).as("longest"),
            count(lit(1)).as("n_streaks"),
            max_by(col("len"), col("end_day")).as("last_len"))
          .filter(col("longest") >= 2)
          .orderBy(col("user_id"))
      },
      Some("""WITH p AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
             |           FROM events),
             |r AS (SELECT user_id, day,
             |        row_number() OVER (PARTITION BY user_id
             |          ORDER BY day) AS rk
             |      FROM p),
             |i AS (SELECT user_id,
             |        day - CAST(rk AS INTEGER) AS isl,
             |        CAST(count(*) AS BIGINT) AS len,
             |        max(day) AS end_day
             |      FROM r GROUP BY user_id, day - CAST(rk AS INTEGER)),
             |a AS (SELECT user_id, max(len) AS longest,
             |        CAST(count(*) AS BIGINT) AS n_streaks,
             |        max_by(len, end_day) AS last_len
             |      FROM i GROUP BY user_id)
             |SELECT user_id, longest, n_streaks, last_len
             |FROM a WHERE longest >= 2 ORDER BY user_id""".stripMargin)),

    // ---- weighted median: per source, the doc length below which
    // half the source's character MASS sits (mass-weighted, not
    // doc-counted — the q70 rank-pick rule generalized to weights):
    // sort by (value, id), pick the first row where 2·cumw >= totw.
    // Exact integers; min_by over the qualifying set replaces any
    // second pass. One shuffle carries the window and the fold ----
    QuerySpec("q154_weighted_median",
      (s, dir) => {
        val w = Window.partitionBy(col("source"))
          .orderBy(col("v"), col("doc_id"))
        val wAll = Window.partitionBy(col("source"))
        t(s, dir, "documents")
          .select(col("source"), col("n_chars").cast("long").as("v"),
            col("doc_id"))
          .withColumn("cumw", sum(col("v")).over(w))
          .withColumn("totw", sum(col("v")).over(wAll))
          .filter(lit(2L) * col("cumw") >= col("totw"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_at_or_above"),
            max(col("totw")).as("tot_chars"),
            min_by(col("v"), col("cumw")).as("wmedian"))
          .orderBy(col("source"))
      },
      Some("""WITH x AS (
             |  SELECT source, CAST(n_chars AS BIGINT) AS v, doc_id,
             |    CAST(sum(n_chars) OVER (PARTITION BY source
             |      ORDER BY n_chars, doc_id) AS BIGINT) AS cumw,
             |    CAST(sum(n_chars) OVER (PARTITION BY source)
             |      AS BIGINT) AS totw
             |  FROM documents),
             |q AS (SELECT * FROM x WHERE 2 * cumw >= totw)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_at_or_above,
             |  max(totw) AS tot_chars,
             |  min_by(v, cumw) AS wmedian
             |FROM q GROUP BY source ORDER BY source""".stripMargin)),

    // ---- SCD2 point-in-time enrichment: each purchase fact picks up
    // the user's state VERSION valid at the fact's timestamp — the
    // warehouse-standard temporal join q93's history exists to serve.
    // NOT a range join: the backward as-of union-carry (q47's linear
    // shape) delivers "latest version with valid_from <= ts", which
    // IS the valid version because versions partition time; zero-width
    // versions (state changed twice at one microsecond) are filtered
    // so the right side is unique per (user, time) and the carry is
    // deterministic. One exchange, one in-partition sort ----
    QuerySpec("q155_point_in_time",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val hist = graft.operators.Scd2.history(ev,
            key = col("user_id"), ts = unix_micros(col("ts")),
            value = col("event_type"), tieBreak = col("event_id"))
          .filter(col("valid_to").isNull ||
            col("valid_to") > col("valid_from"))
          .select(col("k"), col("valid_from").as("t"),
            col("v"), col("valid_from"), col("valid_to"))
        val facts = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id").as("k"),
            unix_micros(col("ts")).as("t"))
        graft.operators.AsofJoin.asofJoin(facts, hist, "k", "t",
            Seq("v", "valid_from", "valid_to"))
          .select(col("event_id"), col("k").as("user_id"),
            col("asof_v").as("state"),
            col("asof_valid_from").as("valid_from"),
            col("asof_valid_to").as("valid_to"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type
             |  FROM events),
             |o AS (
             |  SELECT user_id, event_type, tsu, event_id,
             |    row_number() OVER w AS rn,
             |    lag(event_type) OVER w AS prev
             |  FROM e WINDOW w AS (PARTITION BY user_id
             |    ORDER BY tsu, event_id)),
             |c AS (
             |  SELECT user_id, event_type, tsu AS valid_from, event_id
             |  FROM o WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
             |h AS (
             |  SELECT user_id, event_type, valid_from,
             |    lead(valid_from) OVER (
             |      PARTITION BY user_id ORDER BY valid_from, event_id)
             |      AS valid_to
             |  FROM c),
             |hv AS (SELECT * FROM h
             |       WHERE valid_to IS NULL OR valid_to > valid_from),
             |f AS (SELECT event_id, user_id, epoch_us(ts) AS t
             |      FROM events WHERE event_type = 'purchase')
             |SELECT f.event_id, f.user_id, hv.event_type AS state,
             |  hv.valid_from, hv.valid_to
             |FROM f JOIN hv ON hv.user_id = f.user_id
             |  AND hv.valid_from <= f.t
             |  AND (hv.valid_to IS NULL OR f.t < hv.valid_to)
             |ORDER BY f.event_id""".stripMargin)),

    // ---- OLS trend slope per event type: is daily volume rising or
    // falling, and how fast — the parametric trend twin of q131's
    // monotone Spearman. slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²):
    // FOUR integer aggregates over (day-index, daily-count) points and
    // ONE final divide of exact operands — bit-identical
    // cross-engine. Two shuffles: the daily fold (map-side combined)
    // and the per-type fold over day-count-sized data ----
    QuerySpec("q156_trend",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")),
              lit(java.sql.Date.valueOf("2024-01-01"))).as("x"))
          .agg(count(lit(1)).as("y"))
          .select(col("event_type"), col("x").cast("long").as("x"),
            col("y"))
        val num = try_subtract(try_multiply(col("n"), col("sxy")),
          try_multiply(col("sx"), col("sy")))
        val den = try_subtract(try_multiply(col("n"), col("sxx")),
          try_multiply(col("sx"), col("sx")))
        // the slope's arithmetic runs in double space END TO END:
        // dedicated double-space sums sxyd/sxxd (exact below 2^53,
        // never overflowing), NOT the try_* Long aggregates — a
        // statistic derived from sxy would go NULL on Σ overflow and
        // silently PARTIAL when a per-row product overflows (SUM
        // skips the try_multiply NULL). sx/sy stay exact Longs: sy is
        // the row count and sx ≤ n·days, both int64-safe. The Long
        // slope_num/slope_den/sxy diagnostics ride try_* forms: exact
        // while int64-representable, NULL beyond (any overflowed row
        // poisons the fold via TryAgg) — never an abort
        val numd = col("n").cast("double") * col("sxyd") -
          col("sx").cast("double") * col("sy")
        val dend = col("n").cast("double") * col("sxxd") -
          col("sx").cast("double") * col("sx")
        daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            // poison flag is EXPLICIT here (not term.isNull): x is a
            // group key that is legitimately NULL for NULL-ts events
            // (both engines group NULL days identically and SUM skips
            // them in sx/sxy alike) — only a non-null-x row whose
            // product is NULL overflowed
            graft.functions.TryAgg.unlessOverflow(
              col("x").isNotNull &&
                try_multiply(col("x"), col("y")).isNull,
              try_sum(try_multiply(col("x"), col("y")))).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x").cast("double") * col("y")).as("sxyd"),
            sum(col("x").cast("double") * col("x")).as("sxxd"))
          .select(col("event_type"), col("n"),
            num.as("slope_num"), den.as("slope_den"),
            when(dend === 0.0, lit(null).cast("double"))
              .otherwise(numd / dend)
              .as("slope"))
          .orderBy(col("event_type"))
      },
      Some("""WITH d AS (
             |  SELECT event_type,
             |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT)
             |      AS x,
             |    CAST(count(*) AS BIGINT) AS y
             |  FROM events GROUP BY 1, 2),
             |a AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * y) AS BIGINT) AS sxy,
             |    CAST(sum(x * x) AS BIGINT) AS sxx
             |  FROM d GROUP BY event_type)
             |SELECT event_type, n,
             |  n * sxy - sx * sy AS slope_num,
             |  n * sxx - sx * sx AS slope_den,
             |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
             |       ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
             |            CAST(n * sxx - sx * sx AS DOUBLE)
             |  END AS slope
             |FROM a ORDER BY event_type""".stripMargin)),

    // ---- ordered conversion funnel (view → click → purchase, each
    // step within 24 h of the previous): the canonical product-
    // analytics query, expressed as three min-folds chained by
    // co-partitioned user_id joins — no per-user sequence collect, no
    // window over the event stream. Each step's timestamp is the MIN
    // qualifying micro — exact integer comparisons end to end; the two
    // conversion ratios are each ONE divide of exact longs. Scale: the
    // three event-type scans stay separate (each filter-pushed to the
    // parquet scan — a single materialized full pass would read the
    // other types too), but each STEP frame is localCheckpoint'd: s1
    // feeds s2 AND the view count, s2 feeds s3 AND the click count,
    // and without the materialization each consumer re-ran the whole
    // upstream chain (measured: 6 scans / 5 shuffles for a 3-step
    // funnel — the runtime-audit class). Step frames are user-sized,
    // far below the event stream. Final assembly cross-joins three
    // ONE-ROW frames (control-plane) ----
    QuerySpec("q162_funnel",
      (s, dir) => {
        val winUs = 86400000000L // 24 h in microseconds
        val ev = t(s, dir, "events").select(col("user_id"),
          col("event_type"), unix_micros(col("ts")).as("tsu"))
        val s1 = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("tsu")).as("t1"))
          .localCheckpoint()
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, Seq("user_id"))
          .filter(col("tsu") > col("t1") &&
            col("tsu") <= col("t1") + lit(winUs))
          .groupBy(col("user_id")).agg(min(col("tsu")).as("t2"))
          .localCheckpoint()
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, Seq("user_id"))
          .filter(col("tsu") > col("t2") &&
            col("tsu") <= col("t2") + lit(winUs))
          .groupBy(col("user_id")).agg(min(col("tsu")).as("t3"))
        s1.agg(count(lit(1)).as("n_view"))
          .crossJoin(broadcast(s2.agg(count(lit(1)).as("n_click"))))
          .crossJoin(broadcast(s3.agg(count(lit(1)).as("n_purchase"))))
          .select(col("n_view"), col("n_click"), col("n_purchase"),
            when(col("n_view") === 0, lit(null).cast("double"))
              .otherwise(col("n_click").cast("double") /
                col("n_view").cast("double")).as("conv_click"),
            when(col("n_click") === 0, lit(null).cast("double"))
              .otherwise(col("n_purchase").cast("double") /
                col("n_click").cast("double")).as("conv_purchase"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tsu
             |           FROM events),
             |s1 AS (SELECT user_id, min(tsu) AS t1 FROM e
             |       WHERE event_type = 'view' GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(tsu) AS t2
             |       FROM e JOIN s1 USING (user_id)
             |       WHERE event_type = 'click' AND tsu > t1
             |         AND tsu <= t1 + 86400000000 GROUP BY 1),
             |s3 AS (SELECT e.user_id, min(tsu) AS t3
             |       FROM e JOIN s2 USING (user_id)
             |       WHERE event_type = 'purchase' AND tsu > t2
             |         AND tsu <= t2 + 86400000000 GROUP BY 1)
             |SELECT
             |  (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_view,
             |  (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click,
             |  (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase,
             |  CASE WHEN (SELECT count(*) FROM s1) = 0 THEN NULL
             |    ELSE CAST((SELECT count(*) FROM s2) AS DOUBLE) /
             |         CAST((SELECT count(*) FROM s1) AS DOUBLE) END
             |    AS conv_click,
             |  CASE WHEN (SELECT count(*) FROM s2) = 0 THEN NULL
             |    ELSE CAST((SELECT count(*) FROM s3) AS DOUBLE) /
             |         CAST((SELECT count(*) FROM s2) AS DOUBLE) END
             |    AS conv_purchase""".stripMargin)),

    // ---- cohort retention matrix: users grouped by first-active day,
    // activity counted per day offset, rate = active / cohort size.
    // The (user, day) activity set is deduped ONCE and
    // localCheckpoint'd — it feeds the first-day fold AND the
    // join-back, and lazily each reference re-ran the dedup shuffle
    // over the full event stream. The matrix is likewise
    // checkpointed (control-plane-sized) so the offset-0 diagonal
    // doesn't re-run the whole chain. Cohort sizes are a broadcast-
    // sized frame joined back for the ONE divide per cell ----
    QuerySpec("q163_cohort_retention",
      (s, dir) => {
        val act = t(s, dir, "events")
          .select(col("user_id"),
            datediff(to_date(col("ts")),
              lit(java.sql.Date.valueOf("2024-01-01")))
              .cast("long").as("d"))
          .distinct()
          .localCheckpoint()
        val first = act.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
        val ret = act.join(first, Seq("user_id"))
          .groupBy(col("d0").as("cohort_day"),
            (col("d") - col("d0")).as("day_offset"))
          .agg(count(lit(1)).as("n_users"))
          .localCheckpoint()
        val sizes = ret.filter(col("day_offset") === 0)
          .select(col("cohort_day"), col("n_users").as("cohort_size"))
        ret.join(broadcast(sizes), Seq("cohort_day"))
          .select(col("cohort_day"), col("day_offset"), col("n_users"),
            col("cohort_size"),
            (col("n_users").cast("double") /
              col("cohort_size").cast("double")).as("retention"))
          .orderBy(col("cohort_day"), col("day_offset"))
      },
      Some("""WITH a AS (SELECT DISTINCT user_id,
             |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT)
             |      AS d
             |  FROM events),
             |f AS (SELECT user_id, min(d) AS d0 FROM a GROUP BY 1),
             |r AS (SELECT f.d0 AS cohort_day, a.d - f.d0 AS day_offset,
             |        CAST(count(*) AS BIGINT) AS n_users
             |      FROM a JOIN f USING (user_id) GROUP BY 1, 2),
             |c AS (SELECT cohort_day, n_users AS cohort_size FROM r
             |      WHERE day_offset = 0)
             |SELECT r.cohort_day, r.day_offset, r.n_users,
             |  c.cohort_size,
             |  CAST(r.n_users AS DOUBLE) / CAST(c.cohort_size AS DOUBLE)
             |    AS retention
             |FROM r JOIN c USING (cohort_day)
             |ORDER BY cohort_day, day_offset""".stripMargin)),

    // ---- first-order Markov transition matrix over per-user event
    // sequences: P(next type | type) — the behavioral-model /
    // anomaly-baseline primitive. The successor pairing is ONE lead()
    // window partitioned by user_id (the natural key partitioning;
    // never global), the pair fold is map-side combined to ≤|types|²
    // rows, and the row-normalizing total is an analytic sum over
    // that control-plane-sized matrix. Counts exact; ONE divide ----
    QuerySpec("q164_markov_transitions",
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("user_id"),
          col("event_type"), unix_micros(col("ts")).as("tsu"),
          col("event_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tsu"), col("event_id"))
        val counts = ev
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"),
            col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        counts
          .withColumn("n_from",
            sum(col("n")).over(Window.partitionBy(col("from_type"))))
          .select(col("from_type"), col("to_type"), col("n"),
            col("n_from"),
            (col("n").cast("double") / col("n_from").cast("double"))
              .as("p"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tsu,
             |             event_id FROM events),
             |pr AS (SELECT event_type, lead(event_type) OVER (
             |         PARTITION BY user_id ORDER BY tsu, event_id)
             |         AS next_type
             |       FROM e),
             |c AS (SELECT event_type AS from_type, next_type AS to_type,
             |        CAST(count(*) AS BIGINT) AS n
             |      FROM pr WHERE next_type IS NOT NULL GROUP BY 1, 2),
             |tt AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
             |       FROM c GROUP BY 1)
             |SELECT c.from_type, c.to_type, c.n, tt.n_from,
             |  CAST(c.n AS DOUBLE) / CAST(tt.n_from AS DOUBLE) AS p
             |FROM c JOIN tt USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin)),

    // ---- Benford first-digit audit over order totals: the
    // fraud/synthetic-data screen. The digit is taken from the DECIMAL
    // STRING of the floored integer amount (exact in both engines — no
    // log10 float boundary at powers of ten), folded map-side to ≤9
    // rows; the share is ONE divide against a one-row broadcast
    // total ----
    QuerySpec("q165_benford",
      (s, dir) => {
        val byd = t(s, dir, "orders")
          .select(floor(col("o_totalprice")).cast("long").as("v"))
          .filter(col("v") >= 1)
          .select(substring(col("v").cast("string"), 1, 1).as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n"))
          // pinned: the rows AND the broadcast total both read it —
          // unpinned, the orders scan + digit fold ran twice (q172's
          // histogram/total discipline)
          .localCheckpoint()
        byd.crossJoin(broadcast(byd.agg(sum(col("n")).as("n_total"))))
          .select(col("digit"), col("n"), col("n_total"),
            (col("n").cast("double") / col("n_total").cast("double"))
              .as("share"))
          .orderBy(col("digit"))
      },
      Some("""WITH v AS (SELECT CAST(floor(o_totalprice) AS BIGINT) AS v
             |           FROM orders),
             |d AS (SELECT substring(CAST(v AS VARCHAR), 1, 1) AS digit,
             |        CAST(count(*) AS BIGINT) AS n
             |      FROM v WHERE v >= 1 GROUP BY 1),
             |t0 AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM d)
             |SELECT digit, n, n_total,
             |  CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
             |FROM d CROSS JOIN t0 ORDER BY digit""".stripMargin)),

    // ---- robust location/spread per event type: exact median and MAD
    // (median absolute deviation) in integer micro-units. The corpus
    // folds ONCE to (type, value, count) — map-side combined, bounded
    // by distinct values — and both medians come from cumulative-count
    // ladders over that fold (the q159 value-ladder discipline: the
    // windows run over DISTINCT values, not rows, so no corpus-scale
    // relation meets a skewed window). Lower-median convention
    // (element at ceil(n/2)) matches the q136 rank-pick; everything
    // before the output is integer-exact, and there is NO divide at
    // all ----
    QuerySpec("q167_mad",
      (s, dir) => {
        // the fold is |distinct values|-sized; localCheckpoint so its
        // two references (median ladder + deviation fold) run the
        // corpus scan once (q153 discipline)
        val f = t(s, dir, "events")
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("c"))
          .filter(col("c").isNotNull)
          .groupBy(col("event_type"), col("c"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint()
        val wp = Window.partitionBy(col("event_type"))
        def ladderPick(g: org.apache.spark.sql.DataFrame, v: String) = g
          .withColumn("cum", sum(col("cnt"))
            .over(Window.partitionBy(col("event_type")).orderBy(col(v))))
          .withColumn("tot", sum(col("cnt")).over(wp))
          .filter(expr("cum >= (tot + 1) div 2"))
          .groupBy(col("event_type"))
          .agg(min(col(v)).as(s"${v}_pick"), max(col("tot")).as("n"))
        val med = ladderPick(f, "c")
          .select(col("event_type"), col("c_pick").as("med"), col("n"))
        val dev = f.join(broadcast(med.select("event_type", "med")),
            Seq("event_type"))
          .select(col("event_type"), abs(col("c") - col("med")).as("dv"),
            col("cnt"))
          .groupBy(col("event_type"), col("dv"))
          .agg(sum(col("cnt")).as("cnt"))
        val mad = ladderPick(dev, "dv")
          .select(col("event_type"), col("dv_pick").as("mad"))
        med.join(mad, Seq("event_type"))
          .select(col("event_type"), col("n"), col("med"), col("mad"))
          .orderBy(col("event_type"))
      },
      Some("""WITH x AS (SELECT event_id, event_type,
             |    CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events WHERE value IS NOT NULL),
             |r AS (SELECT event_type, c, row_number() OVER (
             |        PARTITION BY event_type ORDER BY c, event_id) AS rn,
             |        count(*) OVER (PARTITION BY event_type) AS cnt
             |      FROM x),
             |m AS (SELECT event_type, CAST(max(cnt) AS BIGINT) AS n,
             |        max(CASE WHEN rn = (cnt + 1) // 2 THEN c END) AS med
             |      FROM r GROUP BY 1),
             |d AS (SELECT x.event_type, abs(x.c - m.med) AS dv,
             |        x.event_id
             |      FROM x JOIN m USING (event_type)),
             |r2 AS (SELECT event_type, dv, row_number() OVER (
             |         PARTITION BY event_type ORDER BY dv, event_id)
             |         AS rn,
             |         count(*) OVER (PARTITION BY event_type) AS cnt
             |       FROM d),
             |m2 AS (SELECT event_type,
             |         max(CASE WHEN rn = (cnt + 1) // 2 THEN dv END)
             |           AS mad
             |       FROM r2 GROUP BY 1)
             |SELECT m.event_type, m.n, m.med, m2.mad
             |FROM m JOIN m2 USING (event_type)
             |ORDER BY event_type""".stripMargin)),

    // ---- inter-arrival gap profile per event type: how bursty is each
    // stream — gaps between a user's consecutive events, bucketed by
    // ORDER OF MAGNITUDE via the decimal-digit count of the gap in
    // microseconds (length of the integer's decimal string: exact in
    // both engines, no float log10). ONE lead() window on the user_id
    // partitioning, then a map-side-combined fold to ≤ |types|×20
    // cells. All integers, no divide ----
    QuerySpec("q171_interarrival",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tsu"), col("event_id"))
        t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("tsu"), col("event_id"))
          .withColumn("gap", lead(col("tsu"), 1).over(w) - col("tsu"))
          .filter(col("gap").isNotNull && col("gap") > 0)
          .groupBy(col("event_type"),
            length(col("gap").cast("string")).as("gap_digits"))
          .agg(count(lit(1)).as("n"), min(col("gap")).as("min_gap"),
            max(col("gap")).as("max_gap"), sum(col("gap")).as("sum_gap"))
          .orderBy(col("event_type"), col("gap_digits"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tsu,
             |             event_id FROM events),
             |g AS (SELECT event_type,
             |        lead(tsu) OVER (PARTITION BY user_id
             |          ORDER BY tsu, event_id) - tsu AS gap
             |      FROM e)
             |SELECT event_type,
             |  CAST(length(CAST(gap AS VARCHAR)) AS INT) AS gap_digits,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(min(gap) AS BIGINT) AS min_gap,
             |  CAST(max(gap) AS BIGINT) AS max_gap,
             |  CAST(sum(gap) AS BIGINT) AS sum_gap
             |FROM g WHERE gap IS NOT NULL AND gap > 0
             |GROUP BY 1, 2 ORDER BY event_type, gap_digits""".stripMargin)),

    // ---- degree distribution of the co-purchase graph (the q97/q107
    // graph family's structural profile): node degrees fold from the
    // edge list, the histogram folds from degrees, share = ONE divide
    // against the broadcast node total. Degenerate-free scaling: both
    // folds are map-side combined; the histogram is ≤ max-degree rows ----
    QuerySpec("q172_degree_distribution",
      (s, dir) => {
        // ONE reference to the edge subtree: both endpoints explode
        // from the same pass — a union of e.select(u) and e.select(v)
        // would re-compute the whole co-purchase chain per branch
        // (caught by the exchange-budget gate: 13 exchanges vs 7)
        val deg = coPurchaseEdges(s, dir)
          .select(explode(array(col("u"), col("v"))).as("node"))
          .groupBy(col("node")).agg(count(lit(1)).as("degree"))
        // the histogram is ≤ max-degree rows; localCheckpoint so its
        // two references (rows + total) don't each re-run the whole
        // co-purchase edge computation (q153 discipline)
        val hist = deg.groupBy(col("degree"))
          .agg(count(lit(1)).as("n_nodes")).localCheckpoint()
        hist.crossJoin(broadcast(hist.agg(sum(col("n_nodes")).as("n_total"))))
          .select(col("degree"), col("n_nodes"), col("n_total"),
            (col("n_nodes").cast("double") / col("n_total").cast("double"))
              .as("share"))
          .orderBy(col("degree"))
      },
      Some(s"""WITH $CoPurchaseEdgeCtes,
             |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
             |        FROM (SELECT u AS node FROM e0
             |              UNION ALL SELECT v FROM e0)
             |        GROUP BY node),
             |h AS (SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
             |      FROM deg GROUP BY 1),
             |t0 AS (SELECT CAST(sum(n_nodes) AS BIGINT) AS n_total FROM h)
             |SELECT degree, n_nodes, n_total,
             |  CAST(n_nodes AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
             |FROM h CROSS JOIN t0 ORDER BY degree""".stripMargin)),

    // ---- lag-1 autocorrelation of daily volume per event type: is the
    // stream momentum-driven or mean-reverting — the time-series twin
    // of q156's trend. The daily fold is the only corpus-scale shuffle;
    // the (x_t, x_{t+1}) pairing is a lead over ≤ |days| rows per type.
    // Numerator and the two variance terms are EXACT integers; r is
    // the one float expression, the identical tree in both engines
    // (IEEE sqrt and divide are correctly rounded — deterministic on
    // exact operands) ----
    QuerySpec("q173_autocorr",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")),
              lit(java.sql.Date.valueOf("2024-01-01"))).as("d"))
          .agg(count(lit(1)).as("y"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
        val pairs = daily
          .withColumn("y2", lead(col("y"), 1).over(w))
          .filter(col("y2").isNotNull)
        val agg = pairs.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          sum(col("y")).as("sx"), sum(col("y2")).as("sy"),
          graft.functions.TryAgg.trySumExact(
            try_multiply(col("y"), col("y2"))).as("sxy"),
          graft.functions.TryAgg.trySumExact(
            try_multiply(col("y"), col("y"))).as("sxx"),
          graft.functions.TryAgg.trySumExact(
            try_multiply(col("y2"), col("y2"))).as("syy"),
          sum(col("y").cast("double") * col("y2")).as("sxyd"),
          sum(col("y").cast("double") * col("y")).as("sxxd"),
          sum(col("y2").cast("double") * col("y2")).as("syyd"))
        val num = try_subtract(try_multiply(col("n"), col("sxy")),
          try_multiply(col("sx"), col("sy")))
        val dx = try_subtract(try_multiply(col("n"), col("sxx")),
          try_multiply(col("sx"), col("sx")))
        val dy = try_subtract(try_multiply(col("n"), col("syy")),
          try_multiply(col("sy"), col("sy")))
        // the correlation's arithmetic runs in double space END TO
        // END: dedicated double-space sums sxyd/sxxd/syyd (exact below
        // 2^53, never overflowing), NOT the try_* Long aggregates — an
        // r derived from sxy/sxx/syy would go NULL on Σ overflow and
        // silently PARTIAL when a per-row product overflows (SUM skips
        // the try_multiply NULL). sx/sy stay exact Longs (sums of
        // daily counts, int64-safe). The Long r_num/dx/dy/sxy/sxx/syy
        // diagnostics ride try_* forms: exact while
        // int64-representable, NULL beyond (any overflowed row
        // poisons the fold via TryAgg) — never an abort
        val numd = col("n").cast("double") * col("sxyd") -
          col("sx").cast("double") * col("sy")
        val dxd = col("n").cast("double") * col("sxxd") -
          col("sx").cast("double") * col("sx")
        val dyd = col("n").cast("double") * col("syyd") -
          col("sy").cast("double") * col("sy")
        agg.select(col("event_type"), col("n"),
            num.as("r_num"), dx.as("dx"), dy.as("dy"),
            when(dxd === 0.0 || dyd === 0.0, lit(null).cast("double"))
              .otherwise(numd / (sqrt(dxd) * sqrt(dyd)))
              .as("r"))
          .orderBy(col("event_type"))
      },
      Some("""WITH d0 AS (
             |  SELECT event_type,
             |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
             |    CAST(count(*) AS BIGINT) AS y
             |  FROM events GROUP BY 1, 2),
             |p AS (SELECT event_type, y,
             |        lead(y) OVER (PARTITION BY event_type ORDER BY d)
             |          AS y2
             |      FROM d0),
             |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |        CAST(sum(y) AS BIGINT) AS sx,
             |        CAST(sum(y2) AS BIGINT) AS sy,
             |        CAST(sum(y * y2) AS BIGINT) AS sxy,
             |        CAST(sum(y * y) AS BIGINT) AS sxx,
             |        CAST(sum(y2 * y2) AS BIGINT) AS syy
             |      FROM p WHERE y2 IS NOT NULL GROUP BY 1)
             |SELECT event_type, n,
             |  n * sxy - sx * sy AS r_num,
             |  n * sxx - sx * sx AS dx,
             |  n * syy - sy * sy AS dy,
             |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
             |       THEN NULL
             |       ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
             |            (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
             |             sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
             |  END AS r
             |FROM a ORDER BY event_type""".stripMargin))
  )
}
