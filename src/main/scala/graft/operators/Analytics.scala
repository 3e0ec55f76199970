package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Q, Tables}

/** Core OLAP capabilities — the read side a report-worker database
  * serves (heatmaps, per-player summaries; ref mysql 01_tables.sql
  * idx_heatmap / idx_reportedID) expressed over the TPC-H-ish tables.
  *
  * Money math is decimal-exact end-to-end (cast BEFORE aggregation),
  * and every money OUTPUT column is integer cents (sum×100 → BIGINT;
  * ×10⁴ for scale-4 products): the values are identical to the
  * decimal forms, but integers traverse every hasher/arrow/float
  * conversion path byte-identically across engines — decimals do not
  * (r1 lesson: six value-exact queries hash-mismatched on DECIMAL
  * representation alone). All aggregates get map-side partial merge;
  * the dims in joins are broadcast.
  */
object Analytics {

  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  private val one = lit(1).cast(DecimalType(3, 2))
  /** disc price = extendedprice * (1 - discount), exact at scale 4. */
  private def discPrice: Column =
    dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))

  /** Exact decimal sum emitted as integer cents (BIGINT). */
  private def cents(c: Column): Column = (c * 100).cast("long")
  /** Exact scale-4 decimal sum emitted as integer ×10⁴ units. */
  private def u4(c: Column): Column = (c * 10000).cast("long")

  // ---------------------------------------------------------------- E1
  val q1Pricing: Q = Q(
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          cents(sum(dec2(col("l_quantity")))).as("sum_qty"),
          cents(sum(dec2(col("l_extendedprice")))).as("sum_base_price"),
          u4(sum(discPrice)).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) * 100 AS BIGINT)
      |    AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT)
      |    AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |           (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2))))
      |       * 10000 AS BIGINT) AS sum_disc_price,
      |  CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin)

  // ---------------------------------------------------------------- E2
  /** Top-k revenue per order for one segment — join + agg + limit.
    * Ties broken by o_orderkey for a total deterministic order.
    */
  val q3Topk: Q = Q(
    (s, dir) =>
      // SHUFFLE_HASH on both joins (r18 decade-leg catch: the default
      // SMJ sorted the 60M-row lineitem side at sf10 — 11.4 GB of
      // spill and a 1.7 measured exponent on an otherwise linear
      // query). The build sides are the FILTERED small relations
      // (segment-filtered customers, then the customer-joined orders
      // slice), each a fraction of the fact and partition-bounded, so
      // the fact streams through unsorted at any scale; the agg then
      // reuses the join's o_orderkey partitioning (group keys are a
      // superset), and the top-10 is a TakeOrdered, never a sort.
      Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .hint("shuffle_hash")
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .hint("shuffle_hash")
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(u4(sum(discPrice)).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10),
    """SELECT o_orderkey, o_orderdate,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |           (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2))))
      |       * 10000 AS BIGINT) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND o_orderkey = l_orderkey
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)

  // ---------------------------------------------------------------- E3
  /** Multi-way dim join: region ⋈ nation ⋈ customer ⋈ orders with the
    * small dims broadcast — on a cluster the fact never shuffles.
    */
  val q5Multijoin: Q = Q(
    (s, dir) =>
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_orders"),
          cents(sum(dec2(col("o_totalprice")))).as("total_price"))
        .orderBy("r_name", "n_name"),
    """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
      |    AS total_price
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)

  // ---------------------------------------------------------------- E4
  val wRunning: Q = Q(
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("running",
          cents(sum(dec2(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
        .select("o_custkey", "o_orderkey", "rn", "running")
        .orderBy("o_custkey", "rn")
    },
    """SELECT o_custkey, o_orderkey,
      |  CAST(row_number() OVER w AS BIGINT) AS rn,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    * 100 AS BIGINT) AS running
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, rn""".stripMargin)

  // ---------------------------------------------------------------- E5
  /** Gaps-and-islands sessionization (30-min gap) — the batch twin of
    * the streaming session state (SURVEY D5). Epoch math in exact
    * microseconds (unix_micros / epoch_us) on both sides.
    */
  val rSessionize: Q = Q(
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val gapUs = 1800L * 1000000L
      Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("new_sess",
          when(lag("us", 1).over(w).isNull ||
            col("us") - lag("us", 1).over(w) > gapUs, 1L).otherwise(0L))
        .withColumn("session_id",
          sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("event_id").as("first_event"),
          max("event_id").as("last_event"),
          min("ts").as("start_ts"), max("ts").as("end_ts"))
        .orderBy("user_id", "session_id")
    },
    """WITH g AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |s AS (
      |  SELECT user_id, event_id, ts,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_id
      |  FROM g)
      |SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
      |  min(event_id) AS first_event, max(event_id) AS last_event,
      |  min(ts) AS start_ts, max(ts) AS end_ts
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin)

  // ---------------------------------------------------------------- D2
  /** Micro-batch accounting (ref main.py:39-57 batches by size/time):
    * tumbling 1-hour windows per event type.
    */
  val rBatchStats: Q = Q(
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("batch_hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          min("event_id").as("min_event"), max("event_id").as("max_event"),
          cents(sum(dec2(col("value")))).as("sum_value"))
        .orderBy("batch_hour", "event_type"),
    """SELECT date_trunc('hour', ts) AS batch_hour, event_type,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  min(event_id) AS min_event, max(event_id) AS max_event,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS sum_value
      |FROM events GROUP BY date_trunc('hour', ts), event_type
      |ORDER BY batch_hour, event_type""".stripMargin)

  // ---------------------------------------------------------------- E6
  /** ROLLUP grouping sets: per-nation, per-region subtotal, grand
    * total in one pass (partial aggregation handles all levels
    * map-side). NULLS FIRST ordering pinned on both engines.
    */
  private val rollupSql =
    """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
      |    AS total_price
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  /** This one is dialect-clean ANSI, so the SAME text runs on Spark
    * SQL and on the DuckDB oracle — the engine's SQL front door
    * exercised directly. (The DataFrame rollup DSL trips Spark's
    * ambiguous-self-join check on the grouping columns.)
    */
  val qRollup: Q = Q(
    (s, dir) => {
      Seq("orders", "customer", "nation", "region")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(rollupSql)
    },
    rollupSql)

  // ---------------------------------------------------------------- E7
  /** As-of join, Spark-first: tag-union both sides, one window pass
    * carries the latest purchase id forward — O(n log n) per key and
    * a single shuffle, instead of the quadratic range join a naive
    * `p.ts <= e.ts` join would cost. For each event: the user's most
    * recent purchase at or before it.
    */
  val qAsof: Q = Q(
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(0L).as("kind"),
          col("event_id").as("orig_id"), col("event_id").as("purchase_id"))
      val evts = e.select(col("user_id"), col("ts"), lit(1L).as("kind"),
        col("event_id").as("orig_id"),
        lit(null).cast("long").as("purchase_id"))
      val w = Window.partitionBy("user_id").orderBy("ts", "kind", "orig_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      purchases.unionAll(evts)
        .withColumn("last_purchase_id",
          last("purchase_id", ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("orig_id").as("event_id"), col("user_id"), col("ts"),
          col("last_purchase_id"))
        .orderBy("event_id")
    },
    """WITH u AS (
      |  SELECT user_id, ts, 0 AS kind, event_id AS orig_id,
      |         event_id AS purchase_id
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, ts, 1 AS kind, event_id AS orig_id,
      |         NULL AS purchase_id
      |  FROM events)
      |SELECT orig_id AS event_id, user_id, ts, last_purchase_id FROM (
      |  SELECT *, last_value(purchase_id IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts, kind, orig_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS last_purchase_id
      |  FROM u)
      |WHERE kind = 1 ORDER BY event_id""".stripMargin)

  // ---------------------------------------------------------------- E8
  /** Two-stage salted aggregation — the skew-mitigation pattern for a
    * hot grouping key: stage 1 spreads each user's rows over 8 salt
    * shards (no one reducer owns a hot user), stage 2 merges the ≤8
    * partials per user. All the aggregates here are decomposable
    * (count→sum, sum→sum, min/max→min/max), so the result is
    * IDENTICAL to the direct groupBy — the oracle states the direct
    * form, making the equivalence the checked property. At 100 TB
    * this is what turns a hot-key stall into 8 even tasks when AQE's
    * skew handling can't reach the aggregation.
    */
  val qSaltedAgg: Q = Q(
    (s, dir) => {
      val partial = Tables.events(s, dir)
        .withColumn("salt", col("event_id") % 8L)
        .groupBy("user_id", "salt")
        .agg(count(lit(1)).as("pn"), sum(dec2(col("value"))).as("pv"),
          min("event_id").as("pmin"), max("event_id").as("pmax"))
      partial.groupBy("user_id")
        .agg(sum("pn").as("n_events"), cents(sum("pv")).as("sum_value"),
          min("pmin").as("first_event"), max("pmax").as("last_event"))
        .orderBy("user_id")
    },
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)
      |    AS sum_value,
      |  min(event_id) AS first_event, max(event_id) AS last_event
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)

  // ---------------------------------------------------------------- E10
  /** Interval attribution join — every same-user event inside the 6
    * hours after a purchase is attributed to it (the batch twin of
    * D8's stream-stream interval join, here oracle-hash-checked).
    * The user-id equality makes this a plain shuffled equi-join with
    * the time range as a post-condition, so per-key work is bounded
    * by that user's rows — no quadratic blowup, no bucketing needed.
    * When an interval join has NO equi key, use E11's bucket-explode
    * shape instead. Attributed value is summed in integer cents.
    */
  val qIntervalAttr: Q = Q(
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"), col("value"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          col("user_id").as("p_uid"), col("ts").as("pts"))
      val a = e.select(col("event_id").as("a_id"),
        col("user_id").as("a_uid"), col("ts").as("a_ts"),
        col("value").as("a_value"))
      p.join(a,
          col("p_uid") === col("a_uid") &&
            col("a_ts") >= col("pts") &&
            col("a_ts") < col("pts") + expr("INTERVAL 6 HOURS") &&
            col("a_id") =!= col("purchase_id"),
          "left")
        .groupBy(col("purchase_id"))
        .agg(count(col("a_id")).as("n_attr"),
          coalesce(cents(sum(dec2(col("a_value")))), lit(0L))
            .as("attr_value"))
        .orderBy("purchase_id")
    },
    """WITH p AS (
      |  SELECT event_id AS purchase_id, user_id, ts AS pts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT purchase_id, CAST(count(e.event_id) AS BIGINT) AS n_attr,
      |  coalesce(CAST(sum(CAST(e.value AS DECIMAL(12,2))) * 100
      |    AS BIGINT), 0) AS attr_value
      |FROM p LEFT JOIN events e
      |  ON e.user_id = p.user_id AND e.ts >= p.pts
      |  AND e.ts < p.pts + INTERVAL 6 HOUR
      |  AND e.event_id <> p.purchase_id
      |GROUP BY purchase_id ORDER BY purchase_id""".stripMargin)

  // ---------------------------------------------------------------- E11
  /** Band join WITHOUT an equi key — "events of the same type within
    * ±0.50 of each other's value" — the shape that naively plans as a
    * BroadcastNestedLoopJoin (O(n²) compares, the classic scale
    * killer). The fix: quantize to integer cents, bucket by the band
    * width, explode each probe row to its 3 neighbor buckets, and
    * equi-join on (type, bucket) — every true pair lands in exactly
    * one (probe-bucket = build-bucket) cell, so no dedup pass is
    * needed, and the compare count drops from n² to Σ bucket-pair
    * sizes. The oracle states the naive BETWEEN semantics; the
    * bucketed plan must reproduce it exactly (integer arithmetic end
    * to end, so it does).
    */
  private val BandCents = 50L

  val qBandJoin: Q = Q(
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          cents(dec2(col("value"))).as("vc"))
        .withColumn("bucket", expr(s"vc DIV $BandCents"))
      val probe = e.select(col("event_id"), col("event_type"), col("vc"),
        explode(array(col("bucket") - 1, col("bucket"),
          col("bucket") + 1)).as("pb"))
      val build = e.select(col("event_id").as("b_id"),
        col("event_type").as("b_type"), col("vc").as("b_vc"),
        col("bucket").as("bb"))
      probe.join(build,
          col("pb") === col("bb") &&
            col("event_type") === col("b_type") &&
            col("event_id") =!= col("b_id") &&
            abs(col("vc") - col("b_vc")) <= BandCents,
          "left")
        .groupBy(col("event_id"))
        .agg(count(col("b_id")).as("n_close"))
        .orderBy("event_id")
    },
    s"""WITH e AS (
       |  SELECT event_id, event_type,
       |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc
       |  FROM events)
       |SELECT a.event_id, CAST(count(b.event_id) AS BIGINT) AS n_close
       |FROM e a LEFT JOIN e b
       |  ON a.event_type = b.event_type AND a.event_id <> b.event_id
       |  AND abs(a.vc - b.vc) <= $BandCents
       |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin)

  // ---------------------------------------------------------------- E9
  /** CUBE grouping sets — all four (returnflag × linestatus)
    * marginals in one pass; like E6's ROLLUP the text is
    * dialect-clean ANSI, so the SAME statement runs on Spark SQL and
    * the oracle. Partial aggregation covers every grouping set
    * map-side.
    */
  private val cubeSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) * 100 AS BIGINT)
      |    AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
      .stripMargin

  val qCube: Q = Q(
    (s, dir) => {
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(cubeSql)
    },
    cubeSql)

  // ---------------------------------------------------------------- E12
  /** Pivoted status report — the cross-tab read every ops dashboard
    * serves (order counts + exact cents mass per nation, one column
    * group per order status, value list pinned to 'F'/'O'/'P' so the
    * output schema is static — a dashboard contract and a requirement
    * for the cross-engine oracle).
    *
    * Deliberately NOT `RelationalGroupedDataset.pivot`: even with the
    * value list supplied, Spark plans pivot as two-phase PivotFirst —
    * an aggregate on (group, pivot) keys, an Exchange, then a second
    * aggregate on the group key (verified against 4.1.2). Stating the
    * pivot as conditional aggregates compiles to ONE map-side-
    * combinable aggregate pass with a single Exchange on the group
    * key — half the shuffles for the identical result, and exactly
    * the portable CASE WHEN form the oracle states. Plan-audited.
    * Absent (nation, status) cells coalesce to 0 so the report is
    * total.
    */
  val qPivot: Q = Q(
    (s, dir) => {
      val joined = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
      val aggs = Seq("F", "O", "P").flatMap { st =>
        val sfx = st.toLowerCase
        Seq(
          sum(when(col("o_orderstatus") === st, 1L).otherwise(0L))
            .as(s"n_$sfx"),
          coalesce(cents(sum(when(col("o_orderstatus") === st,
            dec2(col("o_totalprice"))))), lit(0L)).as(s"cents_$sfx"))
      }
      joined.groupBy("n_name")
        .agg(aggs.head, aggs.tail: _*)
        .orderBy("n_name")
    },
    """SELECT n_name,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_f,
      |  CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F'
      |    THEN CAST(o_totalprice AS DECIMAL(12,2)) END) * 100, 0)
      |    AS BIGINT) AS cents_f,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_o,
      |  CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O'
      |    THEN CAST(o_totalprice AS DECIMAL(12,2)) END) * 100, 0)
      |    AS BIGINT) AS cents_o,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_p,
      |  CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P'
      |    THEN CAST(o_totalprice AS DECIMAL(12,2)) END) * 100, 0)
      |    AS BIGINT) AS cents_p
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin)

  // ---------------------------------------------------------------- E13
  /** Ordered conversion funnel view → click → purchase — the product-
    * analytics read (ClickHouse `windowFunnel`, Amplitude funnels)
    * over the events stream: for each user, the first view, the first
    * click strictly AFTER that view, and the first purchase strictly
    * after that click, plus the stage reached (1–3).
    *
    * Spark-first shape: each stage is a per-user conditional min — a
    * map-side-combinable groupBy — and every stage join hashes on the
    * SAME key (`user_id`) as the aggregations, so at 100 TB the fact
    * scan is filtered by event_type at the parquet reader and the
    * per-stage relations are |users| rows co-partitioned end to end
    * (no second wide shuffle; the stage tables are user-cardinality,
    * broadcastable when users ≪ events). No collect_list-and-sort per
    * user: state per user is three timestamps, not the event list.
    */
  val qFunnel: Q = Q(
    (s, dir) => {
      val e = Tables.events(s, dir).select("user_id", "ts", "event_type")
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("first_view"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") > col("first_view"))
        .groupBy("user_id").agg(min("ts").as("first_click"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") > col("first_click"))
        .groupBy("user_id").agg(min("ts").as("first_purchase"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("first_view"), col("first_click"),
          col("first_purchase"),
          (lit(1L) + when(col("first_click").isNotNull, 1L).otherwise(0L)
            + when(col("first_purchase").isNotNull, 1L).otherwise(0L))
            .as("funnel_stage"))
        .orderBy("user_id")
    },
    """WITH v AS (
      |  SELECT user_id, min(ts) AS first_view FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS first_click
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.first_view
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS first_purchase
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.first_click
      |  GROUP BY e.user_id)
      |SELECT v.user_id, v.first_view, c.first_click, p.first_purchase,
      |  CAST(1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
      |         + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
      |    AS funnel_stage
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |       LEFT JOIN p ON v.user_id = p.user_id
      |ORDER BY v.user_id""".stripMargin)

  // ---------------------------------------------------------------- E14
  /** Cohort retention matrix — the other canonical product-analytics
    * read: users grouped by signup week (ISO-Monday `date_trunc`,
    * identical on both engines), activity bucketed into integer week
    * offsets from each user's own cohort date, distinct active users
    * per (cohort_week, week_offset) cell. Week offsets are exact
    * integer day arithmetic (`datediff DIV 7`), never float.
    *
    * Scale shape: the signup cohort and the distinct (user, day)
    * activity relation both hash on `user_id`, the join is
    * co-partitioned with both aggregations, and the final cell count
    * is a two-phase distinct over a matrix that is at most
    * |cohort weeks| × |offsets| rows — tiny whatever the corpus.
    */
  val qRetention: Q = Q(
    (s, dir) => {
      val e = Tables.events(s, dir)
      val cohort = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(to_date(col("ts"))).as("cohort_date"))
      val act = e.select(col("user_id"), to_date(col("ts")).as("act_date"))
        .distinct()
      cohort.join(act, "user_id")
        .filter(col("act_date") >= col("cohort_date"))
        .select(
          date_trunc("week", col("cohort_date").cast("timestamp"))
            .cast("date").as("cohort_week"),
          expr("CAST(datediff(act_date, cohort_date) DIV 7 AS BIGINT)")
            .as("week_offset"),
          col("user_id"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_week", "week_offset")
    },
    """WITH cohort AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |act AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS act_date FROM events)
      |SELECT CAST(date_trunc('week', cohort_date) AS DATE) AS cohort_week,
      |  CAST((act_date - cohort_date) // 7 AS BIGINT) AS week_offset,
      |  CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_users
      |FROM cohort c JOIN act a ON c.user_id = a.user_id
      |WHERE act_date >= cohort_date
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)

  // ---------------------------------------------------------------- E15
  /** Fixed-bucket value histogram per event type — the distribution
    * panel every monitoring dashboard reads. Buckets are pure integer
    * arithmetic on cents (`least(vc DIV 1000, 9)`: 10 buckets of
    * $10, top bucket open) — no float binning, no width_bucket
    * dialect differences, hash-exact. One map-side-combinable
    * aggregation; bucket bounds are emitted so the report is
    * self-describing.
    */
  val qHistogram: Q = Q(
    (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), cents(dec2(col("value"))).as("vc"))
        .withColumn("bucket",
          least(expr("vc DIV 1000"), lit(9L)).cast("long"))
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("n_events"),
          min("vc").as("min_cents"), max("vc").as("max_cents"))
        .withColumn("bucket_lo_cents", col("bucket") * 1000L)
        .orderBy("event_type", "bucket"),
    """SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n_events,
      |  min(vc) AS min_cents, max(vc) AS max_cents,
      |  bucket * 1000 AS bucket_lo_cents
      |FROM (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc,
      |    least(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) // 1000,
      |      9) AS bucket
      |  FROM events)
      |GROUP BY event_type, bucket
      |ORDER BY event_type, bucket""".stripMargin)

  // ---------------------------------------------------------------- E16
  /** Spend-quartile assignment per user (`ntile(4)` over total spend,
    * ties broken by user_id for a total deterministic order) — the
    * segmentation read behind "top-quartile users". ntile semantics
    * (larger remainder buckets first) are ANSI-identical across
    * engines given the total order. The window is global but over the
    * ALREADY-AGGREGATED per-user relation (|users| rows, not events)
    * — the aggregation shuffles on user_id, the ranking sorts the
    * small rollup; at 100 TB with billions of users the exact ntile
    * swaps for approx_percentile cut points — [[ntileApprox]] below
    * IS that twin, window-free and spec-pinned.
    */
  val wNtile: Q = Q(
    (s, dir) => {
      val w = Window.orderBy(col("spend_cents").desc, col("user_id"))
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(cents(sum(dec2(col("value")))).as("spend_cents"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .orderBy(col("quartile"), col("spend_cents").desc, col("user_id"))
    },
    """SELECT user_id,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)
      |    AS spend_cents,
      |  CAST(ntile(4) OVER (ORDER BY
      |    sum(CAST(value AS DECIMAL(12,2))) * 100 DESC, user_id)
      |    AS BIGINT) AS quartile
      |FROM events WHERE event_type = 'purchase'
      |GROUP BY user_id
      |ORDER BY quartile, spend_cents DESC, user_id""".stripMargin)

  /** E16's 100 TB twin, BUILT (the statsHistApprox stance): the
    * EXACT ntile(4) must rank the whole per-user rollup through one
    * global WindowExec — the codebase's single global window,
    * acceptable at |users| rows but not at billions. This twin
    * replaces the ranking with three sketch-trained spend CUT POINTS
    * (approx_percentile at 1e-4 rank error over the same rollup —
    * map-side-combinable, no sort anywhere) and a map-only comparison
    * fold: quartile = 4 − |{cut < spend}| (quartile 1 = top
    * spenders, matching the DESC ntile). Rank-based and value-based
    * quartiles agree everywhere except users tied AT a cut point
    * (ntile forces equal bucket SIZES; a value cut cannot split a
    * tie), so the spec pins per-user agreement up to boundary ties
    * and exact bucket-size tolerance. Sketches are engine-specific ⇒
    * ScalaTest-gated, not oracle-gated.
    */
  def ntileApprox(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(cents(sum(dec2(col("value")))).as("spend_cents"))
    val cuts = spend.agg(transform(
      expr("approx_percentile(spend_cents, array(0.25, 0.5, 0.75), 10000)"),
      q => floor(q).cast("long")).as("qs")).head().getSeq[Long](0)
    val cutArr = if (cuts == null) Array.empty[Long] else cuts.toArray
    spend.withColumn("quartile", cutArr.foldLeft(lit(4L))((acc, c) =>
        acc - when(col("spend_cents") > c, 1L).otherwise(0L)))
      .orderBy(col("quartile"), col("spend_cents").desc, col("user_id"))
  }

  // ---------------------------------------------------------------- E17
  /** Trailing-hour activity per event — the RANGE-frame window (value
    * ranges, not row counts: `RANGE BETWEEN <1h of µs> PRECEDING AND
    * CURRENT ROW`), the frame type behind rate-limiting, rolling
    * velocity, and fraud-burst features. Stated over exact integer
    * microseconds on both engines so frame membership is bit-exact;
    * RANGE includes all ts-peers symmetrically, so the result is
    * deterministic regardless of peer order. Key-partitioned window,
    * one shuffle on user_id.
    */
  val wTrailing: Q = Q(
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("us")
        .rangeBetween(-3599999999L, 0)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), dec2(col("value")).as("v"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("cents_1h", cents(sum("v").over(w)))
        .select("event_id", "user_id", "us", "n_1h", "cents_1h")
        .orderBy("event_id")
    },
    """SELECT event_id, user_id, epoch_us(ts) AS us,
      |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w * 100 AS BIGINT)
      |    AS cents_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin)

  // --------------------------------------------------------------- E18
  /** DAU / MAU stickiness — the product-analytics ratio (what share of
    * the monthly actives showed up today) every engagement dashboard
    * leads with. The naive form is a rolling COUNT(DISTINCT) over a
    * 28-day RANGE window — a global sort plus per-frame distinct that
    * dies at 100 TB. Restated distributively: pre-distinct (day, user)
    * once, then each active day FANS OUT to the 28 window-end days it
    * contributes to (a bounded 28× map-only explode of the already
    * day-collapsed relation), and MAU is a plain map-side-combinable
    * count per window-end after a second distinct. No window function,
    * no range join, shuffle keyed by day — the aggregation tree a
    * 1000-executor cluster wants. Days are emitted only where DAU
    * exists (an inner join back), and the ratio is integer bp.
    */
  val qStickiness: Q = Q(
    (s, dir) => {
      val du = Tables.events(s, dir)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
      val mau = du
        .select(explode(sequence(col("day"), date_add(col("day"), 27)))
          .as("day"), col("user_id"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("mau"))
      dau.join(mau, Seq("day"))
        .select(col("day"), col("dau"), col("mau"),
          expr("dau * 10000 DIV mau").as("stickiness_bp"))
        .orderBy("day")
    },
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |dau AS (
      |  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY day),
      |fan AS (
      |  SELECT DISTINCT day + CAST(o AS INT) AS day, user_id
      |  FROM du, unnest(range(28)) AS u(o)),
      |mau AS (
      |  SELECT day, CAST(count(*) AS BIGINT) AS mau FROM fan GROUP BY day)
      |SELECT dau.day AS day, dau.dau AS dau, mau.mau AS mau,
      |  dau.dau * 10000 // mau.mau AS stickiness_bp
      |FROM dau JOIN mau USING (day)
      |ORDER BY day""".stripMargin)

  // --------------------------------------------------------------- E19
  /** Top event paths — the "what do users actually do" query behind
    * every product-analytics path/Sankey view: each user's events in
    * (ts, event_id) total order yield their consecutive 3-step
    * sequences, counted corpus-wide, top 10 by frequency with full
    * lexicographic tie-break so the cut is deterministic.
    *
    * Scale shape: the sequence window is PARTITIONED BY user_id (the
    * key-local sort a cluster distributes; never a global one), the
    * triple count is map-side combinable, and the final top-10 is a
    * TakeOrdered tree-reduce — the same three-stage shape as q3_topk
    * over a window instead of a join.
    */
  val qPaths: Q = Q(
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
        .withColumn("step2", lead("event_type", 1).over(w))
        .withColumn("step3", lead("event_type", 2).over(w))
        .filter(col("step2").isNotNull && col("step3").isNotNull)
        .groupBy(col("event_type").as("step1"), col("step2"), col("step3"))
        .agg(count(lit(1)).as("n_paths"))
        .orderBy(col("n_paths").desc, col("step1"), col("step2"),
          col("step3"))
        .limit(10)
    },
    """WITH seq AS (
      |  SELECT event_type AS step1,
      |    lead(event_type, 1) OVER w AS step2,
      |    lead(event_type, 2) OVER w AS step3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id
      |    ORDER BY epoch_us(ts), event_id))
      |SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n_paths
      |FROM seq WHERE step2 IS NOT NULL AND step3 IS NOT NULL
      |GROUP BY step1, step2, step3
      |ORDER BY n_paths DESC, step1, step2, step3
      |LIMIT 10""".stripMargin)

  // --------------------------------------------------------------- E20
  /** ANALYZE-style table statistics — the (n_rows, per-column
    * non-null / NDV / min / max) relation a cost-based optimizer eats
    * and every lake catalog materializes. Plan shape matters more
    * than it looks: a single aggregate with one countDistinct PER
    * column plans through Expand — the fact's rows multiply by the
    * column count before the shuffle (measured 5× slower here).
    * The union-of-branches form below scans once per column instead,
    * and COLUMNAR pruning makes each branch a one-column read, so
    * total bytes ≈ one full-width scan while every branch keeps the
    * cheap 2-phase single-distinct plan. At real corpus scale the
    * exact NDV swaps for approx_count_distinct — [[tableStatsApprox]]
    * below IS that twin, and it also collapses the 8 scans into one
    * (HLL has no Expand trap); here NDV is exact so the oracle can
    * gate it. min/max surface as strings so one schema carries every
    * type.
    */
  private val statCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_returnflag", "l_linestatus", "l_shipday")

  val qTableStats: Q = Q(
    (s, dir) => {
      def li = Tables.lineitem(s, dir)
        .withColumn("l_shipday", to_date(col("l_shipdate")))
      val nRows = li.agg(count(lit(1)).as("n_rows"))
      statCols.map { c =>
        li.agg(count(col(c)).as("n_nonnull"),
            countDistinct(col(c)).as("ndv"),
            min(col(c)).cast("string").as("min_val"),
            max(col(c)).cast("string").as("max_val"))
          .select(lit(c).as("col_name"), col("n_nonnull"), col("ndv"),
            col("min_val"), col("max_val"))
      }.reduce(_.unionAll(_))
        .crossJoin(broadcast(nRows))
        .select(col("col_name"), col("n_rows"), col("n_nonnull"),
          col("ndv"), col("min_val"), col("max_val"))
        .orderBy("col_name")
    }, {
      val perCol = statCols.map { c =>
        s"""SELECT '$c' AS col_name, n.n_rows AS n_rows,
           |  CAST(count($c) AS BIGINT) AS n_nonnull,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
           |  CAST(min($c) AS VARCHAR) AS min_val,
           |  CAST(max($c) AS VARCHAR) AS max_val
           |FROM li, n GROUP BY n.n_rows""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH li AS (
         |  SELECT *, CAST(l_shipdate AS DATE) AS l_shipday FROM lineitem),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM li)
         |$perCol
         |ORDER BY col_name""".stripMargin
    })

  /** E20's 100 TB twin, BUILT (the statsHistApprox stance): exact NDV
    * becomes `approx_count_distinct` (HLL++ at 2% rsd) — and the plan
    * SHAPE flips, not just the aggregate: the exact form needs one
    * scan PER column because multi-countDistinct in a single
    * aggregate plans through Expand (rows × column-count before the
    * shuffle); HLL sketches have no distinct-expansion at all — every
    * column's sketch merges map-side in ONE full-width scan and one
    * single-row shuffle, then the 7-row stats relation unpivots from
    * the 1-row aggregate map-only. At 100 TB that is 1 pass instead
    * of 8. Row counts / non-null / min / max are EXACT (spec-pinned
    * equal to E20); NDV is the sketch estimate (spec-pinned within
    * tolerance) — sketches are engine-specific, so ScalaTest gates
    * this twin, not the oracle.
    */
  def tableStatsApprox(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .withColumn("l_shipday", to_date(col("l_shipdate")))
    val aggs = count(lit(1)).as("n_rows") +: statCols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        approx_count_distinct(col(c), 0.02).as(s"ndv_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    li.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(statCols.map(c =>
        struct(lit(c).as("col_name"), col("n_rows"),
          col(s"nn_$c").as("n_nonnull"), col(s"ndv_$c").as("ndv"),
          col(s"min_$c").as("min_val"), col(s"max_$c").as("max_val"))): _*))
        .as("r"))
      .select("r.*")
      .orderBy("col_name")
  }

  // --------------------------------------------------------------- E21
  /** Skew diagnostic — the per-key frequency report that DECIDES the
    * E8 salting / AQE-skew-join treatment: heaviest join keys with
    * their corpus share in bp. One map-side-combinable count, one
    * broadcast total, a TakeOrdered top-10 — the report itself must
    * not be skew-shaped, and isn't. On a cluster this runs over a
    * sample or the previous load's key histogram; semantics are
    * identical.
    */
  val qSkewKeys: Q = Q(
    (s, dir) => {
      val e = Tables.events(s, dir)
      val tot = e.agg(count(lit(1)).as("n_total"))
      e.groupBy("user_id").agg(count(lit(1)).as("n_events"))
        .crossJoin(broadcast(tot))
        .select(col("user_id"), col("n_events"),
          expr("n_events * 10000 DIV n_total").as("share_bp"))
        .orderBy(col("n_events").desc, col("user_id"))
        .limit(10)
    },
    """WITH c AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY user_id),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM events)
      |SELECT user_id, n_events, n_events * 10000 // n_total AS share_bp
      |FROM c, t ORDER BY n_events DESC, user_id LIMIT 10""".stripMargin)

  // --------------------------------------------------------------- E22
  /** RFM customer segmentation — recency / frequency / monetary, the
    * marketing-analytics staple. Each dimension scores 0/1/2 against
    * broadcast scalar thresholds (±25% of the corpus mean — the same
    * no-global-sort stance as H19's buckets; the classic quintile cut
    * is a global ntile, which is a single-partition sort at scale),
    * recency inverted (fewer days since last order = better).
    * `rfm_code` = r·100 + f·10 + m, so 222 is the best segment.
    * Money stays decimal-exact until the integer-cents emit; one
    * shuffle on custkey, two broadcast scalars.
    */
  val qRfm: Q = Q(
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val cust = o.groupBy("o_custkey")
        .agg(max(to_date(col("o_orderdate"))).as("last_day"),
          count(lit(1)).as("n_orders"),
          cents(sum(dec2(col("o_totalprice")))).as("m_cents"))
      val anchor = o.agg(max(to_date(col("o_orderdate"))).as("anchor"))
      val rfm = cust.crossJoin(broadcast(anchor))
        .withColumn("r_days",
          datediff(col("anchor"), col("last_day")).cast("long"))
      val means = rfm.agg(
        expr("sum(r_days) DIV count(*)").as("mean_r"),
        expr("sum(n_orders) DIV count(*)").as("mean_f"),
        expr("sum(m_cents) DIV count(*)").as("mean_m"))
      def score(c: String, mean: String, invert: Boolean): Column = {
        val hi = col(c) * 4 >= col(mean) * 5
        val lo = col(c) * 4 < col(mean) * 3
        if (invert) when(lo, 2L).when(hi, 0L).otherwise(1L)
        else when(hi, 2L).when(lo, 0L).otherwise(1L)
      }
      rfm.crossJoin(broadcast(means))
        .select(col("o_custkey").as("custkey"), col("r_days"),
          col("n_orders"), col("m_cents"),
          (score("r_days", "mean_r", invert = true) * 100 +
            score("n_orders", "mean_f", invert = false) * 10 +
            score("m_cents", "mean_m", invert = false)).as("rfm_code"))
        .orderBy("custkey")
    },
    """WITH cust AS (
      |  SELECT o_custkey,
      |    max(CAST(o_orderdate AS DATE)) AS last_day,
      |    CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
      |      AS m_cents
      |  FROM orders GROUP BY o_custkey),
      |a AS (SELECT max(CAST(o_orderdate AS DATE)) AS anchor FROM orders),
      |rfm AS (
      |  SELECT o_custkey, n_orders, m_cents,
      |    CAST(date_diff('day', last_day, anchor) AS BIGINT) AS r_days
      |  FROM cust, a),
      |m AS (
      |  SELECT sum(r_days) // count(*) AS mean_r,
      |    sum(n_orders) // count(*) AS mean_f,
      |    sum(m_cents) // count(*) AS mean_m
      |  FROM rfm)
      |SELECT o_custkey AS custkey, r_days, n_orders, m_cents,
      |  CAST((CASE WHEN r_days * 4 < mean_r * 3 THEN 2
      |        WHEN r_days * 4 >= mean_r * 5 THEN 0 ELSE 1 END) * 100 +
      |  (CASE WHEN n_orders * 4 >= mean_f * 5 THEN 2
      |        WHEN n_orders * 4 < mean_f * 3 THEN 0 ELSE 1 END) * 10 +
      |  (CASE WHEN m_cents * 4 >= mean_m * 5 THEN 2
      |        WHEN m_cents * 4 < mean_m * 3 THEN 0 ELSE 1 END)
      |    AS BIGINT) AS rfm_code
      |FROM rfm, m
      |ORDER BY custkey""".stripMargin)

  // --------------------------------------------------------------- E23
  /** Latency distribution in power-of-two buckets — the quantile-free
    * histogram a latency dashboard actually renders (p50/p99 need a
    * global sort or a non-oracle-able sketch; log2 buckets need
    * neither): per purchase, seconds since the user's previous event,
    * bucketed by the LENGTH OF THE BINARY REPRESENTATION (`bin()` —
    * bucket k covers [2^(k-1), 2^k), pure integer, bit-identical in
    * both engines where floating log2 is not). The lag window is
    * user-partitioned; the bucket agg is map-side combinable — at
    * 100 TB this is one key-local sort plus a ~64-row reduce.
    */
  val qLatencyHist: Q = Q(
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag("us", 1).over(w))
        .filter(col("event_type") === "purchase" &&
          col("prev_us").isNotNull)
        .withColumn("lat_s", expr("(us - prev_us) DIV 1000000"))
        .withColumn("bucket", length(expr("bin(lat_s)")).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min("lat_s").as("min_lat_s"),
          max("lat_s").as("max_lat_s"))
        .orderBy("bucket")
    },
    """WITH g AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events),
      |lat AS (
      |  SELECT (us - prev_us) // 1000000 AS lat_s FROM g
      |  WHERE event_type = 'purchase' AND prev_us IS NOT NULL)
      |SELECT CAST(length(bin(lat_s)) AS BIGINT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n,
      |  min(lat_s) AS min_lat_s, max(lat_s) AS max_lat_s
      |FROM lat GROUP BY bucket ORDER BY bucket""".stripMargin)

  // --------------------------------------------------------------- E24
  /** Equi-depth histogram over order value — the table-stats companion
    * E20's min/max rows cannot express: selectivity estimation on a
    * skewed value column needs equal-DEPTH buckets, not equal-width
    * ones. Two passes, both cluster-shaped: pass 1 computes the 7
    * inner octile boundaries with `percentile` (Spark ≡ DuckDB
    * `quantile_cont` linear interpolation — the H9 contract — floored
    * to integer cents so every later comparison is exact integer);
    * pass 2 broadcasts the 7-long boundary array and assigns every row
    * its bucket with one comparison fold (map-only, values equal to a
    * boundary fall LOW) before a map-side-combinable count/min/max.
    * No global sort anywhere. At 100 TB pass 1 swaps to
    * approx_percentile (boundaries are estimates by nature) —
    * [[statsHistApprox]] below IS that built, spec-pinned twin over
    * the E27 multi-column generalization, this same orders-cents
    * column included; pass 2 is unchanged — this two-pass
    * boundary-broadcast shape is how a lake catalog actually builds
    * its histograms.
    */
  private val octiles = "0.125,0.25,0.375,0.5,0.625,0.75,0.875"

  val qEquidepth: Q = Q(
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .select(cents(dec2(col("o_totalprice"))).as("v"))
      val bounds = o.agg(
        transform(expr(s"percentile(v, array($octiles))"),
          q => floor(q).cast("long")).as("qs"))
      o.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          aggregate(col("qs"), lit(1L),
            (acc, q) => acc + when(col("v") > q, 1L).otherwise(0L)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_orders"),
          min("v").as("lo_cents"), max("v").as("hi_cents"))
        .orderBy("bucket")
    },
    s"""WITH o AS (
       |  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
       |    AS v FROM orders),
       |b AS (
       |  SELECT list_transform(quantile_cont(v, [$octiles]),
       |    q -> CAST(floor(q) AS BIGINT)) AS qs FROM o)
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n_orders,
       |  min(v) AS lo_cents, max(v) AS hi_cents
       |FROM (
       |  SELECT v,
       |    CAST(1 + len(list_filter(qs, q -> v > q)) AS BIGINT) AS bucket
       |  FROM o, b)
       |GROUP BY bucket ORDER BY bucket""".stripMargin)

  // --------------------------------------------------------------- E25
  /** Daily-volume anomaly flags — the "did ingest spike or stall"
    * monitoring panel, stated without sqrt or floats: with n days,
    * S = Σc, Q = Σc², day c is a two-sigma outlier iff
    * |c·n − S| > 2·n·σ ⇔ (c·n − S)² > 4·(n·Q − S²) — Chebyshev's test
    * cross-multiplied into pure integer arithmetic (a float σ would
    * put an un-oracle-able sqrt on the flag boundary). The squared
    * terms run in DECIMAL(38,0) / HUGEINT (the t_char_gini overflow
    * lesson): a corpus of 1e9-event days at n=10⁴ days keeps
    * (c·n−S)² ≈ 1e26 comfortably inside 38 digits where BIGINT wraps.
    * Deviation is emitted as |dev| in bp of the mean plus its sign,
    * so integer division truncates identically on both engines (DIV
    * truncates toward zero, DuckDB's // floors — they agree only on
    * non-negatives). One map-side-combinable day count, one 3-scalar
    * broadcast, one map-only flag pass — nothing here is corpus-
    * or even day-count-shaped.
    */
  val qAnomaly: Q = Q(
    (s, dir) => {
      val d38 = DecimalType(38, 0)
      val days = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val stats = days.agg(count(lit(1)).as("n"), sum("c").as("s"),
        sum(col("c") * col("c")).as("q"))
      days.crossJoin(broadcast(stats))
        .withColumn("dev", col("c") * col("n") - col("s"))
        .select(col("day"), col("c").as("n_events"),
          signum(col("dev")).cast("long").as("dev_sign"),
          expr("abs(dev) * 10000 DIV s").as("abs_dev_bp"),
          when(col("dev").cast(d38) * col("dev").cast(d38) >
            (col("n").cast(d38) * col("q").cast(d38) -
              col("s").cast(d38) * col("s").cast(d38)) * 4, 1L)
            .otherwise(0L).as("is_outlier"))
        .orderBy("day")
    },
    """WITH d AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY day),
      |st AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
      |  FROM d)
      |SELECT day, c AS n_events,
      |  CAST(sign(c * n - s) AS BIGINT) AS dev_sign,
      |  CAST(abs(c * n - s) * 10000 // s AS BIGINT) AS abs_dev_bp,
      |  CAST(CASE WHEN CAST(c * n - s AS HUGEINT) * (c * n - s) >
      |    4 * (CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
      |    THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
      |FROM d, st ORDER BY day""".stripMargin)

  // --------------------------------------------------------------- E26
  /** Per-user event leaderboard — k best rows per key, stated in the
    * VANILLA window idiom (row_number over a partition, filter, drop
    * the rank — no graft-specific API at all) and still executed by
    * the [[graft.plans.PerKeyTopK]] whole-operator extension: the
    * generic rank-limit rewrite (plans/TopK.scala) recognizes the
    * pattern without any marker opt-in, replacing sort + window +
    * filter with bounded per-key heaps and a map-side shrink to
    * ≤ keys·k rows before the shuffle. The un-rewritten plan is the
    * identical window form — same rows — so the oracle is plain ANSI
    * row_number; PlanAuditSpec pins that the rewrite actually fired
    * on this un-marked query. The reference's "latest report per
    * entity" upsert reads (ref src/db/report.py:170-314) are k=1 of
    * exactly this operator.
    */
  val qUserTopk: Q = Q(
    (s, dir) => {
      graft.plans.TopK.enable(s)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      Tables.events(s, dir)
        .select("user_id", "event_id", "event_type", "value")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn")
        .orderBy("user_id", "event_id")
    },
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY value DESC NULLS LAST, event_id) AS rn
      |  FROM events) WHERE rn <= 3
      |ORDER BY user_id, event_id""".stripMargin)

  /** E26's TIE-AWARE sibling: `rank() <= k` — "the top two value
    * buckets per user, boundary ties kept whole". rank's contract
    * differs from row_number's exactly at the boundary: every row
    * tying the k-th is retained, so no tiebreak column is needed for
    * a deterministic OUTPUT SET (the set is closed under ties — the
    * reference's NOT-EXISTS dedup reads have this shape). The rewrite
    * (plans/TopK.scala) recognizes the rank window the same way and
    * plans the tie-retaining heap — still O(n log k) with memory
    * k + boundary-tie-group, which is output-sized, not overhead.
    * Ranking on `floor(value / 100)` (a handful of coarse buckets) makes ties pervasive rather than
    * incidental, so the oracle genuinely exercises the retention
    * contract.
    */
  val qUserTopkRank: Q = Q(
    (s, dir) => {
      graft.plans.TopK.enable(s)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(floor(col("value") / 100).desc_nulls_last)
      Tables.events(s, dir)
        .select("user_id", "event_id", "event_type", "value")
        .withColumn("rk", rank().over(w))
        .filter(col("rk") <= 2).drop("rk")
        .orderBy("user_id", "event_id")
    },
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    rank() OVER (PARTITION BY user_id
      |      ORDER BY CAST(floor(value / 100) AS BIGINT) DESC NULLS LAST) AS rk
      |  FROM events) WHERE rk <= 2
      |ORDER BY user_id, event_id""".stripMargin)

  /** The third member of the rank-family trilogy:
    * `dense_rank() <= k` — "every row in the top two value BUCKETS
    * per user, however many rows each bucket holds". The boundary is
    * the k-th distinct sort key, so whole value groups are retained;
    * the rewrite plans the dense heap (k distinct-key
    * representatives in a TreeSet beside the row heap — O(log k)
    * membership, worst value group evicted whole). Contrast pinned
    * by the spec: on the same buckets, dense keeps ≥ rank keeps ≥
    * row_number keeps.
    */
  val qUserTopkDense: Q = Q(
    (s, dir) => {
      graft.plans.TopK.enable(s)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(floor(col("value") / 100).desc_nulls_last)
      Tables.events(s, dir)
        .select("user_id", "event_id", "event_type", "value")
        .withColumn("dr", dense_rank().over(w))
        .filter(col("dr") <= 2).drop("dr")
        .orderBy("user_id", "event_id")
    },
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    dense_rank() OVER (PARTITION BY user_id
      |      ORDER BY CAST(floor(value / 100) AS BIGINT) DESC NULLS LAST) AS dr
      |  FROM events) WHERE dr <= 2
      |ORDER BY user_id, event_id""".stripMargin)

  // --------------------------------------------------------------- E27
  /** The catalog's equi-depth histogram TABLE — E24 generalized to
    * the multi-column artifact a cost-based optimizer stores beside
    * E20's row/NDV panel: one 8-bucket equal-height histogram per
    * profiled column, emitted as a single relation keyed by column
    * name (the shape a lake catalog materializes at ANALYZE time and
    * selectivity estimation reads forever after). The octile
    * BOUNDARIES are trained once per (session, corpus) and held in
    * [[graft.Artifacts]] (3 columns × 7 longs — the codebook stance),
    * so each column's histogram pass is a map-only bucket fold over a
    * single-column pruned scan plus an 8-row map-side-combinable
    * aggregate; nothing sorts, nothing row-shaped crosses the driver.
    * All-integer (cents / floored quantities) so the whole relation
    * oracle-gates; the approx_percentile boundary training for the
    * 100 TB regime is [[statsHistApprox]], built and spec-pinned
    * below.
    */
  private def histProfile(s: SparkSession, dir: String)
      : Seq[(String, DataFrame, Column)] = Seq(
    ("l_quantity", Tables.lineitem(s, dir),
      floor(col("l_quantity")).cast("long")),
    ("o_totalprice_cents", Tables.orders(s, dir),
      cents(dec2(col("o_totalprice")))),
    ("value_cents", Tables.events(s, dir), cents(dec2(col("value")))))

  private val histBoundsCache =
    graft.Artifacts.cache[Map[String, Array[Long]]]("analytics.histBounds")

  /** Train one column's octile boundaries with the given quantile
    * SQL function (`percentile` exact / `approx_percentile` sketch).
    * Null-safe: an empty or all-null column trains ZERO boundaries,
    * so its histogram degrades to one bucket instead of crashing the
    * whole catalog pass.
    */
  private def trainBounds(df: DataFrame, v: Column,
      quantileCall: String): Array[Long] = {
    val qs = df.select(v.as("v"))
      .agg(transform(expr(quantileCall), q => floor(q).cast("long"))
        .as("qs"))
      .head().getSeq[Long](0)
    if (qs == null) Array.empty else qs.toArray
  }

  private def histBounds(s: SparkSession, dir: String)
      : Map[String, Array[Long]] =
    histBoundsCache.getOrElseUpdate(s, dir)(
      graft.sources.ArtifactStore.materializeValue(s,
        "analytics.histBounds", dir)(
        histProfile(s, dir).map { case (name, df, v) =>
          name -> trainBounds(df, v, s"percentile(v, array($octiles))")
        }.toMap) { v =>
        // empty bound arrays round-trip via a pos=-1 marker row
        val sp = s; import sp.implicits._
        v.toSeq.flatMap { case (n, arr) =>
          if (arr.isEmpty) Seq((n, -1, 0L))
          else arr.zipWithIndex.map { case (b, i) => (n, i, b) }
        }.toDF("name", "pos", "bound")
      } { df =>
        df.collect()
          .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
          .groupBy(_._1).map { case (n, rows) =>
            n -> rows.filter(_._2 >= 0).sortBy(_._2).map(_._3).toArray }
      })

  /** The histogram relation under a trained bounds map — shared by
    * the oracle-gated exact form and the approx scale twin.
    */
  private def histRelation(s: SparkSession, dir: String,
      bounds: Map[String, Array[Long]]): DataFrame =
    histProfile(s, dir).map { case (name, df, v) =>
      val bs = bounds(name)
      df.select(v.as("v"))
        .withColumn("bucket", bs.foldLeft(lit(1L))((acc, q) =>
          acc + when(col("v") > q, 1L).otherwise(0L)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"),
          min("v").as("lo"), max("v").as("hi"))
        .select(lit(name).as("col_name"), col("bucket"),
          col("n_rows"), col("lo"), col("hi"))
    }.reduce(_.unionAll(_))
      .orderBy("col_name", "bucket")

  /** E27's 100 TB path, BUILT (the H9-twin stance): boundaries from
    * `approx_percentile` (GK sketch, rank error ≤ 1e-4) instead of
    * the exact interpolating `percentile` — per-column training state
    * O(1/eps · log(eps·N)) and fully map-side-combinable, where the
    * exact form materializes each column's value multiset in one
    * aggregation. The bucket-assignment pass is byte-identical to the
    * exact form (same fold, same trained-artifact shape). Sketch
    * values are engine-specific ⇒ ScalaTest-gated against the exact
    * histogram (QueriesSpec), not oracle-gated.
    */
  def statsHistApprox(s: SparkSession, dir: String): DataFrame =
    histRelation(s, dir,
      histProfile(s, dir).map { case (name, df, v) =>
        name -> trainBounds(df, v,
          s"approx_percentile(v, array($octiles), 10000)")
      }.toMap)

  val qStatsHist: Q = Q(
    (s, dir) => histRelation(s, dir, histBounds(s, dir)), {
      def block(i: Int, name: String, src: String): String =
        s"""s$i AS MATERIALIZED ($src),
           |b$i AS (SELECT list_transform(quantile_cont(v, [$octiles]),
           |  q -> CAST(floor(q) AS BIGINT)) AS qs FROM s$i),
           |h$i AS (
           |  SELECT '$name' AS col_name, bucket,
           |    CAST(count(*) AS BIGINT) AS n_rows,
           |    min(v) AS lo, max(v) AS hi
           |  FROM (SELECT v,
           |      CAST(1 + len(list_filter(qs, q -> v > q)) AS BIGINT)
           |        AS bucket
           |    FROM s$i, b$i)
           |  GROUP BY bucket)""".stripMargin
      val blocks = Seq(
        block(1, "l_quantity",
          "SELECT CAST(floor(l_quantity) AS BIGINT) AS v FROM lineitem"),
        block(2, "o_totalprice_cents",
          "SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100" +
            " AS BIGINT) AS v FROM orders"),
        block(3, "value_cents",
          "SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100" +
            " AS BIGINT) AS v FROM events")).mkString(",\n")
      s"""WITH $blocks
         |SELECT * FROM (
         |  SELECT * FROM h1 UNION ALL
         |  SELECT * FROM h2 UNION ALL
         |  SELECT * FROM h3)
         |ORDER BY col_name, bucket""".stripMargin
    })

  // --------------------------------------------------------------- E28
  /** Promo revenue share per ship month — the TPC-H Q14 shape, and
    * the first consumer of the `part` dimension: lineitem ⋈
    * broadcast(part) (a 2-column pruned dim read), revenue exact at
    * decimal scale 4, share emitted in integer bp (promo·10⁴ DIV
    * total — no float division to drift cross-engine). One broadcast
    * join + one month-keyed map-side-combinable aggregation: the fact
    * table is read once and never shuffled except on ~month-count
    * grouped rows. Oracle-gated.
    */
  val qPromoShare: Q = Q(
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_shipdate"), discPrice.as("rev"))
      li.join(broadcast(
          Tables.part(s, dir).select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(date_trunc("month", col("l_shipdate")).cast("date")
          .as("ship_month"))
        .agg(count(lit(1)).as("n_items"),
          u4(coalesce(sum(when(col("p_type") === "PROMO", col("rev"))),
            lit(0).cast(DecimalType(16, 4)))).as("promo_u4"),
          u4(sum(col("rev"))).as("total_u4"))
        .withColumn("promo_bp", expr("promo_u4 * 10000 DIV total_u4"))
        .orderBy("ship_month")
    },
    """SELECT ship_month, n_items, promo_u4, total_u4,
      |  promo_u4 * 10000 // total_u4 AS promo_bp
      |FROM (
      |  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
      |    CAST(count(*) AS BIGINT) AS n_items,
      |    CAST(coalesce(sum(CASE WHEN p_type = 'PROMO' THEN rev END), 0)
      |         * 10000 AS BIGINT) AS promo_u4,
      |    CAST(sum(rev) * 10000 AS BIGINT) AS total_u4
      |  FROM (SELECT l_shipdate, p_type,
      |          CAST(l_extendedprice AS DECIMAL(12,2)) *
      |          (CAST(1 AS DECIMAL(3,2)) -
      |           CAST(l_discount AS DECIMAL(12,2))) AS rev
      |        FROM lineitem JOIN part ON l_partkey = p_partkey)
      |  GROUP BY ship_month)
      |ORDER BY ship_month""".stripMargin)

  // --------------------------------------------------------------- E29
  /** Top suppliers by revenue — the TPC-H Q15 view, and the first
    * consumer of the `supplier` dimension: fact aggregates once on
    * l_suppkey (map-side combinable), the ~|suppliers| result joins
    * the supplier and nation dims as broadcasts, top-10 tie-broken on
    * suppkey tree-reduces through TakeOrdered — no global sort, no
    * fact-side dim shuffle. Oracle-gated.
    */
  val qTopSuppliers: Q = Q(
    (s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .select(col("l_suppkey"), discPrice.as("rev"))
        .groupBy("l_suppkey")
        .agg(u4(sum(col("rev"))).as("revenue_u4"))
      rev.join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          col("revenue_u4"))
        .orderBy(col("revenue_u4").desc, col("s_suppkey"))
        .limit(10)
    },
    """SELECT s_suppkey, s_name, n_name, revenue_u4 FROM (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |           (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2))))
      |         * 10000 AS BIGINT) AS revenue_u4
      |  FROM lineitem GROUP BY l_suppkey)
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |ORDER BY revenue_u4 DESC, s_suppkey LIMIT 10""".stripMargin)

  val registry: Map[String, Q] = Map(
    "q_promo_share" -> qPromoShare,
    "q_top_suppliers" -> qTopSuppliers,
    "q_stats_hist" -> qStatsHist,
    "q_user_topk" -> qUserTopk,
    "q_user_topk_rank" -> qUserTopkRank,
    "q_user_topk_dense" -> qUserTopkDense,
    "q_equidepth" -> qEquidepth,
    "q_anomaly" -> qAnomaly,
    "q_latency_hist" -> qLatencyHist,
    "q_skew_keys" -> qSkewKeys,
    "q_rfm" -> qRfm,
    "q_table_stats" -> qTableStats,
    "q_paths" -> qPaths,
    "q_stickiness" -> qStickiness,
    "w_trailing" -> wTrailing,
    "w_ntile" -> wNtile,
    "q_histogram" -> qHistogram,
    "q_funnel" -> qFunnel,
    "q_retention" -> qRetention,
    "q_pivot" -> qPivot,
    "q_interval_attr" -> qIntervalAttr,
    "q_band_join" -> qBandJoin,
    "q_rollup" -> qRollup,
    "q_cube" -> qCube,
    "q_asof" -> qAsof,
    "q_salted_agg" -> qSaltedAgg,
    "q1_pricing" -> q1Pricing,
    "q3_topk" -> q3Topk,
    "q5_multijoin" -> q5Multijoin,
    "w_running" -> wRunning,
    "r_sessionize" -> rSessionize,
    "r_batch_stats" -> rBatchStats)
}
