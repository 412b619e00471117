package graft.queries

import org.apache.spark.sql.functions._

/** Relational operator surface over the driver's TPC-H-ish tables: the
  * join/aggregate/window/set-op shapes of SURVEY §2.3-2.7 that Spark
  * supplies natively. These also serve as the bench headliners — each is
  * written scale-first (broadcast for dimension tables, decimal arithmetic
  * for exact oracle parity, pushdown-friendly predicates).
  */
object Relational {
  import QueryDef.{events, normalizeTs, tbl}

  /** Money/quantity columns arrive as parquet DOUBLE holding 2-decimal
    * values. All monetary outputs are emitted as exact integer minor
    * units (cents / 1e-4 units): the driver's hash formats a DECIMAL
    * result column via float shortest-repr on one side and decimal-scale
    * text on the other, so any output value with trailing-zero cents
    * ("8560.00" vs "8560.0") hash-mismatches even when values are equal
    * (bit us in rounds 1-2 on exactly the sum-bearing queries). Integer
    * columns hash identically everywhere. The double→DECIMAL(18,2) cast
    * is verified identical across engines/rounding modes on this data.
    */
  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast("decimal(18,2)") * lit(100)).cast("long")
  private def centsSql(c: String) =
    s"CAST(CAST($c AS DECIMAL(18,2))*100 AS BIGINT)"

  val defs: Map[String, QueryDef] = Map(

    // A-series shape: grouped aggregation with partial (map-side) combine.
    // disc_price in 1e-4 dollar units: price_cents * (100 - discount_pct).
    "q01_pricing_summary" -> QueryDef(
      (s, dir) => {
        tbl(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(cents(col("l_quantity"))).as("sum_qty_c"),
            sum(cents(col("l_extendedprice"))).as("sum_base_price_c"),
            sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).as("sum_disc_price_e4"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(${centsSql("l_quantity")}) AS BIGINT) AS sum_qty_c,
             |  CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS sum_base_price_c,
             |  CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS BIGINT) AS sum_disc_price_e4,
             |  count(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("\n", " "))),

    // J-series shape: multi-way equi-join, dimensions broadcast. The
    // fact side is pre-aggregated to one row per orderkey BELOW the join
    // (partial aggregation pushdown): the orderkey shuffle then moves
    // |orders| compact rows instead of |lineitem| wide ones — at 100 TB
    // that's the difference between shuffling the fact table and
    // shuffling a 4x-smaller rollup of it. Revenue is distributive, so
    // the regrouped sums are exact.
    "q02_revenue_by_nation" -> QueryDef(
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
        val o = tbl(s, dir, "orders")
        val c = tbl(s, dir, "customer")
        val n = tbl(s, dir, "nation")
        val liAgg = li.groupBy(col("l_orderkey"))
          .agg(
            sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).as("o_rev"),
            count(lit(1)).as("o_cnt"))
        liAgg.join(o, liAgg("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("o_rev")).as("revenue_e4"),
            sum(col("o_cnt")).as("n_items"))
          .orderBy(col("n_name"))
      },
      Some(s"""SELECT n_name,
             |  CAST(sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS BIGINT) AS revenue_e4,
             |  count(*) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin.replace("\n", " "))),

    // O-series: global top-k (orderBy + limit), deterministic tie-break.
    "q03_topk_orders" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            cents(col("o_totalprice")).as("o_totalprice_c"))
          .orderBy(col("o_totalprice_c").desc, col("o_orderkey"))
          .limit(10),
      Some(s"""SELECT o_orderkey, o_custkey, ${centsSql("o_totalprice")} AS o_totalprice_c
             |FROM orders ORDER BY o_totalprice_c DESC, o_orderkey LIMIT 10""".stripMargin.replace("\n", " "))),

    // Window functions (SURVEY §2.5: free from Spark, exercised anyway).
    "q04_window_rank" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("s_nationkey"))
          .orderBy(col("s_acctbal").desc, col("s_suppkey"))
        tbl(s, dir, "supplier")
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 3)
          .select(col("s_nationkey"), col("s_suppkey"),
            cents(col("s_acctbal")).as("s_acctbal_c"),
            // DuckDB row_number() is BIGINT; Spark's is INT
            col("rk").cast("long").as("rk"))
          .orderBy(col("s_nationkey"), col("rk"))
      },
      Some(s"""SELECT s_nationkey, s_suppkey, ${centsSql("s_acctbal")} AS s_acctbal_c, rk
             |FROM (SELECT s_nationkey, s_suppkey, s_acctbal,
             |  row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rk
             |  FROM supplier) WHERE rk <= 3
             |ORDER BY s_nationkey, rk""".stripMargin.replace("\n", " "))),

    // W-series shape: tumbling event-time window (batch form of the
    // Structured Streaming agg; integer epoch buckets for oracle parity).
    // events.ts arrives as epoch-ns Long via QueryDef.events — ns-stored
    // parquet needs the nanosAsLong legacy flag (set here; idempotent),
    // us-precision TIMESTAMP files convert exactly (see normalizeTs) —
    // then bucketed by integer division either way.
    "q05_events_tumbling" -> QueryDef(
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        events(s, dir)
          .select(expr("ts div 300000000000").as("bucket"),
            col("event_type"), col("value"))
          .groupBy(col("bucket"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(cents(col("value"))).as("total_c"))
          .orderBy(col("bucket"), col("event_type"))
      },
      Some(s"""SELECT epoch_ns(ts) // 300000000000 AS bucket, event_type,
             |  count(*) AS n, CAST(sum(${centsSql("value")}) AS BIGINT) AS total_c
             |FROM events GROUP BY bucket, event_type
             |ORDER BY bucket, event_type""".stripMargin.replace("\n", " "))),

    // The streaming form of q05: the same tumbling-bucket aggregation
    // computed by Structured Streaming (AvailableNow over the events
    // parquet, complete-mode memory sink) — proving the streaming engine
    // and the batch oracle agree bucket for bucket.
    "q64_stream_window" -> QueryDef(
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val schema = tbl(s, dir, "events").schema
        val name = s"q64_mem_${System.nanoTime()}"
        // the file-stream source requires a directory; glob-filter the
        // events file out of the shared sf dir
        val q = normalizeTs(s.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet").parquet(dir))
          .select(expr("ts div 300000000000").as("bucket"), col("event_type"))
          .groupBy(col("bucket"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .outputMode("complete")
          .format("memory").queryName(name)
          .start()
        q.awaitTermination()
        s.table(name).orderBy(col("bucket"), col("event_type"))
      },
      Some("""SELECT epoch_ns(ts) // 300000000000 AS bucket, event_type, count(*) AS n
             |FROM events GROUP BY bucket, event_type
             |ORDER BY bucket, event_type""".stripMargin.replace("\n", " "))),

    // J1/S3 existence semi-join (requested-keys x cache-contents shape).
    "q06_semi_join" -> QueryDef(
      (s, dir) => {
        val c = tbl(s, dir, "customer")
        val o = tbl(s, dir, "orders").select(col("o_custkey"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_customers FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin.replace("\n", " "))),

    // J2/S6 anti-join (missing-keys probe shape).
    "q07_anti_join" -> QueryDef(
      (s, dir) => {
        val c = tbl(s, dir, "customer")
        val o = tbl(s, dir, "orders").select(col("o_custkey"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_nationkey"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_nationkey FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin.replace("\n", " "))),

    // T1 union+distinct / T2 except / T4 intersect (set ops on id sets).
    "q08_union_ids" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "customer").select(col("c_nationkey").cast("int").as("nk"))
          .union(tbl(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nk")))
          .distinct().orderBy(col("nk")),
      Some("""SELECT CAST(c_nationkey AS INT) AS nk FROM customer
             |UNION SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
             |ORDER BY nk""".stripMargin.replace("\n", " "))),

    "q09_except_ids" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "customer").select(col("c_nationkey").cast("int").as("nk")).distinct()
          .except(tbl(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nk")).distinct())
          .orderBy(col("nk")),
      Some("""SELECT DISTINCT CAST(c_nationkey AS INT) AS nk FROM customer
             |EXCEPT SELECT DISTINCT CAST(s_nationkey AS INT) AS nk FROM supplier
             |ORDER BY nk""".stripMargin.replace("\n", " "))),

    // Sessionization: gap > 30 min opens a new session per user (lag +
    // running sum) — the batch form of stateful session windows.
    "q51_sessionize" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val w = Window.partitionBy(col("user_id")).orderBy(col("tn"), col("event_id"))
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, dir)
          .select(col("user_id"), expr("ts div 1000").as("tn"), col("event_id"))  // ns -> us: DuckDB TIMESTAMP is us-precision
          .withColumn("new_s",
            when(lag(col("tn"), 1).over(w).isNull ||
              col("tn") - lag(col("tn"), 1).over(w) > 1800000000L, 1).otherwise(0))
          .withColumn("sid", sum(col("new_s")).over(run).cast("long"))
          .groupBy(col("user_id"), col("sid"))
          .agg(count(lit(1)).as("n_events"),
            min(col("tn")).as("t_start"), max(col("tn")).as("t_end"))
          .orderBy(col("user_id"), col("sid"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tn, event_id FROM events),
             |s AS (SELECT user_id, tn, event_id,
             |  CASE WHEN lag(tn) OVER (PARTITION BY user_id ORDER BY tn, event_id) IS NULL
             |         OR tn - lag(tn) OVER (PARTITION BY user_id ORDER BY tn, event_id) > 1800000000
             |       THEN 1 ELSE 0 END AS new_s FROM e),
             |g AS (SELECT user_id, tn,
             |  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tn, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
             |  FROM s)
             |SELECT user_id, sid, count(*) AS n_events, min(tn) AS t_start, max(tn) AS t_end
             |FROM g GROUP BY user_id, sid
             |ORDER BY user_id, sid""".stripMargin.replace("\n", " "))),

    // JSON property extraction from the event payload column.
    "q52_json_extract" -> QueryDef(
      (s, dir) => {
        // events.ts is timestamp[ns]: schema inference needs the flag even
        // though this query never touches ts
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        tbl(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), min(col("k")).as("k_min"),
            max(col("k")).as("k_max"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
             |max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
             |FROM events GROUP BY event_type
             |ORDER BY event_type""".stripMargin.replace("\n", " "))),

    // Grouping sets / rollup (absent in the reference, SURVEY §2.4 —
    // Spark built-in): subtotals per (returnflag, linestatus) + per
    // returnflag + grand total. Group keys coalesced so NULL subtotal
    // markers compare deterministically across engines.
    "q53_rollup" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(cents(col("l_quantity"))).as("qty_c"))
          .select(
            coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
            coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
            col("n"), col("qty_c"))
          .orderBy(col("rf"), col("ls")),
      Some(s"""SELECT coalesce(l_returnflag, '<all>') AS rf,
             |coalesce(l_linestatus, '<all>') AS ls,
             |count(*) AS n, CAST(sum(${centsSql("l_quantity")}) AS BIGINT) AS qty_c
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY rf, ls""".stripMargin.replace("\n", " "))),

    // CUBE with grouping_id: all 4 subtotal combinations in one pass
    // (Spark expands grouping sets below the aggregate — one shuffle, not
    // one scan per grouping set).
    "q66_cube" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(grouping_id().cast("long").as("gid"),
            count(lit(1)).as("n"),
            sum(cents(col("o_totalprice"))).as("price_c"))
          .select(
            coalesce(col("o_orderstatus"), lit("<all>")).as("st"),
            coalesce(col("o_orderpriority"), lit("<all>")).as("pri"),
            col("gid"), col("n"), col("price_c"))
          .orderBy(col("gid"), col("st"), col("pri")),
      Some(s"""SELECT coalesce(o_orderstatus,'<all>') AS st,
             |coalesce(o_orderpriority,'<all>') AS pri,
             |CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
             |count(*) AS n,
             |CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS price_c
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY gid, st, pri""".stripMargin.replace("\n", " "))),

    // Pivot: event-type counts as columns per user bucket. Spark's pivot
    // with an explicit value list plans as ONE aggregate (no per-column
    // scan); the oracle is the equivalent conditional aggregation.
    "q67_pivot" -> QueryDef(
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = tbl(s, dir, "events")
          .select((col("user_id") % 10).as("ub"), col("event_type"))
          .groupBy(col("ub"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
        p.select(col("ub") +: types.map(t =>
            coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
          .orderBy(col("ub"))
      },
      Some("""SELECT user_id % 10 AS ub,
             |count(CASE WHEN event_type='click' THEN 1 END) AS n_click,
             |count(CASE WHEN event_type='error' THEN 1 END) AS n_error,
             |count(CASE WHEN event_type='purchase' THEN 1 END) AS n_purchase,
             |count(CASE WHEN event_type='signup' THEN 1 END) AS n_signup,
             |count(CASE WHEN event_type='view' THEN 1 END) AS n_view
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "))),

    // As-of join: each purchase matched to the user's latest click at or
    // before it. The scalable shape is NOT a range join: both streams
    // union into one (user-partitioned, time-sorted) window pass and the
    // click carries forward via last(ignoreNulls) — one shuffle on
    // user_id, linear scan per partition, no per-pair work. Ties at equal
    // ts resolve deterministically (clicks sort before purchases, then by
    // event_id, so an equal-ts click is visible and the highest event_id
    // wins).
    "q68_asof_join" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tn"), col("pr"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // tn at MICROsecond resolution on both sides: the oracle DuckDB
        // truncates parquet timestamp[ns] to a us-resolution TIMESTAMP on
        // read, so raw ns values (and ns-resolution orderings) can never
        // hash-match — truncate at the source instead.
        events(s, dir)
          .where(col("event_type").isin("click", "purchase"))
          .select(col("user_id"), expr("ts div 1000").as("tn"), col("event_id"), col("event_type"))
          .withColumn("pr", when(col("event_type") === "click", 0).otherwise(1))
          .withColumn("ctn", when(col("event_type") === "click", col("tn")))
          .withColumn("cid", when(col("event_type") === "click", col("event_id")))
          .withColumn("click_tn", last(col("ctn"), ignoreNulls = true).over(w))
          .withColumn("click_id", last(col("cid"), ignoreNulls = true).over(w))
          .where(col("event_type") === "purchase")
          // no-match as -1, not NULL: a nullable int64 column round-trips
          // through pandas as float64 on one side of the driver's hasher
          .select(col("event_id"), col("user_id"), col("tn"),
            coalesce(col("click_tn"), lit(-1L)).as("click_tn"),
            coalesce(col("click_id"), lit(-1L)).as("click_id"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS tn, event_id, event_type
             |  FROM events WHERE event_type IN ('click','purchase')),
             |m AS (SELECT user_id, tn, event_id, event_type,
             |  CASE WHEN event_type='click' THEN 0 ELSE 1 END AS pr,
             |  CASE WHEN event_type='click' THEN tn END AS ctn,
             |  CASE WHEN event_type='click' THEN event_id END AS cid FROM e),
             |w AS (SELECT *,
             |  last_value(ctn IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY tn, pr, event_id ROWS UNBOUNDED PRECEDING) AS click_tn,
             |  last_value(cid IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY tn, pr, event_id ROWS UNBOUNDED PRECEDING) AS click_id
             |  FROM m)
             |SELECT event_id, user_id, tn, coalesce(click_tn, -1) AS click_tn,
             |  coalesce(click_id, -1) AS click_id FROM w
             |WHERE event_type='purchase' ORDER BY event_id""".stripMargin.replace("\n", " "))),

    // Exact discrete quantiles (p50/p90) per group via a single window
    // pass — position ceil(p·n) in (value, event_id) order, all-integer so
    // no interpolation float ever appears in the output.
    "q69_quantiles" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val wr = Window.partitionBy(col("event_type")).orderBy(col("vc"), col("event_id"))
        val wn = Window.partitionBy(col("event_type"))
        tbl(s, dir, "events")
          .select(col("event_type"),
            round(col("value").cast("double") * 100).cast("long").as("vc"),
            col("event_id"))
          .withColumn("rn", row_number().over(wr).cast("long"))
          .withColumn("n", count(lit(1)).over(wn))
          .groupBy(col("event_type"))
          .agg(max(col("n")).as("n"),
            max(expr("CASE WHEN rn = (n+1) div 2 THEN vc END")).as("p50_c"),
            max(expr("CASE WHEN rn = (9*n+9) div 10 THEN vc END")).as("p90_c"))
          .orderBy(col("event_type"))
      },
      Some("""WITH v AS (SELECT event_type, CAST(round(CAST(value AS DOUBLE)*100) AS BIGINT) AS vc, event_id FROM events),
             |r AS (SELECT event_type, vc,
             |  row_number() OVER (PARTITION BY event_type ORDER BY vc, event_id) AS rn,
             |  count(*) OVER (PARTITION BY event_type) AS n FROM v)
             |SELECT event_type, max(n) AS n,
             |  max(CASE WHEN rn = (n+1)//2 THEN vc END) AS p50_c,
             |  max(CASE WHEN rn = (9*n+9)//10 THEN vc END) AS p90_c
             |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin.replace("\n", " "))),

    // Interval/range join, bucketed: events within 24h before each
    // purchase by the same user. The scalable shape replaces the
    // inequality join (per-user cartesian) with an equi-join on
    // (user, time-bucket): bucket width = window length, so each probe
    // checks exactly 2 buckets and the matcher side shuffles once on a
    // compact key AQE can skew-split.
    "q71_range_join" -> QueryDef(
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val win = 86400000000000L // 24h in ns
        val e = events(s, dir)
        val matcher = e.select(col("user_id"), col("ts").as("tn"), col("event_id"))
          .withColumn("bucket", expr(s"tn div $win"))
        val probes = e.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("ptn"), col("event_id").as("p_event_id"))
        val fanned = probes.withColumn("bucket",
          explode(array(expr(s"ptn div $win"), expr(s"ptn div $win - 1"))))
        val counts = fanned.join(matcher, Seq("user_id", "bucket"))
          .where(col("tn") >= col("ptn") - win && col("tn") <= col("ptn") &&
            col("event_id") =!= col("p_event_id"))
          .groupBy(col("p_event_id")).agg(count(lit(1)).as("n_24h"))
        probes.select(col("p_event_id"))
          .join(counts, Seq("p_event_id"), "left_outer")
          .na.fill(0L, Seq("n_24h"))
          .select(col("p_event_id").as("event_id"), col("n_24h"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS tn, event_id FROM events),
             |p AS (SELECT user_id, epoch_ns(ts) AS tn, event_id FROM events WHERE event_type='purchase')
             |SELECT p.event_id, CAST(count(e.event_id) AS BIGINT) AS n_24h
             |FROM p LEFT JOIN e ON e.user_id = p.user_id AND e.event_id <> p.event_id
             |  AND e.tn BETWEEN p.tn - 86400000000000 AND p.tn
             |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin.replace("\n", " "))),

    // Skew tool parity: the salted join (hot-key spreading for joins AQE
    // cannot see, e.g. under a custom exec or a broadcast-disabled dim)
    // must return row-for-row the plain join — salting changes the
    // exchange layout, never the result. The oracle is the unsalted SQL
    // join; integer aggregates keep the compare hash-exact.
    "q99_salted_join" -> QueryDef(
      (s, dir) => {
        val fact = tbl(s, dir, "orders")
          .select(col("o_custkey").as("c_custkey"), col("o_orderkey"))
        val dim = tbl(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
        graft.functions.Skew.saltedJoin(fact, dim, Seq("c_custkey"), salts = 8)
          .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
          .agg(count(lit(1)).as("n_orders"), sum(col("o_orderkey")).as("key_sum"))
          .orderBy(col("c_nationkey"))
      },
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
             |  count(*) AS n_orders, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "))),

    "q10_intersect_ids" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "customer").select(col("c_nationkey").cast("int").as("nk")).distinct()
          .intersect(tbl(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nk")).distinct())
          .orderBy(col("nk")),
      Some("""SELECT DISTINCT CAST(c_nationkey AS INT) AS nk FROM customer
             |INTERSECT SELECT DISTINCT CAST(s_nationkey AS INT) AS nk FROM supplier
             |ORDER BY nk""".stripMargin.replace("\n", " ")))
  )
}
