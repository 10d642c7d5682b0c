package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryDef.t

/** The relational operator surface of SURVEY §2.2/2.4/2.5/2.6/2.7/2.8 expressed
  * over the TPC-H-ish testdata.
  *
  * Float determinism: money columns are exact 2-decimal doubles, so sums are
  * done in integer cents (`round(x*100)::long`) — exact, order-independent,
  * and identical in Spark and DuckDB regardless of aggregation order. Final
  * outputs convert back via double division, which is deterministic IEEE on
  * identical inputs.
  */
object RelationalQueries {

  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

  val defs: Seq[QueryDef] = Seq(

    // A1/A5-style aggregation over the big fact table (TPC-H Q1 shape).
    QueryDef("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100 AS sum_qty,
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100 AS sum_base_price,
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000 AS sum_disc_price,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus""") { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum(cents(col("l_quantity"))).cast("double") / 100).as("sum_qty"),
          (sum(cents(col("l_extendedprice"))).cast("double") / 100).as("sum_base_price"),
          (sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).cast("double") / 10000)
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    },

    // Filter + projection; predicates and column pruning push to the parquet scan.
    QueryDef("q02_filter_project",
      """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
           AND l_discount >= 0.05 AND l_quantity < 10""") { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate").between(lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp"))
          && col("l_discount") >= 0.05 && col("l_quantity") < 10)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    },

    // Join + agg + top-k (TPC-H Q3 shape): revenue per order for one segment.
    QueryDef("q03_top_revenue_orders",
      """SELECT o.o_orderkey, o.o_orderpriority,
         CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE)/10000 AS revenue
         FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         WHERE c.c_mktsegment = 'BUILDING'
         GROUP BY o.o_orderkey, o.o_orderpriority
         ORDER BY revenue DESC, o_orderkey LIMIT 10""") { (s, d) =>
      // No broadcast HINT anywhere: the segment-filtered customer set is a
      // CONSTANT FRACTION of a corpus-scaling table (~1/5 of all customers),
      // not a true dimension reduction — pinning it into a broadcast OOMs
      // at 100× (the r10 pagerankScores lesson, generalized by PlanGuard's
      // corpus-lineage check). All joins are equi-joins; AQE broadcasts at
      // runtime wherever the measured build side is actually small.
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = t(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
      val l = t(s, d, "lineitem").select(col("l_orderkey"),
        (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("rev_c"))
      val oFiltered = o.join(c, o("o_custkey") === c("c_custkey"))
        .select("o_orderkey", "o_orderpriority")
      l.join(oFiltered, l("l_orderkey") === oFiltered("o_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority")
        .agg((sum("rev_c").cast("double") / 10000).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
    },

    // Multi-join with broadcast dims (TPC-H Q5 shape): revenue by nation.
    QueryDef("q04_revenue_by_nation",
      """SELECT n.n_name,
         CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE)/10000 AS revenue
         FROM lineitem l
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         WHERE r.r_name IN ('ASIA','EUROPE')
         GROUP BY n.n_name""") { (s, d) =>
      val l = t(s, d, "lineitem").select(col("l_suppkey"),
        (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("rev_c"))
      val sup = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
      val n = t(s, d, "nation")
      val r = t(s, d, "region").filter(col("r_name").isin("ASIA", "EUROPE"))
      // nation/region are bounded-size dims (25/5 rows) — always broadcast.
      // The supplier-derived map grows linearly with SF, so its join with
      // lineitem is left to AQE: broadcast when it measures small, shuffle
      // hash join otherwise.
      val dims = sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("s_suppkey").as("l_suppkey"), col("n_name"))
      l.join(dims, "l_suppkey" :: Nil)
        .groupBy("n_name")
        .agg((sum("rev_c").cast("double") / 10000).as("revenue"))
    },

    // Window function: top-3 orders per customer by totalprice.
    QueryDef("q05_top_orders_per_customer",
      """SELECT o_custkey, o_orderkey, rn FROM (
           SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)::INT AS rn
           FROM orders) WHERE rn <= 3""") { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    },

    // Distinct aggregates.
    QueryDef("q06_distinct_agg",
      """SELECT l_returnflag,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag""") { (s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"))
    },

    // Set operations: union distinct + except.
    QueryDef("q07_setops",
      """SELECT nk, 'both_pool' AS src FROM
           (SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey AS nk FROM supplier)
         UNION ALL
         SELECT nk, 'cust_only' AS src FROM
           (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey AS nk FROM supplier)""") { (s, d) =>
      val c = t(s, d, "customer").select(col("c_nationkey").as("nk"))
      val sup = t(s, d, "supplier").select(col("s_nationkey").as("nk"))
      c.union(sup).distinct().withColumn("src", lit("both_pool"))
        .unionByName(c.except(sup).withColumn("src", lit("cust_only")))
    },

    // Semi/anti joins: customers with vs without orders, per segment.
    QueryDef("q08_semi_anti",
      """SELECT c_mktsegment,
         count(*) FILTER (WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_with,
         count(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_without
         FROM customer c GROUP BY c_mktsegment""") { (s, d) =>
      // Single pass over customer: a left join against the DISTINCT order
      // custkeys (one row per key, so no fan-out) marks each customer, and
      // conditional counts split the segments — versus the semi+anti form,
      // which scans customer twice and pays a third join to stitch the two
      // aggregates back together.
      val c = t(s, d, "customer").select("c_custkey", "c_mktsegment")
      val o = t(s, d, "orders").select("o_custkey").distinct()
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_mktsegment")
        .agg(count(when(col("o_custkey").isNotNull, 1)).as("n_with"),
          count(when(col("o_custkey").isNull, 1)).as("n_without"))
    },

    // Global top-k (TakeOrderedAndProject, no full sort).
    QueryDef("q09_topk_orders",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""") { (s, d) =>
      t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(20)
    },

    // Tumbling-window aggregation over the event stream table (batch twin of
    // the Structured Streaming pipeline in graft.streaming).
    QueryDef("q10_events_tumbling",
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
         count(*) AS n,
         CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100 AS sum_value
         FROM events GROUP BY 1, 2""") { (s, d) =>
      QueryDef.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(cents(col("value"))).cast("double") / 100).as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
    },

    // Sessionization: 30-minute inactivity gap, via lag + running sum windows.
    // The gap compares in EXACT MICROS on both sides (unix_micros vs
    // epoch_us): fixtures carry microsecond ts, so floor-second diffs would
    // mislabel true gaps in (1800, 1801) s relative to the oracle.
    QueryDef("q11_sessionize",
      """SELECT user_id, CAST(1 + sum(is_new) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
           SELECT user_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
           FROM events) GROUP BY user_id""") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      QueryDef.events(s, d)
        .withColumn("gap", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("is_new", when(col("gap") > 1800000000L, 1).otherwise(0))
        .groupBy("user_id")
        .agg((lit(1) + sum("is_new")).cast("long").as("n_sessions"), count(lit(1)).as("n_events"))
    },

    // Rollup (grouping sets).
    QueryDef("q12_rollup",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100 AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""") { (s, d) =>
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), (sum(cents(col("l_quantity"))).cast("double") / 100).as("sum_qty"))
    },

    // CUBE — the full grouping-sets lattice (rollup's sibling surface):
    // every (flag, status) margin in one pass. Spark expands the sets and
    // aggregates once with map-side combine; no per-set rescans.
    QueryDef("q26_cube",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100 AS sum_price
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""") { (s, d) =>
      t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          (sum(cents(col("l_extendedprice"))).cast("double") / 100).as("sum_price"))
    },

    // JSON extraction from the events props column (C22 JSON codec surface).
    QueryDef("q13_json_props",
      """SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, count(*) AS n
         FROM events GROUP BY event_type""") { (s, d) =>
      QueryDef.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type").agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
    },

    // Date bucketing.
    QueryDef("q14_orders_by_month",
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, o_orderpriority, count(*) AS n,
         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100 AS sum_price
         FROM orders GROUP BY 1, 2""") { (s, d) =>
      t(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), (sum(cents(col("o_totalprice"))).cast("double") / 100).as("sum_price"))
    },

    // Deterministic hash-based sampling (the cross-engine-stable analogue of
    // the reference's TABLESAMPLE/ORDER BY rand() ladder, sampler.py:163-204).
    QueryDef("q15_sample_hash",
      """SELECT c_custkey, c_name FROM customer
         WHERE substr(md5(c_custkey::VARCHAR), 1, 1) IN ('0','1')""") { (s, d) =>
      t(s, d, "customer")
        .filter(substring(md5(col("c_custkey").cast("string")), 1, 1).isin("0", "1"))
        .select("c_custkey", "c_name")
    },

    // Window FRAME specs (running total + bounded moving average) — the one
    // window dimension the faithful surface never needed (SURVEY §2.6).
    // Integer-cents sums keep both frames bitwise exact across engines.
    QueryDef("q24_window_frames",
      """SELECT o_custkey, o_orderkey,
           CAST(sum(c) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100 AS running_total,
           round(CAST(sum(c) OVER w3 AS DOUBLE) / (100 * count(*) OVER w3), 6) AS moving_avg3
         FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                 CAST(round(o_totalprice*100) AS BIGINT) AS c FROM orders)
         WINDOW w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""") { (s, d) =>
      val base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val wRun = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wMov = base.rowsBetween(-2, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          cents(col("o_totalprice")).as("c"))
        .select(col("o_custkey"), col("o_orderkey"),
          (sum("c").over(wRun).cast("double") / 100).as("running_total"),
          round(sum("c").over(wMov).cast("double")
            / (lit(100) * count(lit(1)).over(wMov)), 6).as("moving_avg3"))
    },

    // TPC-H Q7 shape (volume shipping): 5-way join with two roles of the same
    // dimension (supplier vs customer nation), an OR'd nation-pair predicate,
    // and a year rollup. The pair NATION_18/NATION_19 is verified non-empty
    // at sf0.001/0.01/0.1 (61/138/923 matched lineitems). Only the
    // nation-filtered supplier/customer dimension maps broadcast; the
    // orders-derived stream joins lineitem as a shuffle equi-join (an
    // orders-side broadcast grows with the fact data — driver OOM at scale).
    QueryDef("q25_volume_shipping",
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE)/10000 AS volume
         FROM supplier s
         JOIN lineitem l ON s.s_suppkey = l.l_suppkey
         JOIN orders o ON o.o_orderkey = l.l_orderkey
         JOIN customer c ON c.c_custkey = o.o_custkey
         JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
         JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
         WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
            OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
         GROUP BY 1, 2, 3""") { (s, d) =>
      val pair = Seq("NATION_18", "NATION_19")
      val n1 = t(s, d, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, d, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      // Hints only on the 25-row nation frames: the nation-filtered
      // supplier/customer sets are constant fractions (2/25) of
      // corpus-scaling tables — shuffle equi-joins, with AQE free to
      // broadcast them at runtime when they measure small.
      val sup = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .select("s_suppkey", "supp_nation")
      val cust = t(s, d, "customer").select("c_custkey", "c_nationkey")
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .select("c_custkey", "cust_nation")
      val o = t(s, d, "orders").select("o_orderkey", "o_custkey")
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "cust_nation")
      val l = t(s, d, "lineitem").select(col("l_suppkey"), col("l_orderkey"),
        year(col("l_shipdate")).cast("int").as("l_year"),
        (cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("vol_c"))
      l.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .filter((col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19")
          || (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg((sum("vol_c").cast("double") / 10000).as("volume"))
    },

    // UNPIVOT (melt) — the inverse reshaping verb of q21's pivot: the wide
    // per-source language histogram back to long (source, lang, n) form.
    // Spark plans unpivot as a local Expand over the already-aggregated
    // wide frame (|sources| rows), so the corpus-scale work is exactly the
    // one groupBy the pivot itself runs; the reshape costs nothing extra.
    // The na.fill(0) before the melt makes the zero cells explicit rows —
    // mirrored in the oracle's sources × langs scaffold.
    QueryDef("q27_unpivot",
      """WITH cnt AS (SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2)
         SELECT s.source, l.lang, CAST(coalesce(c.n, 0) AS BIGINT) AS n
         FROM (SELECT DISTINCT source FROM documents) s
         CROSS JOIN (SELECT unnest(['de','en','es','fr','zh']) AS lang) l
         LEFT JOIN cnt c ON c.source = s.source AND c.lang = l.lang""") { (s, d) =>
      val langs = Seq("de", "en", "es", "fr", "zh")
      t(s, d, "documents")
        .groupBy("source").pivot("lang", langs).agg(count(lit(1)))
        .na.fill(0L)
        .unpivot(Array(col("source")), langs.map(col).toArray, "lang", "n")
    },

    // GROUPING SETS — the arbitrary-lattice sibling of q12's ROLLUP and
    // q26's CUBE (here: detail, one margin, grand total — a lattice neither
    // rollup nor cube produces). grouping_id (composed from per-column
    // grouping() flags, identical bit order in both engines) disambiguates
    // a genuine NULL group value from a rolled-up one. Spark expands the
    // sets and aggregates in ONE pass with map-side combine — no per-set
    // rescan of orders.
    QueryDef("q28_grouping_sets",
      """SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority)*2 + GROUPING(o_orderstatus) AS BIGINT) AS gid,
           count(*) AS n,
           CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100 AS sum_price
         FROM orders
         GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())""") { (s, d) =>
      t(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
            Seq(col("o_orderpriority")), Seq.empty[org.apache.spark.sql.Column]),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg((grouping(col("o_orderpriority")) * 2 + grouping(col("o_orderstatus")))
            .cast("long").as("gid"),
          count(lit(1)).as("n"),
          (sum(cents(col("o_totalprice"))).cast("double") / 100).as("sum_price"))
    },

    // Ranking-function family (q30) — rank / dense_rank / percent_rank /
    // cume_dist over a TIED ordering (coarse $1k balance bands, so the
    // gap-vs-dense and peer-group semantics actually fire) plus ntile(4)
    // over a tie-free total order (ntile splits by POSITION, so ties would
    // make it order-dependent — the tie-free key keeps it deterministic).
    // percent_rank/cume_dist are small-int ratios — IEEE division of
    // identical integers is bit-identical in both engines. One partitioned
    // window shuffle on the nation key.
    QueryDef("q30_rank_family",
      """SELECT c_nationkey::BIGINT AS nation, c_custkey,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
           CAST(rank() OVER wt AS BIGINT) AS rnk,
           CAST(dense_rank() OVER wt AS BIGINT) AS drnk,
           round(percent_rank() OVER wt, 6) AS pr,
           round(cume_dist() OVER wt, 6) AS cd,
           CAST(ntile(4) OVER (PARTITION BY c_nationkey
             ORDER BY floor(c_acctbal / 1000), c_custkey) AS BIGINT) AS quartile
         FROM customer
         WINDOW wt AS (PARTITION BY c_nationkey ORDER BY floor(c_acctbal / 1000))""") { (s, d) =>
      val band = floor(col("c_acctbal") / 1000)
      val wt = Window.partitionBy("c_nationkey").orderBy(band)
      val wn = Window.partitionBy("c_nationkey").orderBy(band, col("c_custkey"))
      t(s, d, "customer")
        .select(col("c_nationkey").cast("long").as("nation"), col("c_custkey"),
          band.cast("long").as("bal_band"),
          rank().over(wt).cast("long").as("rnk"),
          dense_rank().over(wt).cast("long").as("drnk"),
          round(percent_rank().over(wt), 6).as("pr"),
          round(cume_dist().over(wt), 6).as("cd"),
          ntile(4).over(wn).cast("long").as("quartile"))
    },

    // Time-based RANGE frame (q31) — the interval sibling of q24's ROWS
    // frames: per user, the trailing-24h event count and payload sum at
    // every event. RANGE frames include ALL peers of the current order
    // key, so the result is deterministic even under duplicate timestamps
    // (a ROWS frame there would depend on physical row order). Spark's
    // range runs on exact epoch micros; DuckDB's on the timestamp with an
    // INTERVAL bound — the same inclusive [ts−24h, ts] window. One
    // user-partitioned shuffle, the events family's shared exchange.
    QueryDef("q31_range_interval_window",
      """SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_24h,
           CAST(sum(k) OVER w AS BIGINT) AS sum_k_24h
         FROM (SELECT event_id, user_id, ts,
                 coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k
               FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW)""") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("tsu"))
        .rangeBetween(-86400000000L, 0L)
      QueryDef.events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(ts)").as("tsu"),
          coalesce(get_json_object(col("props"), "$.k").cast("long"), lit(0L)).as("k"))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).cast("long").as("n_24h"),
          sum("k").over(w).cast("long").as("sum_k_24h"))
    },

    // FULL OUTER JOIN (q32) — the one outer-join variant the batch
    // surface lacked (left at q-joins, semi/anti at q08, stream-stream
    // outer at s11): customer records reconciled against the event log,
    // keeping BOTH dangling sides — customers who never produced an event
    // and event actors with no customer record, each tagged. The
    // event side pre-aggregates to one row per user (map-side combine),
    // so the outer join itself is key-to-key.
    QueryDef("q32_full_outer",
      """WITH ev AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1)
         SELECT CAST(coalesce(c.c_custkey, ev.user_id) AS BIGINT) AS key,
           CAST(coalesce(ev.n_events, 0) AS BIGINT) AS n_events,
           c.c_acctbal AS acctbal,
           CASE WHEN c.c_custkey IS NOT NULL AND ev.user_id IS NOT NULL THEN 'both'
                WHEN c.c_custkey IS NOT NULL THEN 'customer_only'
                ELSE 'events_only' END AS status
         FROM customer c FULL OUTER JOIN ev ON ev.user_id = c.c_custkey""") { (s, d) =>
      val ev = QueryDef.events(s, d).groupBy("user_id").agg(count(lit(1)).as("n_events"))
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_acctbal"))
      c.join(ev, c("c_custkey") === ev("user_id"), "full_outer")
        .select(coalesce(col("c_custkey"), col("user_id")).cast("long").as("key"),
          coalesce(col("n_events"), lit(0L)).cast("long").as("n_events"),
          col("c_acctbal").as("acctbal"),
          when(col("c_custkey").isNotNull && col("user_id").isNotNull, "both")
            .when(col("c_custkey").isNotNull, "customer_only")
            .otherwise("events_only").as("status"))
    },

    // Correlated scalar subqueries, exact-integer form (q33). q18/q19
    // cover scalar + correlated-EXISTS decorrelation already, but both
    // compare against a float avg() — a cross-engine boundary hazard the
    // suite otherwise bans. This is the exact twin: TWO top-level
    // correlated scalars (per-customer order count and cents sum,
    // cross-multiplied — "orders above the customer's OWN average" with no
    // float average crossing engines) plus a correlated EXISTS on a
    // second table (returned line item). Written as SQL on purpose: the surface
    // under test is Catalyst's decorrelation — RewriteCorrelatedScalarSubquery
    // turns each scalar into a keyed aggregate + join and EXISTS plans as
    // a left-semi join. Measured plan (explain, sf0.1): three equi-joins +
    // two map-side-combined custkey aggregates over orders — Catalyst did
    // NOT merge the two scalar aggregates (MergeScalarSubqueries leaves
    // decorrelated joins alone), so orders scans twice; still nothing
    // per-row, nothing nested-loop, and every join key-partitioned — the
    // shape survives 1000 executors, paying one extra orders scan vs the
    // hand-fused q-join form the rest of the suite uses.
    QueryDef("q33_correlated_subqueries",
      """SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
           CAST(o.o_custkey AS BIGINT) AS o_custkey,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents
         FROM orders o
         WHERE CAST(round(o.o_totalprice * 100) AS BIGINT)
             * (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
           > (SELECT sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
              FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')""") { (s, d) =>
      s.sql(
        s"""SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
              CAST(o.o_custkey AS BIGINT) AS o_custkey,
              CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents
            FROM parquet.`$d/orders.parquet` o
            WHERE CAST(round(o.o_totalprice * 100) AS BIGINT)
                * (SELECT count(*) FROM parquet.`$d/orders.parquet` o2
                   WHERE o2.o_custkey = o.o_custkey)
              > (SELECT sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
                 FROM parquet.`$d/orders.parquet` o2 WHERE o2.o_custkey = o.o_custkey)
              AND EXISTS (SELECT 1 FROM parquet.`$d/lineitem.parquet` l
                          WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')""")
    },

    // LATERAL join (q34) — the correlated table subquery verb: each
    // customer's top-3 orders by value, written as `, LATERAL (ORDER BY
    // .. LIMIT 3)` rather than the window-rank idiom the rest of the
    // suite uses (q05). The surface is Catalyst's correlated-LIMIT
    // decorrelation, and the measured plan (explain, sf0.1) is BETTER
    // than the hand-built q05 shape: the lateral rewrites to
    // WindowGroupLimit → Exchange → WindowGroupLimit → Window(rank) →
    // Filter → equi-join — the optimizer inserts a MAP-SIDE top-3-per-
    // group prune BEFORE the custkey shuffle, so only ≤3 rows per
    // (partition, customer) ever cross the wire. Ties broken by
    // o_orderkey so the top-3 set is deterministic. Nothing nested-loop.
    QueryDef("q34_lateral_topk",
      """SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
           CAST(t.o_orderkey AS BIGINT) AS o_orderkey, t.price_cents
         FROM customer c, LATERAL (
           SELECT o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents
           FROM orders o WHERE o.o_custkey = c.c_custkey
           ORDER BY price_cents DESC, o_orderkey LIMIT 3) t""") { (s, d) =>
      s.sql(
        s"""SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
              CAST(t.o_orderkey AS BIGINT) AS o_orderkey, t.price_cents
            FROM parquet.`$d/customer.parquet` c, LATERAL (
              SELECT o_orderkey,
                  CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents
              FROM parquet.`$d/orders.parquet` o WHERE o.o_custkey = c.c_custkey
              ORDER BY price_cents DESC, o_orderkey LIMIT 3) t""")
    })
}
