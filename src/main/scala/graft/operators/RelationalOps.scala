package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational query surface the engine exposes over landed tables.
  *
  * The reference delegates all SELECT execution to DuckDB over its landed
  * DuckLake tables (SURVEY.md §2.10) — the equivalent surface here is Spark
  * SQL over the lake. Each query is written declaratively so Catalyst gets
  * full pushdown/pruning/join-reorder freedom; small dimension tables are
  * broadcast explicitly.
  *
  * Scale notes (100 TB design intent), per query in its Scaladoc:
  *  - filters always precede joins/aggregations (pushdown to parquet scan),
  *  - dimension joins are `broadcast()` (no shuffle of the fact table),
  *  - aggregations are partial (map-side combine) by construction,
  *  - top-k uses `orderBy.limit` which Spark executes as TakeOrderedAndProject
  *    (per-partition heap + driver merge of k rows, never a full sort).
  */
object RelationalOps {

  /** TPC-H Q1-style pricing summary: full scan, 6-group aggregation.
    * Scale: map-side partial agg reduces 100 TB to 6 rows before shuffle. */
  val q01PricingSummary = QueryDef(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 2) AS avg_qty,
      |  round(avg(l_extendedprice), 2) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Top-k by price. Scale: TakeOrderedAndProject — per-partition heap of k,
    * no global sort, no full shuffle. */
  val q02TopkOrders = QueryDef(
    "q02_topk_orders",
    """SELECT o_orderkey, o_totalprice, o_orderpriority
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q3-style shipping priority: selective dim filter broadcast into a
    * fact-fact join. Scale: customer segment filter broadcasts (~1/5 of
    * customers); orders⋈lineitem shuffles on orderkey only after date
    * pushdown prunes both scans. */
  val q03ShippingPriority = QueryDef(
    "q03_shipping_priority",
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1998-03-15 00:00:00").cast("timestamp"))
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1998-03-15 00:00:00").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      // timestamp_ntz: parquet isAdjustedToUTC=false, matching the oracle's
      // naive TIMESTAMP (session tz is UTC so the wall clock is identical)
      .select(col("l_orderkey"), col("revenue"),
        col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q4-style order priority check: EXISTS as left-semi join.
    * Scale: semi-join carries no lineitem payload columns through shuffle. */
  val q04OrderPriority = QueryDef(
    "q04_order_priority",
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01 00:00:00").cast("timestamp"))
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q5-style local supplier volume: 6-way join.
    * Scale: region/nation/supplier broadcast (tiny); the single shuffle is
    * lineitem⋈orders on orderkey; customer joined via broadcast after its
    * nation filter. */
  val q05LocalSupplierVolume = QueryDef(
    "q05_local_supplier_volume",
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    val region = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(s, dir)
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
    val supp = Tables.supplier(s, dir)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
    val cust = Tables.customer(s, dir)
    Tables.lineitem(s, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q6-style revenue forecast: pure filter + global agg.
    * Scale: all three predicates push to the parquet scan; single-row out. */
  val q06ForecastRevenue = QueryDef(
    "q06_forecast_revenue",
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(
        round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Ranking window: top-3 customers by balance per nation.
    * Scale: single shuffle on the partition key; rank filter applied
    * streaming inside the window operator (WindowGroupLimit pushes k=3 down
    * in Spark 3.5+). */
  val q07WindowRank = QueryDef(
    "q07_window_rank",
    """SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY c_nationkey
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer) t
      |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
      // bigint: DuckDB's row_number() is int64, Spark's is int32
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy(col("c_nationkey"), col("rn"))
  }

  /** Exact distinct counts per group. Scale: two-phase distinct-aggregate
    * (expand + partial) — no driver-side set. */
  val q08DistinctCounts = QueryDef(
    "q08_distinct_counts",
    """SELECT l_returnflag,
      |  count(DISTINCT l_suppkey) AS n_supp,
      |  count(DISTINCT l_partkey) AS n_part,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** Set operation: high-balance customers who never ordered (EXCEPT).
    * Scale: EXCEPT = shuffle-dedup both sides on the single projected column. */
  val q09SetExcept = QueryDef(
    "q09_set_except",
    """SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val rich = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 5000).select(col("c_custkey"))
    val ordered = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    rich.except(ordered).orderBy(col("c_custkey"))
  }

  /** ROLLUP hierarchy totals. Scale: Expand operator multiplies rows by
    * grouping-set count before partial agg — still map-side combined. */
  val q10Rollup = QueryDef(
    "q10_rollup",
    """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** Event-time tumbling window aggregation (batch form of the streaming
    * hourly rollup). Scale: time bucket + type = bounded group count;
    * partial agg collapses before shuffle. */
  val q11EventsHourly = QueryDef(
    "q11_events_hourly",
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** JSON extraction from the schemaless props column (reference F4:
    * schemaless JSON decode, SURVEY §2.7). Scale: json path eval is
    * codegen'd per row; no UDF. */
  val q12JsonExtract = QueryDef(
    "q12_json_extract",
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** Upsert semantics as a query: last-wins state per key — exactly the
    * PK-dedup the reference's MERGE INTO performs per batch (SURVEY §2.5
    * W2/W4, DucklakeWriter.java:98-187). Scale: single shuffle on the PK;
    * WindowGroupLimit keeps only rank-1 rows flowing. */
  val q13UpsertLatest = QueryDef(
    "q13_upsert_latest",
    """SELECT user_id, ts AS last_ts, event_type AS last_event,
      |  value AS last_value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |        ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts").cast("timestamp_ntz").as("last_ts"),
        col("event_type").as("last_event"), col("value").as("last_value"))
      .orderBy(col("user_id"))
  }

  /** Anti join: customers with no orders (the DLQ-style "unmatched rows"
    * shape, reference E2). Scale: left-anti broadcast when the right side
    * is small post-projection; else shuffled anti. */
  val q14CustomersNoOrders = QueryDef(
    "q14_customers_no_orders",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(
        Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("2001-01-01 00:00:00").cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Statistical aggregates per group (round-tripped to 2 decimals for
    * cross-engine float stability). */
  val q15AggStats = QueryDef(
    "q15_agg_stats",
    """SELECT o_orderstatus, count(*) AS n,
      |  round(min(o_totalprice), 2) AS min_price,
      |  round(max(o_totalprice), 2) AS max_price,
      |  round(avg(o_totalprice), 2) AS avg_price,
      |  round(stddev_samp(o_totalprice), 2) AS sd_price
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        round(avg(col("o_totalprice")), 2).as("avg_price"),
        round(stddev_samp(col("o_totalprice")), 2).as("sd_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Conditional aggregation (pivot-style counts per priority bucket). */
  val q16ConditionalAgg = QueryDef(
    "q16_conditional_agg",
    """SELECT o_orderstatus,
      |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
      |  CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
      |  round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END), 2) AS urgent_value,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("n_urgent"),
        sum(when(col("o_orderpriority") === "5-LOW", 1).otherwise(0)).as("n_low"),
        round(sum(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice")).otherwise(0)), 2).as("urgent_value"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  val all: Seq[QueryDef] = Seq(
    q01PricingSummary, q02TopkOrders, q03ShippingPriority, q04OrderPriority,
    q05LocalSupplierVolume, q06ForecastRevenue, q07WindowRank,
    q08DistinctCounts, q09SetExcept, q10Rollup, q11EventsHourly,
    q12JsonExtract, q13UpsertLatest, q14CustomersNoOrders, q15AggStats,
    q16ConditionalAgg)
}
