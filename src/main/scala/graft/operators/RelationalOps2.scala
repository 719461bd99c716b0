package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second band of the relational surface: multidimensional aggregation,
  * exact percentiles, pivot, subquery shapes, outer joins, scalar function
  * coverage, and advanced window functions. Same design rules as
  * [[RelationalOps]] (pushdown-first, broadcast dims, partial aggs,
  * deterministic ordering + rounded floats for the oracle gate). */
object RelationalOps2 {

  /** CUBE over two dimensions (Expand + partial agg). */
  val q34Cube = QueryDef(
    "q34_cube",
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  round(sum(l_extendedprice), 2) AS total
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("total"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** Exact interpolated percentiles + median per group. */
  val q35Percentiles = QueryDef(
    "q35_percentiles",
    """SELECT o_orderstatus,
      |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
      |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
      |  round(quantile_cont(o_totalprice, 0.99), 2) AS p99
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 2).as("p99"))
      .orderBy(col("o_orderstatus"))
  }

  /** Pivot: order value by status × priority (wide form). */
  val q36Pivot = QueryDef(
    "q36_pivot",
    """SELECT o_orderstatus,
      |  round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END), 2) AS urgent,
      |  round(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice ELSE 0 END), 2) AS medium,
      |  round(sum(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice ELSE 0 END), 2) AS low
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", Seq("1-URGENT", "3-MEDIUM", "5-LOW"))
      .agg(round(sum(col("o_totalprice")), 2))
      .withColumnRenamed("1-URGENT", "urgent")
      .withColumnRenamed("3-MEDIUM", "medium")
      .withColumnRenamed("5-LOW", "low")
      // a status×priority cell with no rows pivots to null, but the
      // oracle's CASE-WHEN sum yields 0.0 — align
      .select(col("o_orderstatus"),
        coalesce(col("urgent"), lit(0.0)).as("urgent"),
        coalesce(col("medium"), lit(0.0)).as("medium"),
        coalesce(col("low"), lit(0.0)).as("low"))
      .orderBy(col("o_orderstatus"))
  }

  /** Correlated scalar subquery: customers above their nation's average
    * balance. Spark shape: broadcast per-nation aggregate joined back —
    * the decorrelated plan Catalyst would produce. */
  val q37CorrSubquery = QueryDef(
    "q37_corr_subquery",
    """SELECT c_nationkey, count(*) AS n_above
      |FROM customer c
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
      |                   WHERE c_nationkey = c.c_nationkey)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
    val cust = Tables.customer(s, dir)
    val avgs = cust.groupBy(col("c_nationkey").as("__nk"))
      .agg(avg(col("c_acctbal")).as("__avg"))
    cust.join(broadcast(avgs), col("c_nationkey") === col("__nk"))
      .filter(col("c_acctbal") > col("__avg"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_above"))
      .orderBy(col("c_nationkey"))
  }

  /** IN-subquery as a semi join: suppliers in ASIA/EUROPE nations. */
  val q38InSubquery = QueryDef(
    "q38_in_subquery",
    """SELECT s_nationkey, count(*) AS n_supp
      |FROM supplier WHERE s_nationkey IN (
      |  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name IN ('ASIA', 'EUROPE'))
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin) { (s, dir) =>
    val nations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name").isin("ASIA", "EUROPE"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    Tables.supplier(s, dir)
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"))
      .orderBy(col("s_nationkey"))
  }

  /** Full outer join of two daily activity series (order days vs ship
    * days), mismatched days surfacing as nulls. */
  val q39FullOuter = QueryDef(
    "q39_full_outer",
    """WITH od AS (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n_orders
      |            FROM orders GROUP BY 1),
      |sd AS (SELECT CAST(l_shipdate AS DATE) AS d, count(*) AS n_ships
      |       FROM lineitem GROUP BY 1)
      |SELECT coalesce(od.d, sd.d) AS d,
      |  coalesce(n_orders, 0) AS n_orders, coalesce(n_ships, 0) AS n_ships
      |FROM od FULL OUTER JOIN sd ON od.d = sd.d
      |ORDER BY d""".stripMargin) { (s, dir) =>
    val od = Tables.orders(s, dir)
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(count(lit(1)).as("n_orders"))
    val sd = Tables.lineitem(s, dir)
      .groupBy(col("l_shipdate").cast("date").as("d"))
      .agg(count(lit(1)).as("n_ships"))
    od.join(sd, Seq("d"), "full_outer")
      .select(col("d"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_ships"), lit(0L)).as("n_ships"))
      .orderBy(col("d"))
  }

  /** String function coverage: upper/substring/concat/LIKE/regexp. */
  val q40StringFuncs = QueryDef(
    "q40_string_funcs",
    """SELECT upper(substring(p_type, 1, 3)) AS prefix,
      |  count(*) AS n,
      |  CAST(sum(CASE WHEN p_name LIKE '%re%' THEN 1 ELSE 0 END) AS BIGINT) AS n_re,
      |  CAST(sum(length(regexp_extract(p_brand, '[0-9]+', 0))) AS BIGINT) AS brand_digits
      |FROM part GROUP BY 1 ORDER BY prefix""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .groupBy(upper(substring(col("p_type"), 1, 3)).as("prefix"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("p_name").like("%re%"), 1).otherwise(0)).as("n_re"),
        sum(length(regexp_extract(col("p_brand"), "[0-9]+", 0))).as("brand_digits"))
      .orderBy(col("prefix"))
  }

  /** Date part extraction: year/quarter/month/day-of-week rollups.
    * (Spark dayofweek is 1=Sunday; DuckDB dow is 0=Sunday.) */
  val q41DateFuncs = QueryDef(
    "q41_date_funcs",
    """SELECT CAST(extract(year FROM o_orderdate) AS INTEGER) AS y,
      |  CAST(extract(quarter FROM o_orderdate) AS INTEGER) AS q,
      |  CAST(extract(dow FROM o_orderdate) AS INTEGER) AS dow,
      |  count(*) AS n
      |FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1996-01-01 00:00:00").cast("timestamp"))
      .groupBy(
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        (dayofweek(col("o_orderdate")) - 1).as("dow"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("y"), col("q"), col("dow"))
  }

  /** Null-handling semantics: nullif/coalesce/count-vs-count(col). */
  val q42NullHandling = QueryDef(
    "q42_null_handling",
    """WITH t AS (SELECT nullif(o_orderstatus, 'O') AS st, o_totalprice FROM orders)
      |SELECT coalesce(st, '∅') AS status, count(*) AS n_rows, count(st) AS n_nonnull,
      |  round(sum(CASE WHEN st IS NULL THEN o_totalprice ELSE 0 END), 2) AS open_value
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .select(nullif(col("o_orderstatus"), lit("O")).as("st"), col("o_totalprice"))
      .groupBy(coalesce(col("st"), lit("∅")).as("status"))
      .agg(count(lit(1)).as("n_rows"), count(col("st")).as("n_nonnull"),
        round(sum(when(col("st").isNull, col("o_totalprice")).otherwise(0)), 2).as("open_value"))
      .orderBy(col("status"))
  }

  /** INTERSECT: customers active in both halves of the time range. */
  val q43Intersect = QueryDef(
    "q43_intersect",
    """SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    val ord = Tables.orders(s, dir)
    val early = ord.filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .select(col("o_custkey"))
    val late = ord.filter(col("o_orderdate") >= lit("1998-01-01 00:00:00").cast("timestamp"))
      .select(col("o_custkey"))
    early.intersect(late).orderBy(col("o_custkey"))
  }

  /** Advanced windows: lag/lead + running aggregate per key (bounded
    * output slice for determinism). */
  val q44WindowRunning = QueryDef(
    "q44_window_running",
    """SELECT user_id, event_id,
      |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running,
      |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
      |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |FROM events WHERE user_id < 5
      |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .filter(col("user_id") < 5)
      .select(col("user_id"), col("event_id"),
        round(sum(col("value")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** HAVING over a join aggregate: prolific suppliers. */
  val q45Having = QueryDef(
    "q45_having",
    """SELECT l_suppkey, count(*) AS n_items, sum(l_quantity) AS total_qty
      |FROM lineitem GROUP BY l_suppkey
      |HAVING count(*) > 70 AND sum(l_quantity) > 1500
      |ORDER BY l_suppkey""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("total_qty"))
      .filter(col("n_items") > 70 && col("total_qty") > 1500)
      .orderBy(col("l_suppkey"))
  }

  /** Distribution-rank windows: ntile/percent_rank/cume_dist per group. */
  val q58WindowRanks = QueryDef(
    "q58_window_ranks",
    """SELECT c_nationkey, c_custkey,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 4) AS pr,
      |  round(cume_dist() OVER w, 4) AS cd
      |FROM customer WHERE c_nationkey < 3
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_nationkey, c_custkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .filter(col("c_nationkey") < 3)
      .select(col("c_nationkey"), col("c_custkey"),
        ntile(4).over(w).cast("long").as("quartile"), // DuckDB ntile is int64
        round(percent_rank().over(w), 4).as("pr"),
        round(cume_dist().over(w), 4).as("cd"))
      .orderBy(col("c_nationkey"), col("c_custkey"))
  }

  val all: Seq[QueryDef] = Seq(
    q34Cube, q35Percentiles, q36Pivot, q37CorrSubquery, q38InSubquery,
    q39FullOuter, q40StringFuncs, q41DateFuncs, q42NullHandling,
    q43Intersect, q44WindowRunning, q45Having, q58WindowRanks)
}
