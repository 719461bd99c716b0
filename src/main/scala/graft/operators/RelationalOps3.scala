package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Third band of the relational surface: Spark 4 SQL features — recursive
  * CTEs, UNPIVOT, GROUPING SETS, multiset EXCEPT ALL, ordered LISTAGG,
  * and sketch aggregates. */
object RelationalOps3 {

  /** Recursive CTE (Spark 4 WITH RECURSIVE, UNION ALL semantics — must be
    * acyclic): ancestor-chain walk over a synthesized binary-tree key
    * hierarchy (parent = floor(key/2)), aggregating balances along each
    * chain. The identical SQL text runs on both engines. */
  private val q51Sql =
    """WITH RECURSIVE chain(start_key, cur, bal) AS (
      |  SELECT c_custkey, c_custkey, c_acctbal FROM customer WHERE c_custkey < 100
      |  UNION ALL
      |  SELECT chain.start_key, c.c_custkey, c.c_acctbal
      |  FROM chain JOIN customer c
      |    ON c.c_custkey = CAST(floor(chain.cur / 2.0) AS BIGINT)
      |  WHERE chain.cur > 1)
      |SELECT start_key, count(*) AS depth, round(sum(bal), 2) AS chain_bal
      |FROM chain GROUP BY start_key ORDER BY start_key""".stripMargin

  val q51RecursiveChain = QueryDef(
    "q51_recursive_chain",
    q51Sql) { (s, dir) =>
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    s.sql(q51Sql)
  }

  /** UNPIVOT: wide per-flag measures melted to (measure, value) rows. */
  val q52Unpivot = QueryDef(
    "q52_unpivot",
    """WITH agg AS (SELECT l_returnflag,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_price,
      |  round(sum(l_discount), 2) AS sum_disc
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, measure, value FROM (
      |  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM agg
      |  UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM agg
      |  UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM agg) t
      |ORDER BY l_returnflag, measure""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(sum(col("l_discount")), 2).as("sum_disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "measure", "value")
      .orderBy(col("l_returnflag"), col("measure"))
  }

  /** Explicit GROUPING SETS (mixed granularities in one pass). */
  val q53GroupingSets = QueryDef(
    "q53_grouping_sets",
    """SELECT l_returnflag, l_linestatus, count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).createOrReplaceTempView("__q53_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM __q53_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }

  /** Multiset EXCEPT ALL: order-priority multiset minus one row per
    * status (bag semantics, duplicates preserved). */
  val q54ExceptAll = QueryDef(
    "q54_except_all",
    """SELECT o_orderpriority, count(*) AS n FROM (
      |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
      |  EXCEPT ALL
      |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F') t
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val ord = Tables.orders(s, dir)
    ord.filter(col("o_orderstatus") === "O").select(col("o_orderpriority"))
      .exceptAll(ord.filter(col("o_orderstatus") === "F").select(col("o_orderpriority")))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** Ordered string aggregation (LISTAGG WITHIN GROUP): top customer names
    * per nation, deterministic order. */
  val q55Listagg = QueryDef(
    "q55_listagg",
    """WITH top3 AS (SELECT c_nationkey, c_name FROM (
      |  SELECT c_nationkey, c_name, row_number() OVER (PARTITION BY c_nationkey
      |    ORDER BY c_acctbal DESC, c_custkey) AS rn FROM customer) t WHERE rn <= 3)
      |SELECT c_nationkey, string_agg(c_name, ',' ORDER BY c_name) AS names
      |FROM top3 GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .createOrReplaceTempView("__q55_top3")
    s.sql(
      """SELECT c_nationkey,
        |  listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name) AS names
        |FROM __q55_top3 GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
  }

  /** HLL sketch aggregate (approx_count_distinct), emitted as its
    * verification contract: the EXACT distinct counts (real,
    * oracle-recomputable values) plus a `sketch_ok` witness that both
    * sketches landed within 5× the configured 2 % relative error — wide
    * enough to be deterministic on any corpus (HLL++ error concentrates
    * near rsd), tight enough to catch a broken sketch outright. Turns the
    * rows-only entry into a hash-gated one; the tighter per-rsd error
    * band stays unit-tested (RelationalOps3Spec). */
  val q56ApproxDistinct = QueryDef(
    "q56_approx_distinct",
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_orderkey) AS n_orders, CAST(1 AS BIGINT) AS sketch_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        approx_count_distinct(col("l_partkey"), 0.02).as("__ap"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("__ao"))
      .select(col("l_returnflag"), col("n_parts"), col("n_orders"),
        when(abs(col("__ap") - col("n_parts")) <= col("n_parts") * 0.1 &&
          abs(col("__ao") - col("n_orders")) <= col("n_orders") * 0.1, 1L)
          .otherwise(0L).as("sketch_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** Skew-salted join on the gate: the engine's hot-key join (salted large
    * side × replicated small side) must produce byte-identical results to
    * the plain join the oracle runs. */
  val q57SaltedJoin = QueryDef(
    "q57_salted_join",
    """SELECT n_name, count(*) AS n_supp, round(sum(s_acctbal), 2) AS total_bal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
    val supp = Tables.supplier(s, dir)
      .withColumn("n_nationkey", col("s_nationkey"))
    val nation = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
    JoinOps.saltedJoin(supp, nation, Seq("n_nationkey"), saltFactor = 8)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_supp"), round(sum(col("s_acctbal")), 2).as("total_bal"))
      .orderBy(col("n_name"))
  }

  /** q99: bloom-pruned semi-join — restrict lineitem to urgent orders'
    * keys. The key set is a real fraction of a fact-sized table (too big
    * to broadcast as a hash relation at scale); the bloom sketch prunes
    * the large side MAP-SIDE before the semi-join shuffle, and the exact
    * join removes false positives, so the result equals the plain
    * semi-join row-for-row — which is exactly what the oracle runs. */
  val q99BloomPrune = QueryDef(
    "q99_bloom_prune",
    """SELECT l_returnflag, count(*) AS n_rows,
      |  round(sum(l_extendedprice), 2) AS total_price
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
      |                     WHERE o_orderpriority = '1-URGENT')
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    // sketch sizing: one column-pruned count of the key side (a sketch
    // sized from table stats would do at scale; the count is the honest
    // local form)
    val n = urgent.count()
    JoinOps.bloomSemiJoin(Tables.lineitem(s, dir), urgent,
      "l_orderkey", "o_orderkey", expectedItems = math.max(n, 1L))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_extendedprice")), 2).as("total_price"))
      .orderBy(col("l_returnflag"))
  }

  /** q103: quantile sketch (percentile_approx — Spark's GK-style
    * approximate percentile) through the same contract pattern as q56:
    * the EXACT interpolated percentiles are the oracle-recomputable
    * content (DuckDB `quantile_cont` uses the same continuous
    * interpolation), and `sketch_ok` witnesses that the sketch landed
    * within 5 % of exact on both quantiles — deterministic, wide enough
    * to never flap, tight enough to catch a broken sketch. At 100 TB the
    * sketch is the only viable path (exact percentile sorts every group);
    * this query pins that the cheap path stays near the truth. */
  val q103ApproxQuantile = QueryDef(
    "q103_approx_quantile",
    // cents-rounding via floor(x*100+0.5)/100, NOT round(x,2): both engines
    // compute the identical interpolated double, but DuckDB's double round
    // re-rounds the SCALED value (x*100 can land exactly on a .5 the true
    // value sits under) while Spark rounds the true value HALF_UP — at
    // sf0.001 that split a p50 across a cent. floor/scale is the same IEEE
    // op sequence on the same input in both engines, so it can never split.
    """SELECT l_returnflag,
      |  floor(quantile_cont(l_extendedprice, 0.5) * 100 + 0.5) / 100 AS p50,
      |  floor(quantile_cont(l_extendedprice, 0.95) * 100 + 0.5) / 100 AS p95,
      |  CAST(1 AS BIGINT) AS sketch_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
      .agg(
        expr("floor(percentile(l_extendedprice, 0.5D) * 100 + 0.5) / 100").as("p50"),
        expr("floor(percentile(l_extendedprice, 0.95D) * 100 + 0.5) / 100").as("p95"),
        expr("percentile_approx(l_extendedprice, 0.5D, 10000)").as("__a50"),
        expr("percentile_approx(l_extendedprice, 0.95D, 10000)").as("__a95"),
        expr("percentile(l_extendedprice, 0.5D)").as("__e50"),
        expr("percentile(l_extendedprice, 0.95D)").as("__e95"))
      .select(col("l_returnflag"), col("p50"), col("p95"),
        when(abs(col("__a50") - col("__e50")) <= col("__e50") * 0.05 &&
          abs(col("__a95") - col("__e95")) <= col("__e95") * 0.05, 1L)
          .otherwise(0L).as("sketch_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** q141: BINNED RANGE JOIN — events against time windows with NO
    * equi-key ([[JoinOps.binnedRangeJoin]]). Spark plans the raw
    * inequality join as BroadcastNestedLoopJoin (quadratic compares, a
    * driver OOM when the interval side grows); the binned rewrite joins
    * on a computed bin key and re-filters exactly, so the oracle's naive
    * inequality join must match row-for-row. Windows derive from the
    * corpus itself (ten half-open half-deciles of the event-time span,
    * all integer-µs arithmetic, so the construction hashes identically
    * across engines). PlanQualitySpec pins that no nested-loop join
    * appears in the plan. */
  val q141RangeJoin = QueryDef(
    "q141_range_join",
    """WITH b AS (SELECT min(epoch_us(ts)) AS tmin,
      |                  max(epoch_us(ts)) + 1 AS tmax FROM events),
      |w AS (SELECT CAST(r.k AS BIGINT) AS window_id,
      |        tmin + r.k * ((tmax - tmin) // 10) AS lo,
      |        tmin + r.k * ((tmax - tmin) // 10)
      |          + (((tmax - tmin) // 10) // 2) AS hi
      |      FROM b, range(10) r(k))
      |SELECT window_id, count(*) AS n_events,
      |  count(DISTINCT event_type) AS n_types
      |FROM events e JOIN w ON epoch_us(e.ts) >= w.lo AND epoch_us(e.ts) < w.hi
      |GROUP BY window_id ORDER BY window_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(unix_micros(col("ts")).as("p"), col("event_type"))
    val bounds = ev.agg(min(col("p")), max(col("p"))).head()
    val tmin = bounds.getLong(0)
    val tmax = bounds.getLong(1) + 1
    val d = (tmax - tmin) / 10
    val half = d / 2
    val intervals = s.range(10).select(col("id").as("window_id"),
      (lit(tmin) + col("id") * d).as("lo"),
      (lit(tmin) + col("id") * d + half).as("hi"))
    JoinOps.binnedRangeJoin(ev, intervals, "p", "lo", "hi",
      binSize = math.max(half / 4, 1L))
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy(col("window_id"))
  }

  val all: Seq[QueryDef] = Seq(
    q51RecursiveChain, q52Unpivot, q53GroupingSets, q54ExceptAll,
    q55Listagg, q56ApproxDistinct, q57SaltedJoin, q99BloomPrune,
    q103ApproxQuantile, q141RangeJoin)
}
