package graft.analytics

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core: joins (broadcast + shuffle), aggregations, windows,
  * set ops, rollup, subqueries — the generic engine capabilities SURVEY.md
  * §2.5/§2.6 calls for over the harness star schema (TESTDATA.md).
  *
  * Scale design notes (local[32] tests, 1000-executor target):
  *  - Dim tables (region/nation/customer/supplier/part) are explicitly
  *    `broadcast()` so fact-side scans never shuffle for them.
  *  - Fact-fact joins (orders⋈lineitem) are left to Catalyst's sort-merge
  *    with AQE; both sides shuffle-partition on the join key once.
  *  - Money aggregates run in EXACT DECIMAL end-to-end (the
  *    `q1_pricing_decimal` convention): inputs cast to DECIMAL(12,2) at
  *    the scan (lossless — every money/qty column in the harness data is
  *    exactly 2 dp), products carry scale 4, and sums publish as
  *    fixed-scale digit STRINGS so the compare is representation- and
  *    accumulation-order-independent. The earlier round(sum(double), 2)
  *    convention was a LATENT scale bug: at the r11 decade sweep q9's
  *    ~1e8 double sums flipped the 2 dp rounding on 8/175 groups purely
  *    from accumulation order — every other multi-group money sum here
  *    carried the same class, just with fewer dice rolls. Averages and
  *    ratios publish as integer fixed-point units derived from the exact
  *    decimal sums with `div` (non-negative ground, so Spark `div` and
  *    DuckDB `//` agree) — no double is ever summed into a compared
  *    column.
  *  - Top-K always goes through orderBy+limit → TakeOrderedAndProject
  *    (per-partition heaps, no global sort).
  */
object Relational extends QueryPack {

  /** TPC-H Q1-style pricing summary: partial-agg heavy, 6 aggregates —
    * all money math exact DECIMAL; averages publish as integer
    * fixed-point units (e4 for qty, e6 for discount) derived from the
    * exact sums via `div`, so no compared cell depends on double
    * accumulation order at any scale.
    */
  private val q1 = Q(
    "q1_pricing_summary",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Money.sumMoney2(col("l_quantity")).as("sum_qty"),
          Money.sumMoney2(col("l_extendedprice")).as("sum_base_price"),
          Money.sumMoney4(Money.disc4(col("l_extendedprice"), col("l_discount")))
            .as("sum_disc_price"),
          Money.avgUnits(sum(Money.dec2(col("l_quantity"))), count(lit(1)), 2, 4)
            .as("avg_qty_e4"),
          Money.avgUnits(sum(Money.dec2(col("l_discount"))), count(lit(1)), 2, 6)
            .as("avg_disc_e6"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
           | CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(20,2))
           |   AS STRING) AS sum_qty,
           | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(20,2))
           |   AS STRING) AS sum_base_price,
           | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
           |     * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
           |   AS DECIMAL(24,4)) AS STRING) AS sum_disc_price,
           | CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) * 100 AS BIGINT)
           |   // count(*) AS avg_qty_e4,
           | CAST(sum(CAST(l_discount AS DECIMAL(12,2))) * 10000 AS BIGINT)
           |   // count(*) AS avg_disc_e6,
           | count(*) AS count_order
           |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    headline = true)

  /** TPC-H Q3-style: dim-filter broadcast join + fact-fact join + top-10. */
  private val q3 = Q(
    "q3_top_revenue_orders",
    (s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      broadcast(cust)
        .join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        // order on the exact DECIMAL, publish the digit string — the
        // top-10 cut is then deterministic at any scale (a double
        // revenue made the boundary rank accumulation-order-dependent)
        .agg(Money.sumDec4(Money.disc4(col("l_extendedprice"), col("l_discount")))
          .as("rev_dec"))
        .orderBy(col("rev_dec").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"),
          col("rev_dec").cast("string").as("revenue"))
    },
    Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
           | CAST(rev_dec AS STRING) AS revenue
           |FROM (
           | SELECT l_orderkey, o_orderdate, o_orderpriority,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
           |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
           |   AS DECIMAL(24,4)) AS rev_dec
           | FROM customer JOIN orders ON c_custkey = o_custkey
           |  JOIN lineitem ON o_orderkey = l_orderkey
           | WHERE c_mktsegment = 'BUILDING'
           | GROUP BY 1, 2, 3 ORDER BY rev_dec DESC, l_orderkey LIMIT 10) t"""
      .stripMargin),
    headline = true)

  /** TPC-H Q5-style: 6-table star join, dims broadcast, facts sort-merge. */
  private val q5 = Q(
    "q5_nation_revenue",
    (s, d) => {
      val joined = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
      joined
        .groupBy(col("n_name"))
        .agg(Money.sumMoney4(Money.disc4(col("l_extendedprice"), col("l_discount")))
          .as("revenue"))
        .orderBy(col("n_name"))
    },
    Some("""SELECT n_name,
           | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
           |     * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
           |   AS DECIMAL(24,4)) AS STRING) AS revenue
           |FROM lineitem
           | JOIN orders ON l_orderkey = o_orderkey
           | JOIN supplier ON l_suppkey = s_suppkey
           | JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
           | JOIN nation ON s_nationkey = n_nationkey
           | JOIN region ON n_regionkey = r_regionkey
           |WHERE r_name = 'ASIA'
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** TPC-H Q6-style: pure scan+filter+agg — pushdown showcase. */
  private val q6 = Q(
    "q6_revenue_forecast",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum(Money.dec2(col("l_extendedprice")) * Money.dec2(col("l_discount")))
          .cast("decimal(24,4)").cast("string").as("revenue"))
    },
    Some("""SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
           |    * CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(24,4))
           |  AS STRING) AS revenue
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
           |  AND l_shipdate < TIMESTAMP '1996-01-01'
           |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin),
    headline = true)

  /** Broadcast dim join + group on dim attribute. */
  private val brandVolume = Q(
    "join_brand_volume",
    (s, d) => {
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(Money.sumMoney2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand,
           | CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(20,2))
           |   AS STRING) AS sum_qty,
           | count(*) AS n
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Anti join: customers that never ordered. */
  private val antiJoin = Q(
    "join_anti_customers_no_orders",
    (s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    // NOT EXISTS (not NOT IN): the exact left_anti equivalent under NULLs —
    // a NULL o_custkey would make NOT IN return zero rows.
    Some("""SELECT c_custkey, c_name FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           |ORDER BY c_custkey""".stripMargin))

  /** TPC-H Q13 shape: LEFT OUTER join + two-level aggregation — customers
    * keep their zero-order rows (count over the null side = 0).
    */
  private val leftOuterQ13 = Q(
    "join_left_outer_custdist",
    (s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, count(*) AS custdist FROM (
           | SELECT c_custkey, count(o_orderkey) AS c_count
           | FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           | GROUP BY 1) t
           |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin))

  /** HAVING shape: post-aggregation filter (Catalyst folds it into the
    * final agg — no second shuffle).
    */
  private val havingQ = Q(
    "agg_having_heavy_parts",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"), Money.sumMoney2(col("l_quantity")).as("sum_qty"))
      .filter(col("n") >= 40)
      .orderBy(col("l_partkey")),
    Some("""SELECT l_partkey, count(*) AS n,
           | CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(20,2))
           |   AS STRING) AS sum_qty
           |FROM lineitem GROUP BY 1 HAVING count(*) >= 40
           |ORDER BY l_partkey""".stripMargin))

  /** TPC-H Q10 shape: returned-item customer ranking — fact-fact join
    * filtered on the return flag, grouped on the customer, top-20 by
    * revenue (TakeOrderedAndProject again; customer attrs ride the
    * broadcast).
    */
  private val q10 = Q(
    "q10_returned_item_customers",
    (s, d) => {
      Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d).filter(
          col("o_orderdate") >= lit("1995-01-01") &&
            col("o_orderdate") < lit("1996-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(Money.sumDec4(Money.disc4(col("l_extendedprice"), col("l_discount")))
          .as("rev_dec"))
        .orderBy(col("rev_dec").desc, col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"),
          col("rev_dec").cast("string").as("revenue"))
    },
    Some("""SELECT c_custkey, c_name, CAST(rev_dec AS STRING) AS revenue
           |FROM (
           | SELECT c_custkey, c_name,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
           |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
           |   AS DECIMAL(24,4)) AS rev_dec
           | FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           | WHERE l_returnflag = 'R'
           |  AND o_orderdate >= TIMESTAMP '1995-01-01'
           |  AND o_orderdate < TIMESTAMP '1996-01-01'
           | GROUP BY 1, 2 ORDER BY rev_dec DESC, c_custkey LIMIT 20) t"""
      .stripMargin))

  /** TPC-H Q7 shape: bilateral shipping volume between nation pairs —
    * the same nation dim joined TWICE under different roles (supplier
    * side and customer side), both broadcast.
    */
  private val q7 = Q(
    "q7_nation_pair_volume",
    (s, d) => {
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter(col("supp_nation").isin("NATION_1", "NATION_2") &&
          col("cust_nation").isin("NATION_1", "NATION_2") &&
          col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"))
        .agg(Money.sumMoney4(Money.disc4(col("l_extendedprice"), col("l_discount")))
          .as("volume"), count(lit(1)).as("n"))
        .orderBy(col("supp_nation"), col("cust_nation"))
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
           |     * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
           |   AS DECIMAL(24,4)) AS STRING) AS volume,
           | count(*) AS n
           |FROM lineitem
           | JOIN orders ON l_orderkey = o_orderkey
           | JOIN supplier ON l_suppkey = s_suppkey
           | JOIN customer ON o_custkey = c_custkey
           | JOIN nation n1 ON s_nationkey = n1.n_nationkey
           | JOIN nation n2 ON c_nationkey = n2.n_nationkey
           |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
           |  AND n2.n_name IN ('NATION_1', 'NATION_2')
           |  AND n1.n_name <> n2.n_name
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** The spark.sql facade: identical text runs in both engines — the
    * engine's SQL front end is exercised, not just the DataFrame DSL.
    */
  private val sqlFacade = Q(
    "sql_revenue_by_segment",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("v_customer")
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      s.sql("""SELECT c_mktsegment, count(*) AS n,
              | CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
              |   AS DECIMAL(20,2)) AS STRING) AS revenue
              |FROM v_customer JOIN v_orders ON c_custkey = o_custkey
              |GROUP BY 1 ORDER BY 1""".stripMargin)
    },
    // the facade's point is IDENTICAL text in both engines — STRING is
    // a type alias DuckDB and Spark both accept, so the text stays one
    Some("""SELECT c_mktsegment, count(*) AS n,
           | CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
           |   AS DECIMAL(20,2)) AS STRING) AS revenue
           |FROM customer JOIN orders ON c_custkey = o_custkey
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Semi join: suppliers with any late-epoch shipment. */
  private val semiJoin = Q(
    "join_semi_active_suppliers",
    (s, d) => {
      val late = Tables.lineitem(s, d).filter(col("l_shipdate") >= lit("2001-01-01"))
      Tables.supplier(s, d)
        .join(late, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    },
    Some("""SELECT s_suppkey, s_name FROM supplier
           |WHERE EXISTS (SELECT 1 FROM lineitem
           |  WHERE l_suppkey = s_suppkey AND l_shipdate >= TIMESTAMP '2001-01-01')
           |ORDER BY s_suppkey""".stripMargin))

  /** Top-K heavy-hitter parts — plans as TakeOrderedAndProject. */
  private val topkParts = Q(
    "topk_parts_by_lineitems",
    (s, d) => Analytics.topK(Tables.lineitem(s, d), "l_partkey", 10),
    Some("""SELECT l_partkey, count(*) AS n FROM lineitem
           |GROUP BY 1 ORDER BY n DESC, l_partkey NULLS FIRST LIMIT 10""".stripMargin),
    headline = true)

  /** Ranking window: top-3 orders per customer. The verified output is
    * reduced per rank (3 rows at any scale) — sum(o_orderkey) pins the
    * exact per-customer selections without the r2 version's global sort
    * of 3×|customers| rows (VERDICT r2 #4). The window itself still
    * executes over every order.
    */
  private val windowRank = Q(
    "window_rank_top3_orders",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy(col("rn"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_orderkey"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy(col("rn"))
    },
    Some("""SELECT rn, count(*) AS n,
           | CAST(sum(o_orderkey) AS BIGINT) AS sum_orderkey,
           | min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
           |FROM (
           | SELECT o_orderkey, o_totalprice,
           |  row_number() OVER (PARTITION BY o_custkey
           |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
           | FROM orders) t WHERE rn <= 3 GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** Analytic window: per-user running sum (deterministic accumulation
    * order inside the frame ⇒ stable doubles), then reduced per user so the
    * verified result is bounded by |users|, not |events| — no full-table
    * global sort at any scale (the r1 version ordered every output row by
    * event_id, a scale-killer flagged in VERDICT.md).
    */
  private val windowRunning = Q(
    "window_running_user_value",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), sum(col("value")).over(w).as("run"))
        .groupBy(col("user_id"))
        .agg(round(max(col("run")), 2).as("max_running"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""WITH r AS (
           | SELECT user_id, sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
           | FROM events)
           |SELECT user_id, round(max(run), 2) AS max_running,
           | count(*) AS n_events
           |FROM r GROUP BY 1 ORDER BY 1""".stripMargin))

  /** lag()-based sessionization: 30-minute inactivity gap per user. */
  private val sessionize = Q(
    "window_sessionize_users",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("brk",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("brk")).as("n_sessions"))
        .orderBy(col("user_id"))
    },
    Some("""WITH g AS (
           | SELECT user_id, ts,
           |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           |        OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           |             + INTERVAL 30 MINUTE
           |       THEN 1 ELSE 0 END AS brk
           | FROM events)
           |SELECT user_id, CAST(sum(brk) AS BIGINT) AS n_sessions
           |FROM g GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Rollup (grouping sets) over the q1 keys. */
  private val rollupQ = Q(
    "agg_rollup_flag_status",
    (s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(Money.sumMoney2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },
    Some("""SELECT l_returnflag, l_linestatus,
           | CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(20,2))
           |   AS STRING) AS sum_qty,
           | count(*) AS n
           |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
           |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin))

  /** Cube over two independent dims. */
  private val cubeQ = Q(
    "agg_cube_status_priority",
    (s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), Money.sumMoney2(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },
    Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           | CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(20,2))
           |   AS STRING) AS sum_price
           |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
           |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin))

  /** Scalar subquery: count of orders above global average price. The
    * above-average test runs in exact centi-units (price·n > Σprice —
    * both sides ×n, no division): a double average put boundary rows'
    * in/out decision on accumulation order (the q17/q22 predicate
    * class). The cross-product price_c·n_ord runs in DECIMAL(38,0), not
    * BIGINT: at the 100 TB envelope (~5.5e7 cents × ~1.5e11 orders ≈
    * 8.2e18) the BIGINT form sits within ~11% of Long.MaxValue, past
    * which non-ANSI Spark wraps silently while DuckDB errors — the
    * engines would diverge without either noticing. DECIMAL(38,0) has
    * ~19 more digits of headroom on both engines (r11 ADVICE).
    */
  private val scalarSub = Q(
    "agg_orders_above_avg",
    (s, d) => {
      val ord = Tables.orders(s, d)
        .withColumn("price_c", round(col("o_totalprice") * 100).cast("long"))
      val avgP = ord.agg(sum(col("price_c")).as("sum_price_c"),
        count(lit(1)).as("n_ord"))
      ord.crossJoin(broadcast(avgP))
        .filter(col("price_c").cast("decimal(38,0)") * col("n_ord")
          > col("sum_price_c").cast("decimal(38,0)"))
        .agg(count(lit(1)).as("n_above"))
    },
    Some("""WITH a AS (SELECT
           |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           |    AS sum_price_c,
           |  count(*) AS n_ord
           | FROM orders)
           |SELECT count(*) AS n_above FROM orders, a
           |WHERE CAST(round(o_totalprice * 100) AS DECIMAL(38,0)) * n_ord
           |  > CAST(sum_price_c AS DECIMAL(38,0))""".stripMargin))

  /** Set op: distinct (user, type) pairs seen in week 1 but never again. */
  private val exceptQ = Q(
    "setop_week1_only_pairs",
    (s, d) => {
      val ev = Tables.events(s, d)
      val w1 = ev.filter(col("ts") < lit("2024-01-08")).select(col("user_id"), col("event_type"))
      val rest = ev.filter(col("ts") >= lit("2024-01-08")).select(col("user_id"), col("event_type"))
      w1.except(rest).orderBy(col("user_id"), col("event_type"))
    },
    Some("""SELECT user_id, event_type FROM events WHERE ts < TIMESTAMP '2024-01-08'
           |EXCEPT
           |SELECT user_id, event_type FROM events WHERE ts >= TIMESTAMP '2024-01-08'
           |ORDER BY user_id, event_type""".stripMargin))

  /** Set op: users active in both the first and last week. */
  private val intersectQ = Q(
    "setop_retained_users",
    (s, d) => {
      val ev = Tables.events(s, d)
      val w1 = ev.filter(col("ts") < lit("2024-01-08")).select(col("user_id"))
      val wLast = ev.filter(col("ts") >= lit("2024-01-24")).select(col("user_id"))
      w1.intersect(wLast).orderBy(col("user_id"))
    },
    Some("""SELECT user_id FROM events WHERE ts < TIMESTAMP '2024-01-08'
           |INTERSECT
           |SELECT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-24'
           |ORDER BY user_id""".stripMargin))

  /** ROLLUP over the TIME hierarchy (year → quarter → month) — the
    * report-cube flavor the flag/status rollups don't pin: the
    * hierarchy levels are DERIVED integer columns of one date, so the
    * NULL subtotal rows nest (month subtotals within quarter within
    * year within grand total). Revenue through exact integer cents;
    * grouping() flags CAST to INT on both engines per the house rule.
    */
  private val timeRollup = Q(
    "agg_time_rollup_revenue",
    (s, d) => {
      Tables.orders(s, d)
        .select(year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .rollup(col("y"), col("q"), col("m"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("rev_c"),
          (grouping(col("y")) * 4 + grouping(col("q")) * 2 +
            grouping(col("m"))).cast("int").as("lvl"))
        .orderBy(col("y").asc_nulls_first, col("q").asc_nulls_first,
          col("m").asc_nulls_first)
    },
    Some("""SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q,
           | month(o_orderdate) AS m, count(*) AS n,
           | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           |   AS rev_c,
           | CAST(grouping(year(o_orderdate)) * 4
           |   + grouping(quarter(o_orderdate)) * 2
           |   + grouping(month(o_orderdate)) AS INT) AS lvl
           |FROM orders
           |GROUP BY ROLLUP(year(o_orderdate), quarter(o_orderdate),
           |  month(o_orderdate))
           |ORDER BY y NULLS FIRST, q NULLS FIRST, m NULLS FIRST"""
      .stripMargin))

  val qs: Seq[Q] = Seq(q1, q3, q5, q6, q7, q10, brandVolume, antiJoin,
    leftOuterQ13, havingQ, semiJoin, sqlFacade, topkParts, windowRank,
    windowRunning, sessionize, rollupQ, cubeQ, timeRollup, scalarSub,
    exceptQ, intersectQ)
}
