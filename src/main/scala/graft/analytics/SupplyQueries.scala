package graft.analytics

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Checkpoints.StageCheckpoint

/** TPC-H Q2/Q11/Q20 shapes — the three classic queries whose canonical
  * form needs a `partsupp` table the harness star schema doesn't ship
  * (TESTDATA.md). Instead of skipping them, each derives the supplier-part
  * fact from `lineitem` first: `ps_supplycost` = min observed unit price,
  * `ps_availqty` = total shipped quantity. That derivation is itself the
  * interesting scale decision — the derived frame is one map-side-combined
  * aggregation over the fact table (|part|×|supp-per-part| rows, ~100×
  * smaller than lineitem), and every downstream join touches only the
  * aggregate, never the raw fact again.
  *
  * Reference scope: the reference (pandas ETL + dashboard) has no
  * relational star-schema queries at all; these extend SURVEY.md §2.9's
  * beyond-reference inventory on the warehouse side.
  */
object SupplyQueries extends QueryPack {

  /** Shared derived supplier-part fact. min() and an integral-valued
    * sum() are both order-independent, so the double columns are
    * bit-stable across engines and safe to equality-join/compare.
    */
  private def partsupp(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"),
        sum(col("l_quantity")).as("ps_availqty"))

  private val psSql =
    """ps AS (SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |  min(l_extendedprice / l_quantity) AS ps_supplycost,
      |  sum(l_quantity) AS ps_availqty
      | FROM lineitem GROUP BY 1, 2)""".stripMargin

  /** TPC-H Q2 shape: minimum-cost supplier per part within a region.
    * The spec's correlated `WHERE ps_supplycost = (SELECT min(...))`
    * decorrelates to a min() window PARTITIONED BY partkey over the
    * derived ps frame — not a self-join against a per-part aggregate,
    * which would make Catalyst derive ps twice (it does not share common
    * subplans, so the naive decorrelation scans lineitem twice; the
    * window form scans it ONCE). Partitioned window, so no global-sort
    * single-partition hazard. The broadcast part filter runs BEFORE the
    * window so the shuffled frame is already pruned to target parts.
    * Dimension chain supplier→nation→region broadcasts.
    */
  private val q2 = Q(
    "q2_min_cost_supplier",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val euro = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d)
              .filter(col("r_name") === "EUROPE")),
              col("n_regionkey") === col("r_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_acctbal"), col("s_name"), col("n_name"))
      val target = Tables.part(s, d)
        .filter(col("p_size") <= 5 && col("p_type") === "PROMO")
        .select(col("p_partkey"))
      partsupp(s, d)
        .join(euro, col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(target), col("ps_partkey") === col("p_partkey"))
        .withColumn("min_cost",
          min(col("ps_supplycost")).over(Window.partitionBy(col("ps_partkey"))))
        .filter(col("ps_supplycost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), round(col("ps_supplycost"), 4).as("supply_cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },
    Some(s"""WITH $psSql,
            |es AS (SELECT s_suppkey, s_acctbal, s_name, n_name
            |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
            |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
            |pse AS (SELECT * FROM ps JOIN es ON ps_suppkey = s_suppkey),
            |mc AS (SELECT ps_partkey, min(ps_supplycost) AS min_cost
            |  FROM pse GROUP BY 1)
            |SELECT s_acctbal, s_name, n_name, p_partkey,
            | round(ps_supplycost, 4) AS supply_cost
            |FROM pse
            |JOIN mc ON pse.ps_partkey = mc.ps_partkey
            |  AND ps_supplycost = min_cost
            |JOIN part ON p_partkey = pse.ps_partkey
            |WHERE p_size <= 5 AND p_type = 'PROMO'
            |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
            |LIMIT 100""".stripMargin))

  /** TPC-H Q11 shape: parts whose inventory value at one nation's
    * suppliers exceeds a fixed fraction of the nation-wide total. The
    * spec's scalar subquery in HAVING becomes a 1-row aggregate
    * broadcast-joined against the per-part values. The per-part frame
    * feeds BOTH the total and the filter, so it is localCheckpoint'd
    * (it is aggregate-sized, ≤|part| rows) — without the checkpoint
    * Catalyst re-derives it from lineitem for each consumer and the
    * fact table is scanned twice. Fraction 1/1000 ≈ 2× the mean share
    * at |part| = 2000.
    */
  private val q11 = Q(
    "q11_part_value_concentration",
    (s, d) => {
      val natSupp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .filter(col("n_name") === "NATION_7")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val value = partsupp(s, d)
        .join(broadcast(natSupp), col("ps_suppkey") === col("s_suppkey"))
        .groupBy(col("ps_partkey"))
        .agg(sum(col("ps_supplycost") * col("ps_availqty")).as("v"))
        .stageCheckpoint()
      val total = value.agg(sum(col("v")).as("vt"))
      value.join(broadcast(total))
        .filter(col("v") > col("vt") / 1000)
        .select(col("ps_partkey").as("p_partkey"),
          round(col("v"), 2).as("part_value"))
        .orderBy(col("part_value").desc, col("p_partkey"))
    },
    Some(s"""WITH $psSql,
            |ns AS (SELECT s_suppkey FROM supplier
            |  JOIN nation ON s_nationkey = n_nationkey
            |  WHERE n_name = 'NATION_7'),
            |v AS (SELECT ps_partkey, sum(ps_supplycost * ps_availqty) AS v
            |  FROM ps JOIN ns ON ps_suppkey = s_suppkey GROUP BY 1)
            |SELECT ps_partkey AS p_partkey, round(v, 2) AS part_value
            |FROM v, (SELECT sum(v) AS vt FROM v) t
            |WHERE v > vt / 1000
            |ORDER BY part_value DESC, p_partkey""".stripMargin))

  /** TPC-H Q20 shape: suppliers holding "excess" availability (more than
    * half of one year's shipped quantity) of any promo part. The spec's
    * nested EXISTS/IN chain wants the availability aggregate AND the
    * 1995 shipped-quantity aggregate — both keyed (partkey, suppkey), so
    * they FUSE into one groupBy with a conditional sum: ONE lineitem
    * scan, one shuffle, instead of the naive two-subquery form's two.
    * Then threshold-filter and LEFT SEMI onto supplier (ids only through
    * the semi join). The part-name filter broadcasts.
    */
  private val q20 = Q(
    "q20_excess_availability_suppliers",
    (s, d) => {
      val promo = Tables.part(s, d)
        .filter(col("p_name").startsWith("red"))
        .select(col("p_partkey"))
      val in1995 = col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1996-01-01")
      val excess = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"))
        .agg(sum(col("l_quantity")).as("ps_availqty"),
          sum(when(in1995, col("l_quantity")).otherwise(0.0)).as("year_qty"))
        .join(broadcast(promo), col("ps_partkey") === col("p_partkey"))
        .filter(col("year_qty") > 0 &&
          col("ps_availqty") > col("year_qty") * 0.5)
        .select(col("ps_suppkey"))
      Tables.supplier(s, d)
        .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    },
    Some(s"""WITH $psSql,
            |sh AS (SELECT l_partkey AS sh_partkey, l_suppkey AS sh_suppkey,
            |  sum(l_quantity) AS year_qty
            | FROM lineitem
            | WHERE l_shipdate >= TIMESTAMP '1995-01-01'
            |   AND l_shipdate < TIMESTAMP '1996-01-01'
            | GROUP BY 1, 2)
            |SELECT s_name, s_acctbal FROM supplier
            |WHERE s_suppkey IN (
            |  SELECT ps_suppkey FROM ps
            |  JOIN part ON ps_partkey = p_partkey AND p_name LIKE 'red%'
            |  JOIN sh ON ps_partkey = sh_partkey AND ps_suppkey = sh_suppkey
            |  WHERE ps_availqty > year_qty * 0.5)
            |ORDER BY s_name""".stripMargin))

  /** Market-basket association mining: top-10 part PAIRS co-purchased
    * in one order, with LIFT (support·N / (c_a·c_b)) in integer basis
    * points — the frequent-itemset primitive behind recommendation
    * candidate generation. Pair expansion happens WITHIN an order's
    * sorted item array (baskets are small by schema — ≤7 lineitems — so
    * the fan-out is ≤21 pairs per order, the [[StatsQueries]] triangle
    * edge-build shape), never by self-joining the item table; the
    * per-part counts broadcast onto the 10 survivors.
    */
  private val basketPairs = Q(
    "basket_top_part_pairs",
    (s, d) => {
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val cnt = items.groupBy(col("p")).agg(count(lit(1)).as("c"))
      val tot = items.agg(countDistinct(col("o")).as("n_orders"))
      val pairs = items.groupBy(col("o"))
        .agg(sort_array(collect_set(col("p"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"""
            .stripMargin)).as("pr"))
        .groupBy(col("pr.a").as("pa"), col("pr.b").as("pb"))
        .agg(count(lit(1)).as("support"))
        .orderBy(col("support").desc, col("pa"), col("pb"))
        .limit(10)
      pairs
        .join(broadcast(cnt.select(col("p").as("pa"), col("c").as("ca"))), "pa")
        .join(broadcast(cnt.select(col("p").as("pb"), col("c").as("cb"))), "pb")
        .crossJoin(broadcast(tot))
        .select(col("pa"), col("pb"), col("support"),
          expr("support * n_orders * 10000 div (ca * cb)").as("lift_bp"))
        .orderBy(col("support").desc, col("pa"), col("pb"))
    },
    Some("""WITH i AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
           |  FROM lineitem),
           |c AS (SELECT p, count(*) AS c FROM i GROUP BY 1),
           |t AS (SELECT count(DISTINCT o) AS n_orders FROM i),
           |pr AS (SELECT a.p AS pa, b.p AS pb, count(*) AS support
           |  FROM i a JOIN i b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
           |top AS (SELECT * FROM pr
           |  ORDER BY support DESC, pa, pb LIMIT 10)
           |SELECT pa, pb, CAST(support AS BIGINT) AS support,
           | (CAST(support AS BIGINT) * n_orders * 10000) // (ca.c * cb.c)
           |   AS lift_bp
           |FROM top
           | JOIN c ca ON ca.p = top.pa
           | JOIN c cb ON cb.p = top.pb
           | CROSS JOIN t
           |ORDER BY support DESC, pa, pb""".stripMargin))

  /** Fulfillment lead-time quantiles per supplier nation — the
    * logistics SLA table (order date → line-item ship date, in whole
    * days): exact p50/p90/p99 order statistics (k = ⌈q·n⌉ over integer
    * days, the house quantile convention) partitioned by the supplier's
    * nation, plus the worst case. One fact-fact join on the order key
    * with two broadcast dims; the rank window partitions on the
    * 25-nation key, so no partition exceeds 1/25 of the lineitems.
    */
  private val leadTime = Q(
    "supply_lead_time_quantiles",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"))
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
      val nat = Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"))
      val base = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .as("lead_d"))
      val w = Window.partitionBy(col("nation")).orderBy(col("lead_d"))
      base
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("nation"))))
        .groupBy(col("nation"))
        .agg(count(lit(1)).as("n_lines"),
          max(when(col("rn") <= ceil(lit(0.5) * col("n")), col("lead_d")))
            .as("p50_d"),
          max(when(col("rn") <= ceil(lit(0.9) * col("n")), col("lead_d")))
            .as("p90_d"),
          max(when(col("rn") <= ceil(lit(0.99) * col("n")), col("lead_d")))
            .as("p99_d"),
          max(col("lead_d")).as("max_d"))
        .orderBy(col("nation"))
    },
    Some("""WITH b AS (SELECT n_name AS nation,
           |   CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
           |     AS lead_d
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  JOIN nation ON s_nationkey = n_nationkey),
           |r AS (SELECT nation, lead_d,
           |   row_number() OVER (PARTITION BY nation ORDER BY lead_d)
           |     AS rn,
           |   count(*) OVER (PARTITION BY nation) AS n
           |  FROM b)
           |SELECT nation, count(*) AS n_lines,
           | max(CASE WHEN rn <= ceil(0.5 * n) THEN lead_d END) AS p50_d,
           | max(CASE WHEN rn <= ceil(0.9 * n) THEN lead_d END) AS p90_d,
           | max(CASE WHEN rn <= ceil(0.99 * n) THEN lead_d END) AS p99_d,
           | max(lead_d) AS max_d
           |FROM r GROUP BY 1 ORDER BY 1""".stripMargin))

  /** PMI-ranked co-purchase pairs — the association measure that
    * surfaces pairs which are INTERESTING rather than merely frequent
    * (lift-by-support, `basket_top_part_pairs`, rewards popular items;
    * PMI = ln(P(a,b)/(P(a)P(b))) normalizes both margins away — the
    * word-embedding / recsys co-occurrence statistic). Same scale shape
    * as the lift query: pair expansion INSIDE each order's ≤7-item
    * sorted basket array (never an item-table self-join), per-part
    * counts broadcast onto survivors. The min-support gate (≥3 baskets)
    * is what makes PMI usable — unfiltered PMI degenerates to 1-count
    * pairs; at 100 TB the gate also bounds the ranked frame before the
    * TakeOrdered. PMI publishes in integer micro-nats: the ln argument
    * assembles from exact integers with division FIRST (the KL
    * overflow rule — support·N can exceed BIGINT at corpus scale,
    * support/ca · N/cb cannot), one identically-written double
    * expression per surviving ROW, rounded once, never summed.
    */
  private val basketPmi = Q(
    "basket_pmi_pairs",
    (s, d) => {
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val cnt = items.groupBy(col("p")).agg(count(lit(1)).as("c"))
      val tot = items.agg(countDistinct(col("o")).as("n_orders"))
      val pairs = items.groupBy(col("o"))
        .agg(sort_array(collect_set(col("p"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"""
            .stripMargin)).as("pr"))
        .groupBy(col("pr.a").as("pa"), col("pr.b").as("pb"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 3)
      pairs
        .join(broadcast(cnt.select(col("p").as("pa"), col("c").as("ca"))), "pa")
        .join(broadcast(cnt.select(col("p").as("pb"), col("c").as("cb"))), "pb")
        .crossJoin(broadcast(tot))
        .withColumn("pmi_micro", expr(
          """CAST(round(ln((CAST(support AS DOUBLE) / ca)
            |  * (CAST(n_orders AS DOUBLE) / cb)) * 1e6) AS BIGINT)"""
            .stripMargin))
        .select(col("pa"), col("pb"), col("support"), col("ca"), col("cb"),
          col("pmi_micro"))
        .orderBy(col("pmi_micro").desc, col("pa"), col("pb"))
        .limit(15)
    },
    Some("""WITH i AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
           |  FROM lineitem),
           |c AS (SELECT p, count(*) AS c FROM i GROUP BY 1),
           |t AS (SELECT count(DISTINCT o) AS n_orders FROM i),
           |pr AS (SELECT a.p AS pa, b.p AS pb, count(*) AS support
           |  FROM i a JOIN i b ON a.o = b.o AND a.p < b.p
           |  GROUP BY 1, 2 HAVING count(*) >= 3),
           |sc AS (SELECT pa, pb, CAST(support AS BIGINT) AS support,
           |  CAST(ca.c AS BIGINT) AS ca, CAST(cb.c AS BIGINT) AS cb,
           |  CAST(round(ln((CAST(support AS DOUBLE) / ca.c)
           |    * (CAST(n_orders AS DOUBLE) / cb.c)) * 1e6) AS BIGINT)
           |    AS pmi_micro
           | FROM pr JOIN c ca ON ca.p = pr.pa
           |  JOIN c cb ON cb.p = pr.pb CROSS JOIN t)
           |SELECT * FROM sc
           |ORDER BY pmi_micro DESC, pa, pb LIMIT 15""".stripMargin))

  val qs: Seq[Q] = Seq(q2, q11, q20, basketPairs, basketPmi, leadTime)
}
