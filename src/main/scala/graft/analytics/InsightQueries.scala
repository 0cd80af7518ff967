package graft.analytics

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 analytics wave: marketing-science and robust-statistics
  * operators over the events/orders tables, plus a storage zone-map
  * audit. Every query follows the engine's exact-arithmetic conventions
  * (integer micro-credits, BIGINT sufficient statistics, order-statistic
  * quantiles, single-IEEE-op derived doubles) so the DuckDB compare is
  * bit-exact, and every unbounded input is reduced to a bounded frame
  * before any global window touches it.
  */
object InsightQueries extends QueryPack {

  /** Position-based (U-shaped, 40/20/40) multi-touch attribution — the
    * industry-standard complement to `attr_linear_touch_credit`: the
    * first and last touch before a conversion each earn 40% of the
    * credit, the middle touches split the remaining 20%. Credit is
    * INTEGER micro-credits summing to exactly 1e6 per conversion: with
    * n ≥ 3 touches the middles get 200000 div (n−2) each and the
    * division remainder rides with the last touch; n = 2 splits 50/50,
    * n = 1 takes everything. The touch join and both windows are keyed
    * on user_id (per-user event counts bound the fan-out); output is
    * |channels|-bounded.
    */
  private val positionCredit = Q(
    "attr_position_credit",
    (s, d) => {
      val ev = Tables.events(s, d)
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("conv_id"),
          col("ts").as("conv_ts"))
      val touch = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_id").as("touch_id"),
          col("ts").as("touch_ts"), col("event_type").as("channel"))
      val joined = conv.join(touch, Seq("user_id"))
        .filter(col("touch_ts") < col("conv_ts") &&
          col("touch_ts") >= col("conv_ts") - expr("INTERVAL 24 hours"))
      val w = Window.partitionBy(col("user_id"), col("conv_id"))
      val wOrd = w.orderBy(col("touch_ts"), col("touch_id"))
      joined
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("credit",
          when(col("n") === 1, lit(1000000L))
            .when(col("n") === 2, lit(500000L))
            .when(col("rn") === 1, lit(400000L))
            .when(col("rn") === col("n"),
              lit(400000L) + expr("200000 % (n - 2)"))
            .otherwise(expr("200000 div (n - 2)")))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_touches"),
          countDistinct(col("conv_id")).as("n_conversions"),
          sum(col("credit")).as("credit_micro"))
        .orderBy(col("channel"))
    },
    Some("""WITH conv AS (SELECT user_id, event_id AS conv_id, ts AS conv_ts
           |  FROM events WHERE event_type = 'purchase'),
           |touch AS (SELECT user_id, event_id AS touch_id, ts AS touch_ts,
           |   event_type AS channel
           |  FROM events WHERE event_type <> 'purchase'),
           |j AS (SELECT c.user_id, conv_id, touch_id, touch_ts, channel
           |  FROM conv c JOIN touch t ON c.user_id = t.user_id
           |   AND t.touch_ts < c.conv_ts
           |   AND t.touch_ts >= c.conv_ts - INTERVAL 24 HOUR),
           |r AS (SELECT channel, conv_id,
           |   count(*) OVER (PARTITION BY user_id, conv_id) AS n,
           |   row_number() OVER (PARTITION BY user_id, conv_id
           |     ORDER BY touch_ts, touch_id) AS rn
           |  FROM j)
           |SELECT channel, count(*) AS n_touches,
           | count(DISTINCT conv_id) AS n_conversions,
           | CAST(sum(CASE WHEN n = 1 THEN 1000000
           |   WHEN n = 2 THEN 500000
           |   WHEN rn = 1 THEN 400000
           |   WHEN rn = n THEN 400000 + 200000 % (n - 2)
           |   ELSE 200000 // (n - 2) END) AS BIGINT) AS credit_micro
           |FROM r GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** Click-to-purchase conversion latency, exact order-statistic
    * quantiles: each purchase is matched to the user's LAST click in the
    * trailing 24 h (the as-of semantics, reduced per conversion), the
    * latency in whole seconds is histogrammed — the global sort
    * collapses to a ≤86 401-row bounded frame regardless of SF — and
    * p50/p90/p99 are the k-th smallest actual values (k = ⌈q·n⌉, the
    * `agg_group_quantiles_value` convention, no interpolation).
    */
  private val conversionLatency = Q(
    "ts_conversion_latency",
    (s, d) => {
      val ev = Tables.events(s, d)
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("conv_id"),
          col("ts").as("conv_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      val lat = conv.join(clicks, Seq("user_id"))
        .filter(col("click_ts") < col("conv_ts") &&
          col("click_ts") >= col("conv_ts") - expr("INTERVAL 24 hours"))
        .groupBy(col("user_id"), col("conv_id"), col("conv_ts"))
        .agg(max(col("click_ts")).as("last_click"))
        .select((unix_timestamp(col("conv_ts")) -
          unix_timestamp(col("last_click"))).as("lat_s"))
      val hist = lat.groupBy(col("lat_s")).agg(count(lit(1)).as("c"))
      val wc = Window.orderBy(col("lat_s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("cum", sum(col("c")).over(wc))
        .withColumn("n", sum(col("c")).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .agg(max(col("n")).as("n_conversions"),
          min(when(col("cum") >= ceil(lit(0.5) * col("n")),
            col("lat_s"))).as("p50_s"),
          min(when(col("cum") >= ceil(lit(0.9) * col("n")),
            col("lat_s"))).as("p90_s"),
          min(when(col("cum") >= ceil(lit(0.99) * col("n")),
            col("lat_s"))).as("p99_s"))
    },
    Some("""WITH conv AS (SELECT user_id, event_id AS conv_id, ts AS conv_ts
           |  FROM events WHERE event_type = 'purchase'),
           |ck AS (SELECT user_id, ts AS click_ts
           |  FROM events WHERE event_type = 'click'),
           |m AS (SELECT c.user_id, conv_id, conv_ts,
           |   max(click_ts) AS last_click
           |  FROM conv c JOIN ck ON c.user_id = ck.user_id
           |   AND ck.click_ts < c.conv_ts
           |   AND ck.click_ts >= c.conv_ts - INTERVAL 24 HOUR
           |  GROUP BY 1, 2, 3),
           |lat AS (SELECT epoch(date_trunc('second', conv_ts))::BIGINT
           |   - epoch(date_trunc('second', last_click))::BIGINT AS lat_s
           |  FROM m),
           |h AS (SELECT lat_s, count(*) AS c FROM lat GROUP BY 1),
           |r AS (SELECT lat_s,
           |   CAST(sum(c) OVER (ORDER BY lat_s
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |     AS BIGINT) AS cum,
           |   CAST(sum(c) OVER () AS BIGINT) AS n
           |  FROM h)
           |SELECT max(n) AS n_conversions,
           | min(CASE WHEN cum >= ceil(0.5 * n) THEN lat_s END) AS p50_s,
           | min(CASE WHEN cum >= ceil(0.9 * n) THEN lat_s END) AS p90_s,
           | min(CASE WHEN cum >= ceil(0.99 * n) THEN lat_s END) AS p99_s
           |FROM r""".stripMargin))

  /** Kaplan–Meier-style user life table with right censoring: a user's
    * lifetime is last-active-day minus first-active-day; users still
    * active on the corpus's final day are CENSORED (their true lifetime
    * is only known to be ≥ the observed one — dropping them would bias
    * retention short, the classic survival-analysis mistake). Per
    * lifetime day t: the at-risk count (lifetime ≥ t, a suffix sum over
    * the ≤|days| bounded frame), deaths (uncensored exits at t),
    * censored exits, and the discrete hazard in integer basis points
    * (10⁴·d ÷ r, exact integer division — no cross-engine product
    * chains). One user-keyed aggregation plus bounded-frame windows.
    */
  private val lifeTable = Q(
    "ts_user_lifetable",
    (s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val ul = days.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val mx = days.agg(max(col("day")).as("dmax"))
      val lt = ul.crossJoin(broadcast(mx))
        .select(datediff(col("d1"), col("d0")).as("life_d"),
          when(col("d1") === col("dmax"), 1L).otherwise(0L).as("cens"))
      val hist = lt.groupBy(col("life_d"))
        .agg(count(lit(1)).as("exits"),
          sum(lit(1L) - col("cens")).as("deaths"),
          sum(col("cens")).as("censored"))
      val wr = Window.orderBy(col("life_d").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("at_risk", sum(col("exits")).over(wr))
        .select(col("life_d"), col("at_risk"), col("deaths"),
          col("censored"),
          expr("(10000 * deaths) div at_risk").as("hazard_bp"))
        .orderBy(col("life_d"))
    },
    Some("""WITH days AS (SELECT user_id, CAST(ts AS DATE) AS day
           |  FROM events),
           |ul AS (SELECT user_id, min(day) AS d0, max(day) AS d1
           |  FROM days GROUP BY 1),
           |mx AS (SELECT max(day) AS dmax FROM days),
           |lt AS (SELECT d1 - d0 AS life_d,
           |   CASE WHEN d1 = dmax THEN 1 ELSE 0 END AS cens
           |  FROM ul CROSS JOIN mx),
           |h AS (SELECT life_d, count(*) AS exits,
           |   CAST(sum(1 - cens) AS BIGINT) AS deaths,
           |   CAST(sum(cens) AS BIGINT) AS censored
           |  FROM lt GROUP BY 1)
           |SELECT life_d,
           | CAST(sum(exits) OVER (ORDER BY life_d DESC
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |   AS BIGINT) AS at_risk,
           | deaths, censored,
           | (10000 * deaths) // CAST(sum(exits) OVER (ORDER BY life_d DESC
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |   AS BIGINT) AS hazard_bp
           |FROM h ORDER BY life_d""".stripMargin))

  /** Theil–Sen robust trend estimator over the monthly revenue series —
    * the median of all pairwise slopes, immune to the outlier months
    * that wreck least squares (breakdown point 29%). The series reduces
    * to one row per month first (a bounded, SF-independent frame), the
    * O(m²) pair expansion happens on that ~80-row frame only, and the
    * median is the k = ⌈n/2⌉-th smallest slope under the engine's
    * double-ordering convention: each slope is ONE IEEE division of two
    * exactly-represented integers (identical bits in both engines),
    * ordered with the (ti, tj) tiebreak.
    */
  private val theilSen = Q(
    "stats_theil_sen_trend",
    (s, d) => {
      val monthly = Tables.orders(s, d)
        .select((year(col("o_orderdate")) * 100 +
          month(col("o_orderdate"))).as("ym"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy(col("ym")).agg(sum(col("cents")).as("rev"))
      val idx = monthly.withColumn("t",
        row_number().over(Window.orderBy(col("ym"))))
      val a = idx.select(col("t").as("ti"), col("rev").as("ri"))
      val b = idx.select(col("t").as("tj"), col("rev").as("rj"))
      val pairs = a.crossJoin(b).filter(col("ti") < col("tj"))
        .select(((col("rj") - col("ri")).cast("double") /
          (col("tj") - col("ti")).cast("double")).as("slope"),
          col("ti"), col("tj"))
      val wOrd = Window.orderBy(col("slope"), col("ti"), col("tj"))
      pairs
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("n", count(lit(1)).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .agg(max(col("tj")).as("n_months"),
          max(col("n")).as("n_pairs"),
          max(when(col("rn") <= ceil(lit(0.5) * col("n")),
            col("slope"))).as("median_slope_cents"))
    },
    Some("""WITH m AS (SELECT year(o_orderdate) * 100 + month(o_orderdate)
           |   AS ym, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
           |   AS BIGINT) AS rev
           |  FROM orders GROUP BY 1),
           |idx AS (SELECT ym, rev,
           |   CAST(row_number() OVER (ORDER BY ym) AS BIGINT) AS t
           |  FROM m),
           |p AS (SELECT CAST(b.rev - a.rev AS DOUBLE)
           |     / CAST(b.t - a.t AS DOUBLE) AS slope, a.t AS ti, b.t AS tj
           |  FROM idx a JOIN idx b ON a.t < b.t),
           |r AS (SELECT slope, ti, tj,
           |   row_number() OVER (ORDER BY slope, ti, tj) AS rn,
           |   count(*) OVER () AS n
           |  FROM p)
           |SELECT max(tj) AS n_months, CAST(max(n) AS BIGINT) AS n_pairs,
           | max(CASE WHEN rn <= ceil(0.5 * n) THEN slope END)
           |   AS median_slope_cents
           |FROM r""".stripMargin))

  /** Pairwise Pearson correlation between the daily activity series of
    * every event-type pair — the metric-drilldown "do errors move with
    * traffic?" matrix. The corpus reduces to a DENSE day×type count grid
    * first (absent days count 0 — skipping them is the classic
    * correlation-inflation bug), pairs expand on the bounded grid, and
    * the correlation derives from exact BIGINT sufficient statistics
    * (n, Σx, Σy, Σxy, Σx², Σy²) published alongside: the only floating
    * point is the final covariance/√(var·var) expression, written with
    * the identical operation shape in both engines (IEEE ops on exact
    * integers are deterministic). Zero-variance series yield NULL.
    */
  private val eventCorrelation = Q(
    "stats_event_correlation",
    (s, d) => {
      val daily = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"),
          col("event_type").as("et"))
        .groupBy(col("day"), col("et")).agg(count(lit(1)).as("c"))
      val grid = daily.select(col("day")).distinct()
        .crossJoin(daily.select(col("et")).distinct())
        .join(daily, Seq("day", "et"), "left")
        .select(col("day"), col("et"), coalesce(col("c"), lit(0L)).as("c"))
      val a = grid.select(col("day"), col("et").as("ta"), col("c").as("x"))
      val b = grid.select(col("day"), col("et").as("tb"), col("c").as("y"))
      val st = a.join(b, Seq("day")).filter(col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
      st.select(col("ta"), col("tb"), col("n"), col("sx"), col("sy"),
          col("sxy"), col("sxx"), col("syy"),
          when(col("n") * col("sxx") - col("sx") * col("sx") > 0 &&
            col("n") * col("syy") - col("sy") * col("sy") > 0,
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double")) *
                sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                  .cast("double")))).as("corr"))
        .orderBy(col("ta"), col("tb"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
           |   event_type AS et, count(*) AS c
           |  FROM events GROUP BY 1, 2),
           |grid AS (SELECT d.day, t.et, COALESCE(daily.c, 0) AS c
           |  FROM (SELECT DISTINCT day FROM daily) d
           |  CROSS JOIN (SELECT DISTINCT et FROM daily) t
           |  LEFT JOIN daily ON daily.day = d.day AND daily.et = t.et),
           |st AS (SELECT a.et AS ta, b.et AS tb, count(*) AS n,
           |   CAST(sum(a.c) AS BIGINT) AS sx,
           |   CAST(sum(b.c) AS BIGINT) AS sy,
           |   CAST(sum(a.c * b.c) AS BIGINT) AS sxy,
           |   CAST(sum(a.c * a.c) AS BIGINT) AS sxx,
           |   CAST(sum(b.c * b.c) AS BIGINT) AS syy
           |  FROM grid a JOIN grid b ON a.day = b.day AND a.et < b.et
           |  GROUP BY 1, 2)
           |SELECT ta, tb, n, sx, sy, sxy, sxx, syy,
           | CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
           |  THEN CAST(n * sxy - sx * sy AS DOUBLE)
           |   / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
           |      * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           | END AS corr
           |FROM st ORDER BY 1, 2""".stripMargin))

  /** Zone-map (min/max statistics) skipping audit — the data-layout
    * diagnostic behind every "should we cluster this table?" decision:
    * per month-partition min/max of the order total, plus whether each
    * partition is prunable for (a) a date predicate aligned with the
    * partition key — almost all partitions skip — and (b) a value
    * predicate on the UNCLUSTERED total — virtually none skip, because
    * every month spans the full price range. The contrast quantifies
    * exactly what `storage_zorder_layout` buys. One scan, one
    * |months|-bounded aggregate.
    */
  private val zoneMapAudit = Q(
    "storage_zonemap_skipping",
    (s, d) => {
      Tables.orders(s, d)
        .select((year(col("o_orderdate")) * 100 +
          month(col("o_orderdate"))).as("ym"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy(col("ym"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("cents")).as("min_cents"),
          max(col("cents")).as("max_cents"))
        .select(col("ym"), col("n_rows"), col("min_cents"),
          col("max_cents"),
          when(col("ym") < 199601 || col("ym") > 199612, 1L)
            .otherwise(0L).as("skip_date_1996"),
          when(col("max_cents") <= 45000000L, 1L).otherwise(0L)
            .as("skip_price_gt_450k"))
        .orderBy(col("ym"))
    },
    Some("""SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
           | count(*) AS n_rows,
           | min(CAST(round(o_totalprice * 100) AS BIGINT)) AS min_cents,
           | max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_cents,
           | CASE WHEN year(o_orderdate) * 100 + month(o_orderdate) < 199601
           |   OR year(o_orderdate) * 100 + month(o_orderdate) > 199612
           |  THEN 1 ELSE 0 END AS skip_date_1996,
           | CASE WHEN max(CAST(round(o_totalprice * 100) AS BIGINT))
           |   <= 45000000 THEN 1 ELSE 0 END AS skip_price_gt_450k
           |FROM orders GROUP BY 1, 5 ORDER BY 1""".stripMargin))

  /** Train/test split leakage audit — the supervised-learning cousin of
    * benchmark decontamination: split events 80/20 by the md5-uniform of
    * the EVENT id (the naive row-level split) and count users whose
    * events land on both sides — every one of them leaks user-level
    * signal across the split. The GROUP-level split (md5 of user_id)
    * is audited alongside and must show zero leakage by construction.
    * Both splits use the engine's portable md5-mod convention, so the
    * audit itself is deterministic and cross-engine exact; one scan,
    * two user-keyed aggregations.
    */
  private val splitLeakage = Q(
    "dq_split_leakage",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"))
      def side(c: org.apache.spark.sql.Column) =
        when(conv(substring(md5(c.cast("string")), 1, 15), 16, 10)
          .cast("long") % 10 < 8, lit("train")).otherwise(lit("test"))
      val byEvent = ev.select(col("user_id"), side(col("event_id")).as("sd"))
        .groupBy(col("user_id"))
        .agg(countDistinct(col("sd")).as("n_sides"))
        .agg(lit("by_event").as("split_key"),
          count(lit(1)).as("n_users"),
          sum(when(col("n_sides") > 1, 1L).otherwise(0L)).as("n_leaky_users"))
      val byUser = ev.select(col("user_id"), side(col("user_id")).as("sd"))
        .groupBy(col("user_id"))
        .agg(countDistinct(col("sd")).as("n_sides"))
        .agg(lit("by_user").as("split_key"),
          count(lit(1)).as("n_users"),
          sum(when(col("n_sides") > 1, 1L).otherwise(0L)).as("n_leaky_users"))
      byEvent.unionByName(byUser).orderBy(col("split_key"))
    },
    Some("""WITH be AS (SELECT user_id,
           |  CASE WHEN ('0x' || substring(md5(CAST(event_id AS VARCHAR)),
           |    1, 15))::BIGINT % 10 < 8 THEN 'train' ELSE 'test' END AS sd
           | FROM events),
           |ge AS (SELECT user_id, count(DISTINCT sd) AS n_sides
           | FROM be GROUP BY 1),
           |bu AS (SELECT user_id,
           |  CASE WHEN ('0x' || substring(md5(CAST(user_id AS VARCHAR)),
           |    1, 15))::BIGINT % 10 < 8 THEN 'train' ELSE 'test' END AS sd
           | FROM events),
           |gu AS (SELECT user_id, count(DISTINCT sd) AS n_sides
           | FROM bu GROUP BY 1)
           |SELECT 'by_event' AS split_key, count(*) AS n_users,
           | CAST(sum(CASE WHEN n_sides > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |   AS n_leaky_users
           |FROM ge
           |UNION ALL
           |SELECT 'by_user', count(*),
           | CAST(sum(CASE WHEN n_sides > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |FROM gu
           |ORDER BY split_key""".stripMargin))

  val qs: Seq[Q] = Seq(positionCredit, conversionLatency, lifeTable,
    theilSen, eventCorrelation, zoneMapAudit, splitLeakage)
}
