package graft.analytics

import graft.{Q, QueryPack, Tables}
import graft.ops.AsOfJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the `events` table: as-of join, tumbling
  * windows (batch shape of the Structured Streaming path in
  * [[graft.streaming.EventStream]]), and JSON property extraction.
  */
object Temporal extends QueryPack {

  /** As-of join: each purchase matched to the user's latest prior click,
    * then reduced per user so the verified result is bounded by |users|.
    * The per-user aggregates depend only on the matched click's timestamp
    * (never its payload), so simultaneous-click tie-breaking cannot make
    * the compare flaky; per-row payload semantics are covered by the
    * AsOfJoinSpec ScalaTest instead.
    */
  private val asof = Q(
    "asof_purchase_last_click",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("value").as("click_value"), col("event_id").as("c_eid"))
      AsOfJoin.backward(
        purchases, clicks.withColumn("click_ts", col("ts")),
        key = "user_id", ts = "ts",
        payload = Seq("click_ts", "click_value"), tiebreak = "c_eid")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purchases"),
          count(col("click_ts")).as("n_matched"),
          max(col("click_ts")).as("last_click_ts"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT p.user_id, count(*) AS n_purchases, count(c.ts) AS n_matched,
           | max(c.ts) AS last_click_ts
           |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
           |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
           |  ON p.user_id = c.user_id AND p.ts >= c.ts
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** Same as-of semantics through the skew-resistant two-pass bucketed
    * plan ([[AsOfJoin.backwardBucketed]]): a hot key parallelizes across
    * time buckets instead of serializing through one window partition.
    * Oracle is IDENTICAL to `asof_purchase_last_click` — a cross-engine
    * equivalence proof on real data, complementing the ScalaTest
    * equivalence spec.
    */
  private val asofBucketed = Q(
    "asof_purchase_last_click_bucketed",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("value").as("click_value"), col("event_id").as("c_eid"))
      AsOfJoin.backwardBucketed(
        purchases, clicks.withColumn("click_ts", col("ts")),
        key = "user_id", ts = "ts",
        payload = Seq("click_ts", "click_value"), tiebreak = "c_eid")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purchases"),
          count(col("click_ts")).as("n_matched"),
          max(col("click_ts")).as("last_click_ts"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT p.user_id, count(*) AS n_purchases, count(c.ts) AS n_matched,
           | max(c.ts) AS last_click_ts
           |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
           |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
           |  ON p.user_id = c.user_id AND p.ts >= c.ts
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** Tumbling 1-hour window aggregation — identical logic drives the
    * Structured Streaming job in [[graft.streaming.EventStream]].
    */
  private val tumbling = Q(
    "stream_tumbling_hourly",
    (s, d) => Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("decimal(20,2)")
          .cast("string").as("sum_value"))
      .orderBy(col("hour"), col("event_type")),
    Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
           | count(*) AS n,
           | CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,2))
           |   AS STRING) AS sum_value
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Semi-structured access: JSON props column (reference stores JSON
    * strings in the log channel, SURVEY.md §1.3 P15). Aggregated per
    * event_type — bounded result, no full-table stability sort.
    */
  private val jsonExtract = Q(
    "json_extract_props",
    (s, d) => Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type")),
    Some("""SELECT event_type,
           | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           | count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
           | count(*) AS n
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Sliding 30-minute windows every 15 minutes (each event lands in
    * exactly windowDuration/slide = 2 windows), reduced per event_type so
    * the verified output is bounded by |types| at any scale. The oracle
    * rebuilds the window assignment by unnesting each event into its two
    * epoch-aligned bucket starts.
    */
  private val sliding = Q(
    "stream_sliding_30m",
    (s, d) => Tables.events(s, d)
      .groupBy(window(col("ts"), "30 minutes", "15 minutes")
        .getField("start").as("w_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_windows"), sum(col("n")).as("sum_n"),
        max(col("n")).as("max_n"))
      .orderBy(col("event_type")),
    // time_bucket(15 min) is midnight-aligned, and midnight is a whole
    // number of 15-minute periods from the epoch — identical grid to
    // Spark's epoch-aligned window()
    Some("""WITH e AS (SELECT event_type,
           |  time_bucket(INTERVAL '15 minutes', ts) AS b0 FROM events),
           |x AS (SELECT event_type,
           |  unnest([b0, b0 - INTERVAL '15 minutes']) AS ws FROM e),
           |w AS (SELECT event_type, ws, count(*) AS n FROM x GROUP BY 1, 2)
           |SELECT event_type, count(*) AS n_windows,
           | CAST(sum(n) AS BIGINT) AS sum_n, max(n) AS max_n
           |FROM w GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Data-driven session windows (30-minute inactivity gap) via Spark's
    * native `session_window`, reduced per user. Semantics: a new session
    * starts iff ts ≥ previous ts + gap (windows merge while they
    * overlap) — the oracle derives the same break flags with lag() and
    * assigns session ids by running sum.
    */
  private val sessionWindows = Q(
    "stream_session_windows",
    (s, d) => Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), max(col("n")).as("max_events"),
        sum(col("n")).as("n_events"))
      .orderBy(col("user_id")),
    Some("""WITH g AS (SELECT user_id, ts, event_id,
           |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           |         IS NULL
           |        OR ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           |         + INTERVAL 30 MINUTE
           |       THEN 1 ELSE 0 END AS brk
           | FROM events),
           |s AS (SELECT user_id, sum(brk) OVER (PARTITION BY user_id
           |   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM g),
           |c AS (SELECT user_id, sid, count(*) AS n FROM s GROUP BY 1, 2)
           |SELECT user_id, count(*) AS n_sessions, max(n) AS max_events,
           | CAST(sum(n) AS BIGINT) AS n_events
           |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** Conversion funnel (view → click → purchase by first occurrence per
    * user): one conditional-min aggregation pass, then a single global
    * reduce — no per-step joins, no ordering shuffle. NULL-safe stage
    * comparisons (a missing stage fails the `when` into the 0 branch in
    * both engines).
    */
  private val funnel = Q(
    "funnel_view_click_purchase",
    (s, d) => {
      val stage = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      stage.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t_view").isNotNull, 1).otherwise(0)).as("n_view"),
        sum(when(col("t_view") <= col("t_click"), 1).otherwise(0)).as("n_view_click"),
        sum(when(col("t_view") <= col("t_click") &&
          col("t_click") <= col("t_purchase"), 1).otherwise(0)).as("n_full_funnel"))
    },
    Some("""WITH s AS (SELECT user_id,
           |  min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
           |  min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
           |  min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
           | FROM events GROUP BY 1)
           |SELECT count(*) AS n_users,
           | CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           | CAST(sum(CASE WHEN t_view <= t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
           | CAST(sum(CASE WHEN t_view <= t_click AND t_click <= t_purchase
           |   THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
           |FROM s""".stripMargin))

  /** Weekly cohort retention matrix: users bucketed by first-activity
    * week, counted distinct in each later week they return. One
    * first-seen aggregation + one equi-join on user_id + one grouped
    * distinct count — no window, no per-user state; the standard
    * retention triangle at any scale.
    */
  private val cohorts = Q(
    "cohort_weekly_retention",
    (s, d) => {
      val ev = Tables.events(s, d)
      val wk = (c: org.apache.spark.sql.Column) =>
        floor(datediff(to_date(c), lit("2024-01-01")) / 7).cast("long")
      val firstSeen = ev.groupBy(col("user_id"))
        .agg(min(col("ts")).as("first_ts"))
      ev.join(firstSeen, "user_id")
        .select(col("user_id"), wk(col("first_ts")).as("cohort_week"),
          (wk(col("ts")) - wk(col("first_ts"))).as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some("""WITH f AS (SELECT user_id, min(ts) AS first_ts
           |  FROM events GROUP BY 1),
           |x AS (SELECT e.user_id,
           |  CAST(floor(date_diff('day', DATE '2024-01-01',
           |    CAST(f.first_ts AS DATE)) / 7.0) AS BIGINT) AS cohort_week,
           |  CAST(floor(date_diff('day', DATE '2024-01-01',
           |    CAST(e.ts AS DATE)) / 7.0) AS BIGINT)
           |  - CAST(floor(date_diff('day', DATE '2024-01-01',
           |    CAST(f.first_ts AS DATE)) / 7.0) AS BIGINT) AS week_offset
           | FROM events e JOIN f USING (user_id))
           |SELECT cohort_week, week_offset, count(DISTINCT user_id) AS n_users
           |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    headline = true)

  /** Keyed keep-first dedup (first touch per (user, event_type)) — the
    * batch twin of [[graft.streaming.EventStream.dedupByKey]]: the
    * streaming job keeps the first ARRIVAL of a key within the
    * watermark; the batch twin keeps the event-time first (ties broken
    * on event_id), which coincides whenever arrival order follows event
    * time. One window shuffle on the dedup key, bounded output.
    */
  private val streamDedup = Q(
    "stream_dedup_first_touch",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_first"),
          min(col("ts")).as("earliest"),
          sum(col("user_id")).as("sum_users"))
        .orderBy(col("event_type"))
    },
    Some("""WITH r AS (SELECT *, row_number() OVER (
           |   PARTITION BY user_id, event_type
           |   ORDER BY ts, event_id) AS rn FROM events)
           |SELECT event_type, count(*) AS n_first, min(ts) AS earliest,
           | CAST(sum(user_id) AS BIGINT) AS sum_users
           |FROM r WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Stream-static dimension enrichment — the batch twin of
    * [[graft.streaming.EventStream.enrichNation]] (same logical join; the
    * streaming run binds it to an unbounded source where the broadcast
    * dim join is stateless per micro-batch). Aggregated per nation so the
    * output is dimension-bounded.
    */
  private val enrichStatic = Q(
    "stream_enrich_static",
    (s, d) => graft.streaming.EventStream
      .enrichNation(Tables.events(s, d), Tables.nation(s, d))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("decimal(20,2)")
          .cast("string").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n_name")),
    Some("""SELECT n_name, count(*) AS n,
           | CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(20,2))
           |   AS STRING) AS sum_value,
           | count(DISTINCT user_id) AS n_users
           |FROM events JOIN nation ON n_nationkey = user_id % 25
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** Gap-filled hourly resample: the dense time grid a forecasting or
    * anomaly job needs (missing hours as explicit zeros, not absent
    * rows). The grid generates from ONE aggregated (min, max) row via
    * sequence + explode — rows created ∝ hours × |types|, never ∝
    * events — then left-joins the sparse hourly counts back.
    */
  private val gapfill = Q(
    "ts_gapfill_hourly",
    (s, d) => {
      val ev = Tables.events(s, d)
      val hourly = ev
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val grid = ev
        .agg(date_trunc("hour", min(col("ts"))).as("h0"),
          date_trunc("hour", max(col("ts"))).as("h1"))
        .select(explode(sequence(col("h0"), col("h1"),
          expr("INTERVAL 1 HOUR"))).as("hour"))
        .crossJoin(ev.select(col("event_type")).distinct())
      grid.join(hourly, Seq("hour", "event_type"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          sum(when(col("n") === 0, 1L).otherwise(0L)).as("n_gap_hours"),
          sum(col("n")).as("n_events"),
          max(col("n")).as("peak_hour_events"))
        .orderBy(col("event_type"))
    },
    Some("""WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0,
           |  date_trunc('hour', max(ts)) AS h1 FROM events),
           |g AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
           |   AS hour FROM b),
           |t AS (SELECT DISTINCT event_type FROM events),
           |h AS (SELECT date_trunc('hour', ts) AS hour, event_type,
           |  count(*) AS n FROM events GROUP BY 1, 2)
           |SELECT t.event_type, count(*) AS n_hours,
           | CAST(sum(CASE WHEN h.n IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |   AS n_gap_hours,
           | CAST(sum(coalesce(h.n, 0)) AS BIGINT) AS n_events,
           | CAST(max(coalesce(h.n, 0)) AS BIGINT) AS peak_hour_events
           |FROM g CROSS JOIN t
           | LEFT JOIN h ON g.hour = h.hour AND t.event_type = h.event_type
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Z-score anomaly detection over the hourly series: flag (type, hour)
    * cells whose count deviates > 3σ from that type's mean. The z² > 9
    * test is algebraically rewritten to (nh·n − s)² > 9·(nh·s2 − s²) —
    * every operand derives from exact integral aggregates (count, sum,
    * sum of squares), so there is no mean/stddev rounding to diverge
    * between engines; the single squaring happens in double from
    * identical exact integers, hence bit-identically. The sufficient-
    * statistics join is the scale shape: per-type (nh, s, s2) is tiny
    * and broadcasts; the hourly frame streams through once.
    */
  private val anomalies = Q(
    "ts_anomalous_hours",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"))
      val stats = hourly.groupBy(col("event_type").as("et"))
        .agg(count(lit(1)).as("nh"), sum(col("n")).as("s"),
          sum(col("n") * col("n")).as("s2"))
      hourly.join(broadcast(stats), col("event_type") === col("et"))
        .withColumn("dev2",
          pow((col("nh") * col("n") - col("s")).cast("double"), 2))
        .withColumn("thresh",
          (lit(9) * (col("nh") * col("s2") - col("s") * col("s"))).cast("double"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"),
          sum(when(col("dev2") > col("thresh"), 1L).otherwise(0L))
            .as("n_anomalous"))
        .orderBy(col("event_type"))
    },
    Some("""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour,
           |  count(*) AS n FROM events GROUP BY 1, 2),
           |st AS (SELECT event_type AS et, count(*) AS nh,
           |  CAST(sum(n) AS BIGINT) AS s, CAST(sum(n * n) AS BIGINT) AS s2
           | FROM h GROUP BY 1)
           |SELECT event_type, count(*) AS n_hours,
           | CAST(sum(CASE WHEN pow(CAST(nh * n - s AS DOUBLE), 2)
           |     > CAST(9 * (nh * s2 - s * s) AS DOUBLE)
           |   THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous
           |FROM h JOIN st ON event_type = et
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** SCD2-style run compression (gaps-and-islands): collapse each user's
    * event stream into maximal runs of one event_type — the
    * slowly-changing-dimension build (valid_from = run start, valid_to =
    * next change) every warehouse does when snapshotting mutable
    * attributes. Two stacked windows on the SAME (user_id, ts, event_id)
    * ordering — lag to mark changes, running sum to number runs — so
    * Catalyst plans ONE shuffle + ONE sort for both (WindowExec chains);
    * run rows then reduce by plain hash aggregation. Per-user partitions
    * parallelize arbitrarily; no global sort anywhere. Output is bounded
    * by |users|×|event types|; per-run validity intervals are exercised
    * row-by-row in Scd2Spec.
    */
  private val scd2Runs = Q(
    "scd2_event_type_runs",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val runs = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(w).isNull ||
            lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("run_id", sum(col("chg")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("event_type"), col("run_id"))
        .agg(count(lit(1)).as("run_events"),
          (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
            .as("run_span_s"))
      runs.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_runs"),
          sum(col("run_events")).as("n_events"),
          max(col("run_events")).as("max_run_events"),
          sum(col("run_span_s")).as("sum_run_span_s"))
        .orderBy(col("user_id"), col("event_type"))
    },
    Some("""WITH m AS (SELECT user_id, ts, event_id, event_type,
           |  CASE WHEN lag(event_type) OVER
           |      (PARTITION BY user_id ORDER BY ts, event_id)
           |    IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
           | FROM events),
           |r AS (SELECT user_id, ts, event_type,
           |  CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |    AS run_id
           | FROM m),
           |runs AS (SELECT user_id, event_type, run_id,
           |  count(*) AS run_events,
           |  epoch(date_trunc('second', max(ts)))::BIGINT
           |    - epoch(date_trunc('second', min(ts)))::BIGINT AS run_span_s
           | FROM r GROUP BY 1, 2, 3)
           |SELECT user_id, event_type, count(*) AS n_runs,
           | CAST(sum(run_events) AS BIGINT) AS n_events,
           | max(run_events) AS max_run_events,
           | CAST(sum(run_span_s) AS BIGINT) AS sum_run_span_s
           |FROM runs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    headline = true)

  /** Keyless point-in-interval join through [[graft.ops.RangeJoin]]:
    * traffic inside ±10-minute windows around the 20 highest-value
    * purchases. There is NO equi key (windows are global, not per-user),
    * the shape Spark would otherwise plan as BroadcastNestedLoopJoin —
    * the bucketed reduction keeps it an equi join that survives an
    * interval side too big to broadcast. 5-minute grain ≈ half the
    * 20-minute window length (≤5 bucket copies per interval). The window
    * dimension is top-k bounded (TakeOrderedAndProject), so at any SF the
    * interval side stays 20 rows; the genuine fact-sized-both-sides case
    * is exercised in RangeJoinSpec against a naive cross-join oracle.
    */
  private val peakWindows = Q(
    "range_join_peak_windows",
    (s, d) => {
      val ev = Tables.events(s, d)
      val peaks = ev.filter(col("event_type") === "purchase")
        .orderBy(col("value").desc, col("event_id"))
        .limit(20)
        .select(col("event_id").as("peak_id"),
          (col("ts") - expr("INTERVAL 10 MINUTES")).as("w_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
      graft.ops.RangeJoin.pointInInterval(
          ev.select(col("ts"), col("user_id")), peaks,
          ptTs = "ts", ivStart = "w_start", ivEnd = "w_end",
          grainSec = 300L)
        .groupBy(col("peak_id"))
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("user_id")).as("n_users"))
        .orderBy(col("peak_id"))
    },
    Some("""WITH peaks AS (
           |  SELECT event_id AS peak_id,
           |   ts - INTERVAL 10 MINUTE AS w_start,
           |   ts + INTERVAL 10 MINUTE AS w_end
           |  FROM events WHERE event_type = 'purchase'
           |  ORDER BY value DESC, event_id LIMIT 20)
           |SELECT peak_id, count(*) AS n_events,
           | count(DISTINCT user_id) AS n_users
           |FROM peaks JOIN events e
           |  ON e.ts >= w_start AND e.ts <= w_end
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Multi-touch (linear) attribution: every purchase distributes
    * exactly 1,000,000 micro-credits over that user's touches (any
    * non-purchase event) in the trailing 24 hours; per-channel totals
    * reported. Credit split is INTEGER — each touch gets 1e6 div n and
    * the division remainder goes to the last touch (ts, event_id
    * order), so per-conversion credit sums to exactly 1e6 and the
    * cross-engine compare is exact. The touch join and the rank window
    * are both keyed on user_id (the scale axis; per-user event counts
    * bound the fan-out); output is |channels|-bounded.
    */
  private val attribution = Q(
    "attr_linear_touch_credit",
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
      val wOrd = w.orderBy(col("touch_ts").desc, col("touch_id").desc)
      joined
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("credit", expr("1000000 div n") +
          when(col("rn") === 1, expr("1000000 % n")).otherwise(0L))
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
           |     ORDER BY touch_ts DESC, touch_id DESC) AS rn
           |  FROM j)
           |SELECT channel, count(*) AS n_touches,
           | count(DISTINCT conv_id) AS n_conversions,
           | CAST(sum(1000000 // n
           |   + CASE WHEN rn = 1 THEN 1000000 % n ELSE 0 END) AS BIGINT)
           |   AS credit_micro
           |FROM r GROUP BY 1 ORDER BY 1""".stripMargin))

  /** CUSUM changepoint estimation on the daily event-count series, per
    * event_type (Page 1954 — the classic level-shift detector): the
    * estimated changepoint is the day maximizing |cumulative deviation
    * from the series mean|. All integer: with S = Σcounts over N days
    * and prefix_t the running count sum, the deviation prefix_t − t·S/N
    * is scaled by N to dev_t = N·prefix_t − t·S — an exact BIGINT, no
    * mean rounding anywhere (the integral-sufficient-statistics rule).
    * One day-level aggregation (map-side combined, |days|×|types|
    * rows), one per-type window over that BOUNDED daily frame — the raw
    * event table never enters a window. Argmax via one max(struct)
    * (|dev| desc, earliest day tiebreak), partial-aggregating.
    */
  private val changepoint = Q(
    "ts_changepoint_cusum",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val wAll = Window.partitionBy(col("event_type"))
      val dev = daily
        .withColumn("t", row_number().over(w))
        .withColumn("prefix", sum(col("cnt")).over(w))
        .withColumn("n_days", count(lit(1)).over(wAll))
        .withColumn("total", sum(col("cnt")).over(wAll))
        .withColumn("dev",
          col("n_days") * col("prefix") - col("t") * col("total"))
      dev.groupBy(col("event_type"))
        .agg(max(col("n_days")).as("n_days"), max(col("total")).as("total"),
          max(struct(abs(col("dev")).as("absdev"), (-col("t")).as("negt"),
            col("day"), col("dev"))).as("b"))
        .select(col("event_type"), col("n_days"), col("total"),
          col("b.day").as("cp_day"), col("b.absdev").as("max_absdev"))
        .orderBy(col("event_type"))
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
           |  count(*) AS cnt FROM events GROUP BY 1, 2),
           |d AS (SELECT event_type, day, cnt,
           |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
           |  CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY day)
           |    AS BIGINT) AS prefix,
           |  count(*) OVER (PARTITION BY event_type) AS n_days,
           |  CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS total
           | FROM daily),
           |v AS (SELECT event_type, day, n_days, total,
           |  n_days * prefix - t * total AS dev,
           |  row_number() OVER (PARTITION BY event_type
           |    ORDER BY abs(n_days * prefix - t * total) DESC, t) AS rk
           | FROM d)
           |SELECT event_type, n_days, total, day AS cp_day,
           | CAST(abs(dev) AS BIGINT) AS max_absdev
           |FROM v WHERE rk = 1 ORDER BY 1""".stripMargin))

  /** Top-3 event types per hourly tumbling window — the windowed top-K
    * shape every streaming dashboard runs ("trending now"). Batch twin
    * of the streaming formulation: hourly counts (map-side combined to
    * |hours|×|types| rows), then a rank window PARTITIONED by the hour
    * bucket — the partition key makes it scale-safe (each window's
    * top-K sorts only that window's |types| rows; contrast
    * ops/GlobalOrder for the unpartitioned case). Tiebreak on
    * event_type is safe here: the enum is ASCII (the non-ASCII
    * collation rule bars unicode ORDER BY, not enum codes).
    */
  private val windowedTopK = Q(
    "stream_windowed_topk",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").getField("start").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("hour"))
        .orderBy(col("n").desc, col("event_type"))
      hourly.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("hour"), col("rank"), col("event_type"), col("n"))
        .orderBy(col("hour"), col("rank"))
    },
    Some("""WITH h AS (SELECT date_trunc('hour', ts) AS hour, event_type,
           |  count(*) AS n FROM events GROUP BY 1, 2),
           |r AS (SELECT hour, event_type, n, row_number() OVER (
           |  PARTITION BY hour ORDER BY n DESC, event_type) AS rank FROM h)
           |SELECT hour, rank, event_type, n FROM r
           |WHERE rank <= 3 ORDER BY 1, 2""".stripMargin))

  /** Seasonal-naive forecast baseline + its error (the sanity floor
    * every real forecasting model must beat, and the standard MASE
    * denominator): predict each (type, day, hour-of-day) count with
    * the SAME HOUR one day earlier — a lag-1 window per (type, hour)
    * ordered by day — and report integer absolute-error sums per type.
    * All integer end-to-end (counts, |y−ŷ| sums, evaluated-pair
    * counts); consumers derive MAE by one division. The windows run
    * over the BOUNDED daily frame (|days|×24×|types| rows), never the
    * raw event table. Only observed (type, day, hour) buckets
    * participate — the activity-conditional convention, zeros are not
    * imputed.
    */
  private val seasonalNaive = Q(
    "ts_seasonal_naive_error",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"),
          hour(col("ts")).as("hod"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type"), col("hod"))
        .orderBy(col("day"))
      hourly
        .withColumn("prev_day", lag(col("day"), 1).over(w))
        .withColumn("prev_n", lag(col("n"), 1).over(w))
        // a gap in the daily series means "yesterday same hour" was
        // unobserved — only adjacent-day pairs count as forecasts
        .filter(col("prev_day").isNotNull &&
          datediff(col("day"), col("prev_day")) === 1)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_forecasts"),
          sum(abs(col("n") - col("prev_n"))).as("sum_abs_err"),
          sum(col("n")).as("sum_actual"))
        .orderBy(col("event_type"))
    },
    Some("""WITH h AS (SELECT event_type, CAST(ts AS DATE) AS day,
           |  hour(ts) AS hod, count(*) AS n FROM events GROUP BY 1, 2, 3),
           |l AS (SELECT event_type, day, n,
           |  lag(day) OVER (PARTITION BY event_type, hod ORDER BY day)
           |    AS prev_day,
           |  lag(n) OVER (PARTITION BY event_type, hod ORDER BY day)
           |    AS prev_n
           | FROM h)
           |SELECT event_type, count(*) AS n_forecasts,
           | CAST(sum(abs(n - prev_n)) AS BIGINT) AS sum_abs_err,
           | CAST(sum(n) AS BIGINT) AS sum_actual
           |FROM l WHERE prev_day IS NOT NULL
           |  AND date_diff('day', prev_day, day) = 1
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Half-life-decayed engagement score per user (recency-weighted
    * value, the freshness-aware ranking signal behind "active users" /
    * churn-risk lists): each event's centi-unit value is divided by
    * 2^(weeks-of-age), integer division on positive integers — trunc
    * and floor agree, `div` == `//` — so the score is an exact BIGINT
    * in both engines; no exp()/pow() ever runs. Age anchors to the
    * table's max timestamp (derived, broadcast as one row). One
    * map-side-combinable aggregation; top-20 users via
    * TakeOrderedAndProject.
    */
  private val decayed = Q(
    "ts_decayed_engagement",
    (s, d) => {
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("user_id"), col("ts"),
          round(col("value") * 100).cast("long").as("c"))
      val anchor = ev.agg(max(col("ts")).as("t_max"))
      ev.crossJoin(broadcast(anchor))
        // capped at 30: cents < 2^17, so every weeks ≥ 17 already decays
        // to 0 under integer division — the cap only guards the shift
        // against >63-bit wrap on pathological date ranges
        .withColumn("weeks",
          least(floor(datediff(to_date(col("t_max")), to_date(col("ts"))) / lit(7))
            .cast("long"), lit(30L)))
        .withColumn("dc", expr("c div (cast(1 as bigint) << weeks)"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("c")).as("raw_centi"), sum(col("dc")).as("decayed_centi"))
        .orderBy(col("decayed_centi").desc, col("user_id"))
        .limit(20)
    },
    Some("""WITH e AS (SELECT user_id, ts,
           |  CAST(round(value * 100) AS BIGINT) AS c
           | FROM events WHERE value IS NOT NULL),
           |a AS (SELECT max(ts) AS t_max FROM e),
           |w AS (SELECT user_id, c,
           |  c // (CAST(1 AS BIGINT) << least(CAST(floor(
           |    date_diff('day', CAST(ts AS DATE), CAST(t_max AS DATE)) / 7)
           |    AS BIGINT), 30)) AS dc
           | FROM e, a)
           |SELECT user_id, count(*) AS n_events,
           | CAST(sum(c) AS BIGINT) AS raw_centi,
           | CAST(sum(dc) AS BIGINT) AS decayed_centi
           |FROM w GROUP BY 1
           |ORDER BY decayed_centi DESC, user_id LIMIT 20""".stripMargin))

  /** Point-in-time-correct feature assembly (the feature-store
    * training-set join): for each user's LATEST purchase (the label
    * row, picked by the partial-aggregating max(struct) convention —
    * no window), compute features from STRICTLY-PRIOR events only —
    * clicks in the trailing 7 days, non-purchase value mass in the
    * trailing 30 days (integer cents), and days since first activity.
    * Using any event at or after the label timestamp is the
    * train-serve-skew bug this operator exists to prevent; the strict
    * `<` bound and the per-feature trailing windows are the whole
    * point. One user-keyed join (the scale axis), one aggregation,
    * |users|-bounded output; users whose purchase is their first-ever
    * event keep the row with zeroed features (left join, −1 sentinel
    * for days_since_first).
    */
  private val pointInTime = Q(
    "feat_point_in_time",
    (s, d) => {
      val ev = Tables.events(s, d)
      val label = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"))).as("m"))
        .select(col("user_id"), col("m.ts").as("conv_ts"))
      // the strictly-prior bound lives in the JOIN condition, not a
      // post-filter: a post-filter on the right side would drop the
      // null-extended row of a user whose purchase precedes all their
      // other events, silently losing the label
      val prior = ev.select(col("user_id").as("p_uid"), col("ts").as("e_ts"),
        col("event_type").as("et"), col("value"))
      label.join(prior, col("user_id") === col("p_uid") &&
          col("e_ts") < col("conv_ts"), "left")
        .groupBy(col("user_id"), col("conv_ts"))
        .agg(
          coalesce(sum(when(col("et") === "click" &&
            col("e_ts") >= col("conv_ts") - expr("INTERVAL 7 days"),
            1L)), lit(0L)).as("n_clicks_7d"),
          coalesce(sum(when(col("et") =!= "purchase" &&
            col("e_ts") >= col("conv_ts") - expr("INTERVAL 30 days"),
            round(col("value") * 100).cast("long"))), lit(0L))
            .as("value_sum_30d_c"),
          coalesce(datediff(to_date(max(col("conv_ts"))),
            min(to_date(col("e_ts")))), lit(-1)).as("days_since_first"))
        .select(col("user_id"), col("conv_ts"), col("n_clicks_7d"),
          col("value_sum_30d_c"), col("days_since_first"))
        .orderBy(col("user_id"))
    },
    Some("""WITH lbl AS (SELECT user_id, conv_ts FROM
           |  (SELECT user_id, ts AS conv_ts, row_number() OVER
           |    (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           |   FROM events WHERE event_type = 'purchase') WHERE rn = 1),
           |j AS (SELECT l.user_id, l.conv_ts, e.ts AS e_ts,
           |   e.event_type AS et, e.value
           |  FROM lbl l LEFT JOIN events e
           |   ON e.user_id = l.user_id AND e.ts < l.conv_ts)
           |SELECT user_id, conv_ts,
           | COALESCE(CAST(sum(CASE WHEN et = 'click'
           |   AND e_ts >= conv_ts - INTERVAL 7 DAY THEN 1 END) AS BIGINT),
           |   0) AS n_clicks_7d,
           | COALESCE(CAST(sum(CASE WHEN et <> 'purchase'
           |   AND e_ts >= conv_ts - INTERVAL 30 DAY
           |   THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT), 0)
           |   AS value_sum_30d_c,
           | COALESCE(CAST(max(conv_ts) AS DATE)
           |   - min(CAST(e_ts AS DATE)), -1) AS days_since_first
           |FROM j GROUP BY 1, 2 ORDER BY 1""".stripMargin))

  /** Duration-capped sessionization (the GA4/Adobe rule): sessions cut
    * at a 30-minute inactivity gap AND split again every 4 hours of
    * elapsed time — without the cap, a bot that pings every 29 minutes
    * holds one session open forever, which is exactly the state-bound
    * problem streaming sessionization has too. The cap needs no
    * recurrence: within a gap-session, the sub-session is
    * ⌊elapsed-from-session-start / 4 h⌋, exact integer division on
    * truncated epoch seconds. Two user-keyed windows sharing one
    * shuffle + one grouped join for the session starts; output is
    * per-user session counts (|users|-bounded).
    */
  private val cappedSessions = Q(
    "window_capped_sessions",
    (s, d) => {
      // sequence order is (TRUNCATED-second, event_id) — the same key
      // the gap test uses — so same-second events order identically in
      // both engines regardless of their sub-second parts
      val wSeq = Window.partitionBy(col("user_id"))
        .orderBy(col("es"), col("event_id"))
      val base = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("es"))
        .withColumn("prev_es", lag(col("es"), 1).over(wSeq))
        .withColumn("brk",
          when(col("prev_es").isNull ||
            col("es") - col("prev_es") > 1800L, 1L).otherwise(0L))
        .withColumn("sess", sum(col("brk")).over(
          wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val starts = base.groupBy(col("user_id"), col("sess"))
        .agg(min(col("es")).as("start_es"))
      base.join(starts, Seq("user_id", "sess"))
        .withColumn("sub", expr("(es - start_es) div 14400"))
        .groupBy(col("user_id"))
        .agg(countDistinct(col("sess")).as("n_gap_sessions"),
          countDistinct(col("sess"), col("sub")).as("n_capped_sessions"),
          count(lit(1)).as("n_events"),
          max(col("es") - col("start_es")).as("max_elapsed_s"))
        .orderBy(col("user_id"))
    },
    Some("""WITH e0 AS (SELECT user_id, event_id,
           |   epoch(date_trunc('second', ts))::BIGINT AS es FROM events),
           |b0 AS (SELECT user_id, event_id, es,
           |   lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id)
           |     AS prev_es
           |  FROM e0),
           |b1 AS (SELECT user_id, event_id, es,
           |   CASE WHEN prev_es IS NULL OR es - prev_es > 1800
           |    THEN 1 ELSE 0 END AS brk
           |  FROM b0),
           |b2 AS (SELECT user_id, event_id, es,
           |   CAST(sum(brk) OVER (PARTITION BY user_id
           |     ORDER BY es, event_id
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |    AS BIGINT) AS sess
           |  FROM b1),
           |st AS (SELECT user_id, sess, min(es) AS start_es
           |  FROM b2 GROUP BY 1, 2),
           |x AS (SELECT b2.user_id, b2.sess, es,
           |   (es - start_es) // 14400 AS sub, es - start_es AS el
           |  FROM b2 JOIN st ON b2.user_id = st.user_id
           |   AND b2.sess = st.sess)
           |SELECT user_id, count(DISTINCT sess) AS n_gap_sessions,
           | count(DISTINCT (sess, sub)) AS n_capped_sessions,
           | count(*) AS n_events, max(el) AS max_elapsed_s
           |FROM x GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Strict WINDOWED funnel (the ClickHouse `windowFunnel` contract,
    * which the plain conditional-min funnel does not pin): stage k
    * must happen strictly after stage k−1 AND the whole chain must fit
    * inside 1 hour of the user's FIRST stage-1 event. Three chained
    * user-keyed conditional-min aggregations — each stage's timestamp
    * is a min over events bounded by the previous stage — and one
    * 1-row rollup with the completers' exact total time-to-convert.
    */
  private val windowedFunnel = Q(
    "funnel_windowed_strict",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type").as("et"),
          unix_timestamp(col("ts")).as("es"))
      val s1 = ev.filter(col("et") === "view")
        .groupBy(col("user_id")).agg(min(col("es")).as("t1"))
      val s2 = ev.join(s1, Seq("user_id"))
        .filter(col("et") === "click" && col("es") > col("t1") &&
          col("es") <= col("t1") + 3600L)
        .groupBy(col("user_id"))
        .agg(max(col("t1")).as("t1"), min(col("es")).as("t2"))
      val s3 = ev.join(s2, Seq("user_id"))
        .filter(col("et") === "purchase" && col("es") > col("t2") &&
          col("es") <= col("t1") + 3600L)
        .groupBy(col("user_id"))
        .agg(max(col("t1")).as("t1"), min(col("es")).as("t3"))
      s1.agg(count(lit(1)).as("n_stage1")).crossJoin(
          s2.agg(count(lit(1)).as("n_stage2"))).crossJoin(
          s3.agg(count(lit(1)).as("n_stage3"),
            coalesce(sum(col("t3") - col("t1")), lit(0L))
              .as("sum_convert_s")))
    },
    Some("""WITH ev AS (SELECT user_id, event_type AS et,
           |   epoch(date_trunc('second', ts))::BIGINT AS es FROM events),
           |s1 AS (SELECT user_id, min(es) AS t1 FROM ev
           |  WHERE et = 'view' GROUP BY 1),
           |s2 AS (SELECT ev.user_id, max(t1) AS t1, min(es) AS t2
           |  FROM ev JOIN s1 ON ev.user_id = s1.user_id
           |  WHERE et = 'click' AND es > t1 AND es <= t1 + 3600
           |  GROUP BY 1),
           |s3 AS (SELECT ev.user_id, max(t1) AS t1, min(es) AS t3
           |  FROM ev JOIN s2 ON ev.user_id = s2.user_id
           |  WHERE et = 'purchase' AND es > t2 AND es <= t1 + 3600
           |  GROUP BY 1)
           |SELECT
           | (SELECT count(*) FROM s1) AS n_stage1,
           | (SELECT count(*) FROM s2) AS n_stage2,
           | (SELECT count(*) FROM s3) AS n_stage3,
           | (SELECT COALESCE(CAST(sum(t3 - t1) AS BIGINT), 0) FROM s3)
           |   AS sum_convert_s""".stripMargin))

  /** Day-N retention curve (the growth team's D1/D3/D7/D14 dashboard,
    * the daily-grain complement to `cohort_weekly_retention`): cohort =
    * each user's FIRST active day; a user retains at offset N by being
    * active exactly ON day cohort+N (the classic strict definition —
    * "bounded" retention, not "unbounded within N"). One user-keyed
    * min, one distinct (user, day) frame, one join keyed on user with
    * the offset read off datediff — conditional counts land on the
    * |cohort-days|-bounded output.
    */
  private val dnRetention = Q(
    "cohort_dn_retention",
    (s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val first = days.groupBy(col("user_id")).agg(min(col("day")).as("d0"))
      val joined = days.join(first, Seq("user_id"))
        .select(col("user_id"), col("d0"),
          datediff(col("day"), col("d0")).as("off"))
      joined.groupBy(col("d0").as("cohort_day"))
        .agg(countDistinct(col("user_id")).as("n_cohort"),
          sum(when(col("off") === 1, 1L).otherwise(0L)).as("d1"),
          sum(when(col("off") === 3, 1L).otherwise(0L)).as("d3"),
          sum(when(col("off") === 7, 1L).otherwise(0L)).as("d7"),
          sum(when(col("off") === 14, 1L).otherwise(0L)).as("d14"))
        .orderBy(col("cohort_day"))
    },
    Some("""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
           |  FROM events),
           |f AS (SELECT user_id, min(day) AS d0 FROM days GROUP BY 1),
           |j AS (SELECT days.user_id, d0, days.day - d0 AS off
           |  FROM days JOIN f ON days.user_id = f.user_id)
           |SELECT d0 AS cohort_day, count(DISTINCT user_id) AS n_cohort,
           | CAST(sum(CASE WHEN off = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
           | CAST(sum(CASE WHEN off = 3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
           | CAST(sum(CASE WHEN off = 7 THEN 1 ELSE 0 END) AS BIGINT) AS d7,
           | CAST(sum(CASE WHEN off = 14 THEN 1 ELSE 0 END) AS BIGINT)
           |   AS d14
           |FROM j GROUP BY 1 ORDER BY 1""".stripMargin))

  /** SCD2 point-in-time snapshot — the question an SCD2 dimension
    * exists to answer: "what was every entity's attribute AT time T".
    * The dimension versions itself derive from the event stream (each
    * change of a user's event_type opens a version; valid_from = its
    * first second, valid_to = the next version's valid_from — the
    * `scd2_event_type_runs` change-detection shape), and T is the
    * data's own temporal midpoint ((min+max) div 2 epoch seconds — no
    * wall clock, so the query is replayable). The snapshot filter is
    * the half-open interval membership valid_from ≤ T < valid_to
    * (NULL-open tail), applied with T broadcast as a one-row frame;
    * the versions frame is |changes|-sized and the output
    * |event_types|-sized. At scale this is the audit/backfill primitive
    * behind "rebuild features as of the training cutoff".
    */
  private val scd2Snapshot = Q(
    "warehouse_scd2_pit_snapshot",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("ts_s"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_s"), col("event_id"))
      val versions = ev
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(w).isNull ||
            lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("ver", sum(col("chg")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("event_type"), col("ver"))
        .agg(min(col("ts_s")).as("valid_from"))
        // ver tiebreak: two versions can open within the same SECOND
        // (type flips inside one truncated timestamp) — valid_from alone
        // would order them engine-dependently
        .withColumn("valid_to", lead(col("valid_from"), 1).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("valid_from"), col("ver"))))
      val t = ev.agg(
        ((min(col("ts_s")) + max(col("ts_s"))) / 2).cast("long").as("t_s"))
      versions.crossJoin(broadcast(t))
        .filter(col("valid_from") <= col("t_s") &&
          (col("valid_to").isNull || col("t_s") < col("valid_to")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users_active"),
          sum(col("user_id")).as("sum_user_ids"))
        .orderBy(col("event_type"))
    },
    Some("""WITH ev AS (SELECT user_id, event_id, event_type,
           |  epoch(date_trunc('second', ts))::BIGINT AS ts_s FROM events),
           |m AS (SELECT user_id, event_id, event_type, ts_s,
           |  CASE WHEN lag(event_type) OVER
           |      (PARTITION BY user_id ORDER BY ts_s, event_id)
           |    IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
           | FROM ev),
           |r AS (SELECT user_id, event_type, ts_s,
           |  CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |    AS ver
           | FROM m),
           |v AS (SELECT user_id, event_type, ver,
           |   min(ts_s) AS valid_from FROM r GROUP BY 1, 2, 3),
           |v2 AS (SELECT user_id, event_type, valid_from,
           |  lead(valid_from) OVER (PARTITION BY user_id
           |    ORDER BY valid_from, ver) AS valid_to
           | FROM v),
           |t AS (SELECT (min(ts_s) + max(ts_s)) // 2 AS t_s FROM ev)
           |SELECT event_type, count(*) AS n_users_active,
           | CAST(sum(user_id) AS BIGINT) AS sum_user_ids
           |FROM v2 CROSS JOIN t
           |WHERE valid_from <= t_s AND (valid_to IS NULL OR t_s < valid_to)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  val qs: Seq[Q] = Seq(asof, asofBucketed, tumbling, jsonExtract, sliding,
    sessionWindows, funnel, cohorts, streamDedup, enrichStatic, gapfill,
    anomalies, scd2Runs, peakWindows, attribution, changepoint,
    windowedTopK, seasonalNaive, decayed, pointInTime, cappedSessions,
    windowedFunnel, dnRetention, scd2Snapshot)
}
