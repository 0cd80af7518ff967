package graft.analytics

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** The reference dashboard's analytics (SURVEY.md §2.6 A1-A8 + §2.4 F6-F7,
  * `interactive_dashboard.py:103-194`) bound to the harness tables, one
  * oracle-checked query per operator.
  */
object Dashboard extends QueryPack {

  private val a1 = Q(
    "a1_value_counts_event_type",
    (s, d) => Analytics.valueCounts(Tables.events(s, d), "event_type"),
    Some("""SELECT event_type, count(*) AS n FROM events
           |GROUP BY 1 ORDER BY n DESC, event_type NULLS FIRST""".stripMargin))

  private val a2 = Q(
    "a2_topk_doc_sources",
    (s, d) => Analytics.topK(Tables.documents(s, d), "source", 10),
    Some("""SELECT source, count(*) AS n FROM documents
           |GROUP BY 1 ORDER BY n DESC, source NULLS FIRST LIMIT 10""".stripMargin))

  private val a3 = Q(
    "a3_group_size_lang_source",
    (s, d) => Analytics.groupSize(Tables.documents(s, d), Seq("lang", "source"))
      .orderBy(col("lang"), col("source")),
    Some("""SELECT lang, source, count(*) AS n FROM documents
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  private val a4 = Q(
    "a4_distinct_users",
    (s, d) => Analytics.distinctCount(Tables.events(s, d), "user_id"),
    Some("SELECT count(DISTINCT user_id) AS n_distinct FROM events"))

  private val a5 = Q(
    "a5_users_with_multiple_event_types",
    (s, d) => Tables.events(s, d)
      .groupBy(col("user_id")).agg(count_distinct(col("event_type")).as("nd"))
      .filter(col("nd") >= 3)
      .agg(count(lit(1)).as("n_users")),
    Some("""SELECT count(*) AS n_users FROM (
           | SELECT user_id, count(DISTINCT event_type) AS nd
           | FROM events GROUP BY 1) t WHERE nd >= 3""".stripMargin))

  private val a6num = Q(
    "a6_histogram_event_value",
    (s, d) => Analytics.histogram(Tables.events(s, d), "value", 30),
    // Same arithmetic shape: (v - min) / ((max - min)/30), floored,
    // max folded into bin 29. IEEE-identical in both engines. Nulls
    // dropped and the constant-column case pinned to bin 0, mirroring
    // Analytics.histogram exactly.
    Some("""WITH stats AS (
           | SELECT min(value) AS mn, max(value) AS mx FROM events WHERE value IS NOT NULL)
           |SELECT CAST(CASE WHEN mx = mn THEN 0
           |   ELSE least(floor((value - mn) / ((mx - mn) / 30)), 29) END AS BIGINT) AS bin,
           |       count(*) AS n
           |FROM events, stats WHERE value IS NOT NULL
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  private val a6time = Q(
    "a6_histogram_orders_by_month",
    (s, d) => Analytics.timeHistogram(Tables.orders(s, d), "o_orderdate", "month")
      .withColumnRenamed("bucket", "month"),
    // CAST: DuckDB date_trunc('month', ts) yields DATE; Spark yields
    // TIMESTAMP — align the oracle's type with the engine's.
    Some("""SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           | count(*) AS n
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  /** A6 datetime equi-width flavor (px.histogram on a datetime column,
    * nbins=50: data-dependent epoch-space bin edges, exactly the numeric
    * algorithm applied to unix seconds).
    */
  private val a6tsEqui = Q(
    "a6_histogram_ts_equiwidth",
    (s, d) => Analytics.histogram(
      Tables.events(s, d).select(
        col("ts").cast("double").as("epoch")), "epoch", 50),
    Some("""WITH e AS (SELECT epoch(ts) AS ep FROM events WHERE ts IS NOT NULL),
           |stats AS (SELECT min(ep) AS mn, max(ep) AS mx FROM e)
           |SELECT CAST(CASE WHEN mx = mn THEN 0
           |   ELSE least(floor((ep - mn) / ((mx - mn) / 50)), 49) END AS BIGINT) AS bin,
           |       count(*) AS n
           |FROM e, stats GROUP BY 1 ORDER BY 1""".stripMargin))

  /** A3 crosstab flavor: pivot — the dashboard's filename×reason matrix
    * shape. Pivot values are an explicit list (schema must be
    * data-independent); Catalyst plans it as one hash aggregate with
    * conditional counters, no extra shuffle per column.
    */
  private val a3pivot = Q(
    "a3_pivot_lang_by_source",
    (s, d) => Tables.documents(s, d)
      .groupBy(col("lang"))
      .pivot("source", Seq("src0", "src1", "src2", "src3"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("lang")),
    Some("""SELECT lang,
           | count(CASE WHEN source = 'src0' THEN 1 END) AS src0,
           | count(CASE WHEN source = 'src1' THEN 1 END) AS src1,
           | count(CASE WHEN source = 'src2' THEN 1 END) AS src2,
           | count(CASE WHEN source = 'src3' THEN 1 END) AS src3
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin))

  private val a7 = Q(
    "a7_unique_event_types",
    (s, d) => Analytics.uniqueValues(Tables.events(s, d), "event_type"),
    Some("SELECT DISTINCT event_type FROM events ORDER BY event_type NULLS FIRST"))

  private val a8 = Q(
    "a8_preview_documents",
    (s, d) => Analytics.preview(
      Tables.documents(s, d).select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
      "doc_id", 5),
    Some("""SELECT doc_id, lang, source, n_chars FROM documents
           |ORDER BY doc_id LIMIT 5""".stripMargin))

  /** A4 scale path: HLL distinct. Engine-specific sketch → no SQL oracle
    * (DuckDB's approx algo differs); accuracy pinned in AnalyticsSpec.
    */
  private val a4approx = Q(
    "a4_approx_distinct_users",
    (s, d) => Analytics.approxDistinct(Tables.events(s, d), "user_id"),
    None)

  /** A4 at fleet scale: Datasketches HLL with explicit partial-sketch
    * MERGE — per-source sketches union to one estimate, which is the
    * whole point of a mergeable sketch (per-partition/per-day sketches
    * stored compact, combined without rescanning raw data; cardinality
    * of a 100 TB union = merging kilobyte sketches). Sketch internals
    * are engine-defined → no SQL oracle; AnalyticsSpec pins
    * merged == direct == within ε of exact.
    */
  private val a4sketchMerge = Q(
    "a4_hll_sketch_merge",
    (s, d) => {
      val ev = Tables.events(s, d)
      val perType = ev.groupBy(col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      perType
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_merged"))
        .crossJoin(ev.agg(
          hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_direct")))
    },
    None)

  /** A4 auditable-sketch flavor: HyperLogLog registers built on the
    * md5-60-bit uniform entirely in DataFrame ops — bucket = low 8
    * hash bits, rho = leading-zero rank of the remaining 52 (computed
    * EXACTLY via `length(bin(w))`, no FP log), register = max rho per
    * bucket, with the per-event_type partial registers max-merged
    * alongside the direct build to demonstrate the mergeability that
    * makes HLL the 100-TB cardinality tool. The output pins the
    * integer sufficient statistic S = Σ 2^(53−reg) (exact BIGINT — FP
    * enters only in the final αm²/S estimate, written as the identical
    * expression in both engines) next to the exact count, and
    * merge_equal == 1 pins sketch(∪ types) == merge(sketches). The
    * DuckDB oracle rebuilds registers, S, and estimates from raw rows.
    * Raw estimator only (no small-range linear-counting branch: that
    * needs ln(), which IEEE does not promise cross-engine-identical —
    * the uncorrected estimate is the deterministic choice, and n_exact
    * sits in the same row for the accuracy read).
    */
  private val a4hllPortable = Q(
    "a4_hll_md5_portable",
    (s, d) => {
      val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
      val br = ev.select(col("event_type"),
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
        .select(col("event_type"),
          pmod(col("h"), lit(256)).as("bucket"),
          shiftright(col("h"), 8).as("w"))
        .withColumn("rho", when(col("w") === 0, lit(53))
          .otherwise(lit(53) - length(bin(col("w")))))
      val direct = br.groupBy(col("bucket")).agg(max(col("rho")).as("reg"))
      val merged = br.groupBy(col("event_type"), col("bucket"))
        .agg(max(col("rho")).as("reg"))
        .groupBy(col("bucket")).agg(max(col("reg")).as("reg"))
      def sOf(regs: org.apache.spark.sql.DataFrame) = regs.agg(
        (sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 53 - reg) AS BIGINT)"))
          + (lit(256) - count(lit(1))) * lit(1L << 53)).cast("long").as("s"),
        count(lit(1)).as("nonzero"))
      def estOf(sCol: String) = expr(
        s"CAST(floor(0.7213 / (1 + 1.079 / 256) * 256 * 256 * pow(2.0, 53) / $sCol) AS BIGINT)")
      val sd = sOf(direct)
        .select(col("s").as("s_direct"), col("nonzero").as("nonzero_direct"))
      val sm = sOf(merged).select(col("s").as("s_merged"))
      ev.agg(countDistinct(col("user_id")).as("n_exact"))
        .crossJoin(sd).crossJoin(sm)
        .withColumn("est_direct", estOf("s_direct"))
        .withColumn("est_merged", estOf("s_merged"))
        .withColumn("merge_equal", (col("s_direct") === col("s_merged")).cast("int"))
    },
    Some("""WITH h AS (SELECT event_type,
           |   ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
           |     ::BIGINT AS h
           |  FROM events WHERE user_id IS NOT NULL),
           |br AS (SELECT event_type, h % 256 AS bucket, h // 256 AS w FROM h),
           |rr AS (SELECT event_type, bucket,
           |   CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END AS rho
           |  FROM br),
           |direct AS (SELECT bucket, max(rho) AS reg FROM rr GROUP BY 1),
           |pt AS (SELECT event_type, bucket, max(rho) AS reg
           |  FROM rr GROUP BY 1, 2),
           |merged AS (SELECT bucket, max(reg) AS reg FROM pt GROUP BY 1),
           |sd AS (SELECT CAST(sum(CAST(1 AS BIGINT) << (53 - reg))
           |    + (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS BIGINT)
           |    AS s_direct,
           |   count(*) AS nonzero_direct FROM direct),
           |sm AS (SELECT CAST(sum(CAST(1 AS BIGINT) << (53 - reg))
           |    + (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS BIGINT)
           |    AS s_merged FROM merged),
           |ex AS (SELECT count(DISTINCT user_id) AS n_exact FROM events
           |  WHERE user_id IS NOT NULL)
           |SELECT n_exact, nonzero_direct, s_direct,
           | CAST(floor(0.7213 / (1 + 1.079 / 256) * 256 * 256
           |   * pow(2.0, 53) / s_direct) AS BIGINT) AS est_direct,
           | s_merged,
           | CAST(floor(0.7213 / (1 + 1.079 / 256) * 256 * 256
           |   * pow(2.0, 53) / s_merged) AS BIGINT) AS est_merged,
           | CAST(s_direct = s_merged AS INT) AS merge_equal
           |FROM ex, sd, sm""".stripMargin))

  /** Oracle-able twin of `a4_approx_distinct_users`: the same
    * approximate-distinct job through the engine's KMV sketch
    * ([[graft.functions.KmvAgg.sketchMd5]], bounded k-longs state) built
    * on the md5-60 uniform, so a DuckDB oracle rebuilds the sketch with
    * ORDER BY/LIMIT and the (k−1)/v_k estimate is the IDENTICAL double
    * expression in both engines (one division pair, then floor). Exact
    * below k; v_k itself is an integral hash so every published cell is
    * integer-exact.
    */
  private def kmvEst(skCol: String, k: Int) = expr(
    s"""CASE WHEN size($skCol) < $k THEN CAST(size($skCol) AS BIGINT)
       |ELSE CAST(floor(($k - 1) / (CAST(element_at($skCol, $k) AS DOUBLE)
       |  / pow(2.0, 60))) AS BIGINT) END""".stripMargin)

  private val a4kmvPortable = Q(
    "a4_kmv_md5_portable",
    (s, d) => {
      val k = 256
      val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
      ev.agg(
          graft.functions.KmvAgg
            .sketchMd5(col("user_id").cast("string"), k).as("sk"),
          countDistinct(col("user_id")).as("n_exact"))
        .select(col("n_exact"), size(col("sk")).cast("long").as("n_sketch"),
          kmvEst("sk", k).as("est_users"))
    },
    Some("""WITH u AS (SELECT DISTINCT user_id FROM events
           |  WHERE user_id IS NOT NULL),
           |hd AS (SELECT DISTINCT
           |   ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
           |     ::BIGINT AS h FROM u),
           |r AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hd),
           |sk AS (SELECT max(CASE WHEN rn <= 256 THEN h END) AS vk,
           |   CAST(sum(CASE WHEN rn <= 256 THEN 1 ELSE 0 END) AS BIGINT)
           |     AS n_sketch
           |  FROM r)
           |SELECT (SELECT count(*) FROM u) AS n_exact, n_sketch,
           | CASE WHEN n_sketch < 256 THEN n_sketch
           |  ELSE CAST(floor((256 - 1) / (CAST(vk AS DOUBLE)
           |    / pow(2.0, 60))) AS BIGINT) END AS est_users
           |FROM sk""".stripMargin))

  /** Oracle-able twin of `a4_hll_sketch_merge`: partial KMV sketches per
    * event_type MERGED to one estimate (k smallest of the union of
    * k-smallest sets — the KMV merge theorem makes that lossless), next
    * to the direct single-pass sketch. merge_equal == 1 pins
    * merge(sketches) == sketch(∪), the mergeability property that lets
    * per-day/per-partition sketches combine at 100 TB without rescan.
    * The merge state is |event_types|·k longs — bounded by construction.
    */
  private val a4kmvMerge = Q(
    "a4_kmv_sketch_merge",
    (s, d) => {
      val k = 256
      val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
      val direct = ev.agg(graft.functions.KmvAgg
        .sketchMd5(col("user_id").cast("string"), k).as("skd"))
      val merged = ev.groupBy(col("event_type"))
        .agg(graft.functions.KmvAgg
          .sketchMd5(col("user_id").cast("string"), k).as("sk"))
        .agg(graft.functions.KmvAgg.mergeSketches(col("sk"), k).as("skm"))
      direct.crossJoin(merged)
        .select(size(col("skd")).cast("long").as("n_sketch"),
          kmvEst("skd", k).as("est_direct"),
          kmvEst("skm", k).as("est_merged"),
          (col("skd") === col("skm")).cast("int").as("merge_equal"))
    },
    Some("""WITH hd AS (SELECT DISTINCT
           |   ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
           |     ::BIGINT AS h
           |  FROM events WHERE user_id IS NOT NULL),
           |r AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hd),
           |th AS (SELECT DISTINCT event_type,
           |   ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
           |     ::BIGINT AS h
           |  FROM events WHERE user_id IS NOT NULL),
           |tr AS (SELECT event_type, h, row_number() OVER (
           |    PARTITION BY event_type ORDER BY h) AS rn FROM th),
           |mh AS (SELECT DISTINCT h FROM tr WHERE rn <= 256),
           |mr AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM mh),
           |dsk AS (SELECT max(CASE WHEN rn <= 256 THEN h END) AS vk,
           |   CAST(sum(CASE WHEN rn <= 256 THEN 1 ELSE 0 END) AS BIGINT)
           |     AS n, list(h ORDER BY h) FILTER (WHERE rn <= 256) AS l FROM r),
           |msk AS (SELECT max(CASE WHEN rn <= 256 THEN h END) AS vk,
           |   CAST(sum(CASE WHEN rn <= 256 THEN 1 ELSE 0 END) AS BIGINT)
           |     AS n, list(h ORDER BY h) FILTER (WHERE rn <= 256) AS l FROM mr)
           |SELECT dsk.n AS n_sketch,
           | CASE WHEN dsk.n < 256 THEN dsk.n
           |  ELSE CAST(floor((256 - 1) / (CAST(dsk.vk AS DOUBLE)
           |    / pow(2.0, 60))) AS BIGINT) END AS est_direct,
           | CASE WHEN msk.n < 256 THEN msk.n
           |  ELSE CAST(floor((256 - 1) / (CAST(msk.vk AS DOUBLE)
           |    / pow(2.0, 60))) AS BIGINT) END AS est_merged,
           | CAST(dsk.l = msk.l AS INT) AS merge_equal
           |FROM dsk, msk""".stripMargin))

  /** The reference dashboard's scatter panel
    * (`interactive_dashboard.py:85-92`): two numeric columns with an
    * optional categorical color — a bare projection. The engine twin
    * adds the one thing a 100 TB dashboard needs before plotting: a
    * DETERMINISTIC bounded sample, here the 500 smallest md5(event_id)
    * (a uniform hash draw with a total order, so both engines pick the
    * identical rows via TakeOrderedAndProject — never a global sort).
    */
  private val scatterSample = Q(
    "dashboard_scatter_sample",
    (s, d) => Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("user_id").as("x"),
        col("value").as("y"), col("event_type").as("color"),
        md5(col("event_id").cast("string")).as("m5"))
      .orderBy(col("m5"))
      .limit(500)
      .select(col("event_id"), col("x"), col("y"), col("color")),
    Some("""SELECT event_id, user_id AS x, value AS y,
           | event_type AS color
           |FROM events WHERE value IS NOT NULL
           |ORDER BY md5(CAST(event_id AS VARCHAR)) LIMIT 500""".stripMargin))

  /** A5 exact reference shape: # groups via grouped-distinct-then-count. */
  private val a5groups = Q(
    "a5_groups_with_distinct",
    (s, d) => Analytics.groupedDistinctThenCount(Tables.events(s, d), "user_id", "event_type"),
    Some("""SELECT count(*) AS n_groups FROM (
           | SELECT user_id, count(DISTINCT event_type) AS nd
           | FROM events GROUP BY 1) t""".stripMargin))

  /** F8: dtype routing — numeric columns only, aggregated. */
  private val f8 = Q(
    "f8_dtype_pruned_numeric",
    (s, d) => {
      val numeric = Analytics.selectByType(Tables.events(s, d),
        org.apache.spark.sql.types.DoubleType)
      numeric.agg(count(lit(1)).as("n"),
        round(min(col("value")), 6).as("min_value"),
        round(max(col("value")), 6).as("max_value"))
    },
    Some("""SELECT count(*) AS n, round(min(value), 6) AS min_value,
           | round(max(value), 6) AS max_value FROM events""".stripMargin))

  /** Ingest profiling over orders: one-pass per-column stats. */
  private val profileQ = Q(
    "profile_orders",
    (s, d) => Analytics.profile(Tables.orders(s, d)),
    Some("""SELECT 'o_custkey' AS col_name, count(o_custkey) AS n_nonnull,
           |  count(DISTINCT o_custkey) AS n_distinct FROM orders
           |UNION ALL SELECT 'o_orderdate', count(o_orderdate),
           |  count(DISTINCT o_orderdate) FROM orders
           |UNION ALL SELECT 'o_orderkey', count(o_orderkey),
           |  count(DISTINCT o_orderkey) FROM orders
           |UNION ALL SELECT 'o_orderpriority', count(o_orderpriority),
           |  count(DISTINCT o_orderpriority) FROM orders
           |UNION ALL SELECT 'o_orderstatus', count(o_orderstatus),
           |  count(DISTINCT o_orderstatus) FROM orders
           |UNION ALL SELECT 'o_totalprice', count(o_totalprice),
           |  count(DISTINCT o_totalprice) FROM orders
           |ORDER BY col_name""".stripMargin))

  private val f6 = Q(
    "f6_contains_filter_docs",
    (s, d) => Analytics.containsFilter(Tables.documents(s, d), "text", "spark")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .orderBy(col("lang")),
    Some("""SELECT lang, count(*) AS n FROM documents
           |WHERE contains(lower(text), 'spark') GROUP BY 1 ORDER BY 1""".stripMargin))

  /** F7 drilldown: the operator is the row-level equality filter (no
    * shuffle, fully pipelined); the VERIFIED output is reduced per user
    * so it's bounded by |users|, not |error events| — the r2 version
    * globally sorted every error row for hash stability, a scale-killer
    * at 100× (VERDICT r2 #4).
    */
  private val f7 = Q(
    "f7_drilldown_errors",
    (s, d) => Analytics.drilldown(Tables.events(s, d), "event_type", "error")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), min(col("event_id")).as("min_event"),
        max(col("event_id")).as("max_event"))
      .orderBy(col("user_id")),
    Some("""SELECT user_id, count(*) AS n, min(event_id) AS min_event,
           | max(event_id) AS max_event
           |FROM events WHERE event_type = 'error'
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Approximate frequent items via the custom Misra-Gries typed
    * Aggregator ([[graft.functions.FreqItemsAgg]]): the one-pass
    * mergeable heavy-hitter sketch — A2's scale path when exact top-K's
    * full groupBy is too expensive. Guarantee: every item with relative
    * frequency above the support threshold IS returned (false positives
    * possible, false negatives not) — pinned against exact counts in
    * AnalyticsSpec; no SQL oracle (sketch contents depend on merge
    * order). Lazy, unlike `DataFrame.stat.freqItems` which executes at
    * call time.
    */
  private val a2freq = Q(
    "a2_freq_items_approx",
    (s, d) => Tables.events(s, d)
      .agg(graft.functions.FreqItemsAgg
        .freqItems(col("event_type"), support = 0.1).as("items"))
      .select(explode(col("items")).as("item"))
      .orderBy(col("item")),
    // Misra-Gries contents are merge-order-shaped IN GENERAL, but on
    // this table the sketch is provably deterministic: capacity
    // ⌈1/0.1⌉ = 10 exceeds the event_type cardinality (5), so no
    // counter is ever evicted and the surviving key set is exactly the
    // distinct domain — which IS the oracle below. The sketch's
    // superset guarantee and eviction behavior under k < cardinality
    // stay pinned in AnalyticsSpec.
    Some("""SELECT DISTINCT event_type AS item FROM events
           |WHERE event_type IS NOT NULL ORDER BY 1""".stripMargin),
    headline = true)

  val qs: Seq[Q] = Seq(a1, a2, a3, a3pivot, a4, a4approx, a4sketchMerge,
    a4hllPortable, a4kmvPortable, a4kmvMerge, scatterSample, a5, a5groups,
    a6num, a6time, a6tsEqui, a7, a8, profileQ, f6, f7, f8, a2freq)
}
