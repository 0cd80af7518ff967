package graft.analytics

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintenance wave: MERGE/SCD1 upsert audit, incremental
  * aggregate maintenance, the mergeable sketches (Count-Min point
  * estimates, KMV set overlap), diff-localizing bucketed checksums, and
  * the generated calendar dimension — the operations that keep a 100 TB
  * warehouse correct and current between full rebuilds. Split from
  * [[StatsQueries]] (statistical/structural analytics) along the
  * maintain-vs-analyze line.
  */
object WarehouseQueries extends QueryPack {

  /** Latest row per key as an AGGREGATION, not a window: max over a
    * (sort-key..., payload) struct compares lexicographically, so it
    * partial-aggregates map-side — at 100 TB the latest-row extraction
    * ships one struct per key per input partition instead of sorting
    * whole partitions under a window.
    */
  private def latestType(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(col("user_id"))
    .agg(max(struct(expr("unix_micros(ts)").as("us"),
      col("event_id"), col("event_type"))).as("m"))
    .select(col("user_id"), col("m.event_type").as("et"))

  /** MERGE INTO semantics (SCD1 upsert) as a batch operator: the
    * dimension snapshot built from history before the cutover
    * full-outer-joins the post-cutover changes; unmatched-right inserts,
    * matched updates, unmatched-left carries over. The output is the
    * merge AUDIT (insert/update/unchanged counts + how many updates
    * actually changed the tracked attribute) — the row-level merge
    * itself is the join's projection. One shuffle per side plus the
    * join; both sides are key-sized, never event-sized.
    */
  private val upsertMerge = Q(
    "warehouse_upsert_merge",
    (s, d) => {
      val cut = "2024-01-15"
      val ev = Tables.events(s, d)
      val base = latestType(ev.filter(col("ts") < lit(cut)))
        .withColumnRenamed("et", "base_et")
      val upd = latestType(ev.filter(col("ts") >= lit(cut)))
        .withColumnRenamed("et", "upd_et")
      base.join(upd, Seq("user_id"), "full_outer")
        .select(
          when(col("base_et").isNull, "insert")
            .when(col("upd_et").isNull, "unchanged")
            .otherwise("update").as("action"),
          (col("base_et").isNotNull && col("upd_et").isNotNull &&
            col("base_et") =!= col("upd_et")).as("chg"))
        .groupBy(col("action"))
        .agg(count(lit(1)).as("n_users"),
          count(when(col("chg"), lit(1))).as("n_type_changed"))
        .orderBy(col("action"))
    },
    Some("""WITH b AS (SELECT user_id, event_type AS base_et FROM (
           |  SELECT user_id, event_type, row_number() OVER (
           |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           |  FROM events WHERE ts < TIMESTAMP '2024-01-15') WHERE rn = 1),
           |u AS (SELECT user_id, event_type AS upd_et FROM (
           |  SELECT user_id, event_type, row_number() OVER (
           |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           |  FROM events WHERE ts >= TIMESTAMP '2024-01-15') WHERE rn = 1),
           |m AS (SELECT CASE WHEN base_et IS NULL THEN 'insert'
           |    WHEN upd_et IS NULL THEN 'unchanged' ELSE 'update' END
           |    AS action,
           |  (base_et IS NOT NULL AND upd_et IS NOT NULL
           |    AND base_et <> upd_et) AS chg
           | FROM b FULL OUTER JOIN u USING (user_id))
           |SELECT action, count(*) AS n_users,
           | CAST(count(CASE WHEN chg THEN 1 END) AS BIGINT)
           |   AS n_type_changed
           |FROM m GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** Incremental view maintenance as a first-class contract: partial
    * aggregates computed on disjoint slices MERGE into exactly the
    * full-recompute result (count/sum in exact integer centi-units, max
    * on exact micros). This is the algebra that lets a 100 TB nightly
    * pipeline aggregate only the new partition and fold it into
    * yesterday's state; the oracle IS the full recompute, so the merge's
    * result-invariance is hash-verified, not assumed.
    */
  private val incMerge = Q(
    "inc_agg_merge",
    (s, d) => {
      val cut = "2024-01-15"
      val ev = Tables.events(s, d).select(col("user_id"),
        col("ts"), round(col("value") * 100).cast("long").as("c"))
      def slice(p: org.apache.spark.sql.Column) = ev.filter(p)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_centi"),
          max(expr("unix_micros(ts)")).as("last_us"))
      slice(col("ts") < lit(cut))
        .unionByName(slice(col("ts") >= lit(cut)))
        .groupBy(col("user_id"))
        .agg(sum(col("n")).as("n"), sum(col("sum_centi")).as("sum_centi"),
          max(col("last_us")).as("last_us"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, count(*) AS n,
           | CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
           |   AS sum_centi,
           | max(epoch_us(ts)) AS last_us
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Count-Min point estimates next to exact truth: one CMS pass over
    * the part keys (4×256 counters — the whole sketch is 8 KiB however
    * many keys stream through), estimates for the top-10 true heavy
    * hitters. The cell hash is the md5-60-bit uniform of "row:key"
    * ([[graft.functions.CountMinAgg.cellIdx]]), so the oracle REBUILDS
    * the entire sketch from raw rows in DuckDB — every counter, then
    * the min-over-rows estimate — sharing zero code with the engine.
    * CountMinSpec still pins the one-sided error, the ε·N bound, and
    * the exact sketch-merge identity that makes per-shard folding
    * possible.
    */
  private val cmsEstimates = Q(
    "a2_cms_point_estimates",
    (s, d) => {
      val depth = 4
      val width = 256
      val sk = Tables.lineitem(s, d)
        .select(col("l_partkey").cast("string").as("k"))
        .agg(graft.functions.CountMinAgg.sketch(col("k"), depth, width)
          .as("sk"))
        .first().getSeq[Long](0).toArray
      val estU = udf((k: String) =>
        graft.functions.CountMinAgg.estimate(sk, depth, width, k))
      Tables.lineitem(s, d).groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("true_n"))
        .orderBy(col("true_n").desc, col("l_partkey"))
        .limit(10)
        .withColumn("est_n", estU(col("l_partkey").cast("string")))
        .withColumn("overcount", col("est_n") - col("true_n"))
    },
    Some("""WITH keys AS (SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem),
           |cells AS (SELECT r.i AS row,
           |   ('0x' || substring(md5(r.i || ':' || k), 1, 15))::BIGINT % 256
           |     AS bucket,
           |   count(*) AS n
           |  FROM keys, range(4) r(i) GROUP BY 1, 2),
           |top AS (SELECT l_partkey, count(*) AS true_n FROM lineitem
           |  GROUP BY 1 ORDER BY true_n DESC, l_partkey LIMIT 10),
           |est AS (SELECT t.l_partkey, t.true_n, min(c.n) AS est_n
           |  FROM top t CROSS JOIN range(4) r(i)
           |  JOIN cells c ON c.row = r.i
           |   AND c.bucket = ('0x' || substring(md5(r.i || ':'
           |     || CAST(t.l_partkey AS VARCHAR)), 1, 15))::BIGINT % 256
           |  GROUP BY 1, 2)
           |SELECT l_partkey, true_n, CAST(est_n AS BIGINT) AS est_n,
           | CAST(est_n - true_n AS BIGINT) AS overcount
           |FROM est ORDER BY true_n DESC, l_partkey""".stripMargin))

  /** KMV set-overlap estimates between the click and purchase audiences:
    * one sketch per event_type (k=256, O(k) state each), then distinct /
    * union / intersection estimated from the two sketches ALONE — the
    * audience-overlap question a 100 TB warehouse answers without ever
    * shuffling user ids together (HLL unions; only KMV intersects).
    * Exact counterparts computed alongside so the row shows estimate vs
    * truth. The sketch is the md5-60-bit-uniform flavor
    * ([[graft.functions.KmvAgg.sketchMd5]]), so the oracle REBUILDS both
    * sketches in DuckDB (ORDER BY hash LIMIT k) and recomputes every
    * estimate with the identically-written double expression; estimates
    * are floored to BIGINT on both sides. KmvSpec still pins exactness
    * below k, the bit-exact merge identity, and the ~1/√k error band.
    */
  private val kmvOverlap = Q(
    "a4_kmv_set_overlap",
    (s, d) => {
      val k = 256
      val ev = Tables.events(s, d)
      def sketchOf(et: String): Array[Long] = ev
        .filter(col("event_type") === et)
        .select(col("user_id").cast("string").as("u"))
        .agg(graft.functions.KmvAgg.sketchMd5(col("u"), k).as("sk"))
        .first().getSeq[Long](0).toArray
      val (a, b) = (sketchOf("click"), sketchOf("purchase"))
      // null users excluded to match the sketch path (reduce skips null)
      // and the oracle's count(DISTINCT) null semantics
      val exact = ev.filter(col("event_type").isin("click", "purchase") &&
          col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "click", 1).otherwise(0)).as("c"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("p"))
        .agg(sum(col("c")).as("n_click"), sum(col("p")).as("n_purchase"),
          count(lit(1)).as("n_union"),
          sum(col("c") * col("p")).as("n_both"))
        .first()
      import graft.functions.KmvAgg._
      import s.implicits._
      Seq((
        exact.getLong(0), math.floor(estimateDistinctMd5(a, k)).toLong,
        exact.getLong(1), math.floor(estimateDistinctMd5(b, k)).toLong,
        exact.getLong(2), math.floor(estimateDistinctMd5(union(a, b, k), k)).toLong,
        exact.getLong(3), math.floor(estimateIntersectionMd5(a, b, k)).toLong))
        .toDF("click_exact", "click_est", "purchase_exact", "purchase_est",
          "union_exact", "union_est", "both_exact", "both_est")
    },
    Some("""WITH ah AS (SELECT DISTINCT
           |   ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
           |     ::BIGINT AS h
           |  FROM events WHERE event_type = 'click' AND user_id IS NOT NULL),
           |bh AS (SELECT DISTINCT
           |   ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
           |     ::BIGINT AS h
           |  FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL),
           |a AS (SELECT h FROM ah ORDER BY h LIMIT 256),
           |b AS (SELECT h FROM bh ORDER BY h LIMIT 256),
           |u AS (SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b) t
           |      ORDER BY h LIMIT 256),
           |es AS (SELECT
           |  (SELECT count(*) FROM a) AS na, (SELECT max(h) FROM a) AS ka,
           |  (SELECT count(*) FROM b) AS nb, (SELECT max(h) FROM b) AS kb,
           |  (SELECT count(*) FROM u) AS nu, (SELECT max(h) FROM u) AS ku,
           |  (SELECT count(*) FROM u
           |    WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b))
           |    AS shared),
           |ev AS (SELECT
           |  CASE WHEN na < 256 THEN CAST(na AS DOUBLE)
           |   ELSE (256 - 1) / (CAST(ka AS DOUBLE) / pow(2, 60)) END AS ea,
           |  CASE WHEN nb < 256 THEN CAST(nb AS DOUBLE)
           |   ELSE (256 - 1) / (CAST(kb AS DOUBLE) / pow(2, 60)) END AS eb,
           |  CASE WHEN nu < 256 THEN CAST(nu AS DOUBLE)
           |   ELSE (256 - 1) / (CAST(ku AS DOUBLE) / pow(2, 60)) END AS eu,
           |  CAST(shared AS DOUBLE) / nu AS jac
           |  FROM es),
           |ex AS (SELECT
           |  count(DISTINCT user_id) FILTER (event_type = 'click') AS n_click,
           |  count(DISTINCT user_id) FILTER (event_type = 'purchase')
           |    AS n_purchase,
           |  count(DISTINCT user_id) AS n_union,
           |  (SELECT count(*) FROM
           |    (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
           |     INTERSECT
           |     SELECT DISTINCT user_id FROM events
           |     WHERE event_type = 'purchase') t) AS n_both
           | FROM events WHERE event_type IN ('click', 'purchase'))
           |SELECT n_click AS click_exact,
           | CAST(floor(ea) AS BIGINT) AS click_est,
           | n_purchase AS purchase_exact,
           | CAST(floor(eb) AS BIGINT) AS purchase_est,
           | n_union AS union_exact,
           | CAST(floor(eu) AS BIGINT) AS union_est,
           | n_both AS both_exact,
           | CAST(floor(jac * eu) AS BIGINT) AS both_est
           |FROM ex, ev""".stripMargin))

  /** Bucketed table checksum — `dq_table_checksum`'s diff-LOCALIZING
    * companion: the same md5-XOR row fold, but per md5-derived bucket
    * (16 here; thousands at 100 TB), so when two table copies disagree
    * the mismatched bucket pins the divergence to 1/N of the keyspace
    * and only that slice is re-compared row-level. Order-independent by
    * construction (XOR fold), one scan, pure map-side partials; the
    * bucketing hash and the row hash are both md5-derived, so the oracle
    * reproduces every bucket bit-for-bit.
    */
  private val checksumBuckets = Q(
    "dq_checksum_buckets",
    (s, d) => {
      val rowKey = concat_ws("|", col("o_orderkey").cast("string"),
        col("o_custkey").cast("string"), col("o_orderstatus"),
        col("o_orderpriority"))
      Tables.orders(s, d)
        .select(
          (conv(substring(md5(col("o_orderkey").cast("string")), 1, 4), 16, 10)
            .cast("long") % 16).as("bucket"),
          conv(substring(md5(rowKey), 1, 15), 16, 10).cast("long").as("rh"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), bit_xor(col("rh")).as("fp"))
        .orderBy(col("bucket"))
    },
    Some("""SELECT
           | ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT
           |   % 16 AS bucket,
           | count(*) AS n,
           | bit_xor(('0x' || substring(md5(concat_ws('|',
           |   CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
           |   o_orderstatus, o_orderpriority)), 1, 15))::BIGINT) AS fp
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** Generated calendar dimension — the warehouse's standard conformed
    * dimension, built from nothing: one `sequence` over the date range,
    * one explode, pure date arithmetic. Day-of-week derives from epoch
    * days ((d+4) mod 7, Thursday-anchored) rather than each engine's
    * dayofweek builtin, whose numbering conventions differ; all other
    * fields are integer date parts. Generation is a single task until
    * the explode — at scale the range splits first.
    */
  private val calendarDim = Q(
    "gen_calendar_dim",
    (s, d) => s.range(1)
      .select(explode(sequence(
        lit("1995-01-01").cast("date"), lit("1996-12-31").cast("date")))
        .as("day"))
      .select(col("day"),
        year(col("day")).as("y"), quarter(col("day")).as("q"),
        month(col("day")).as("m"), dayofmonth(col("day")).as("dom"),
        (pmod(datediff(col("day"), lit("1970-01-01").cast("date")) + 4, lit(7)))
          .as("dow"),
        (floor(datediff(col("day"), lit("1995-01-01").cast("date")) / 7) + 1)
          .cast("long").as("week_no"))
      .orderBy(col("day")),
    Some("""SELECT CAST(gd AS DATE) AS day,
           | CAST(year(gd) AS INT) AS y, CAST(quarter(gd) AS INT) AS q,
           | CAST(month(gd) AS INT) AS m, CAST(day(gd) AS INT) AS dom,
           | CAST((date_diff('day', DATE '1970-01-01', CAST(gd AS DATE)) + 4) % 7
           |   AS INT) AS dow,
           | CAST(date_diff('day', DATE '1995-01-01', CAST(gd AS DATE)) // 7 + 1
           |   AS BIGINT) AS week_no
           |FROM (SELECT unnest(generate_series(DATE '1995-01-01',
           |  DATE '1996-12-31', INTERVAL 1 DAY)) AS gd)
           |ORDER BY 1""".stripMargin))

  /** JSON key-set profile of the event `props` payload — the
    * schema-drift audit for semi-structured columns: every distinct
    * sorted key set becomes one row with its frequency and how many of
    * its payloads parse the expected `k` field as a number. A pipeline
    * alerts when a new key-set row appears. Key sets are joined to one
    * string (arrays format differently across engines; strings hash
    * identically), sorted so key ORDER drift doesn't fragment groups.
    */
  private val jsonKeyProfile = Q(
    "dq_json_key_profile",
    (s, d) => Tables.events(s, d)
      .select(
        coalesce(array_join(sort_array(json_object_keys(col("props"))), ","),
          lit("<unparsed>")).as("key_set"),
        get_json_object(col("props"), "$.k").cast("long").as("kv"))
      .groupBy(col("key_set"))
      .agg(count(lit(1)).as("n"), count(col("kv")).as("n_numeric_k"))
      .orderBy(col("key_set")),
    Some("""SELECT coalesce(array_to_string(list_sort(json_keys(props)), ','),
           |  '<unparsed>') AS key_set,
           | count(*) AS n,
           | count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
           |   AS n_numeric_k
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Cross-column functional-dependency audit on `documents` — the
    * consistency class `dq_constraint_checks` (per-column domains) and
    * `dq_table_checksum` (content drift) don't cover: does the derived
    * column actually equal its derivation (n_chars = length(text)), is
    * the declared key unique, does the enum column match its format?
    * One scan, all checks ride the same partial aggregation; exact
    * violation counts both engines reproduce.
    */
  private val fdAudit = Q(
    "dq_functional_dependency",
    (s, d) => Tables.documents(s, d)
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
          .as("n_chars_mismatch"),
        (count(lit(1)) - countDistinct(col("doc_id"))).as("n_dup_keys"),
        sum(when(!col("lang").rlike("^[a-z]{2}$"), 1L).otherwise(0L))
          .as("n_bad_lang"),
        sum(when(col("text").isNull || col("source").isNull, 1L).otherwise(0L))
          .as("n_nulls")),
    Some("""SELECT count(*) AS n_rows,
           | CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
           |   AS BIGINT) AS n_chars_mismatch,
           | count(*) - count(DISTINCT doc_id) AS n_dup_keys,
           | CAST(sum(CASE WHEN NOT regexp_matches(lang, '^[a-z]{2}$')
           |   THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_lang,
           | CAST(sum(CASE WHEN text IS NULL OR source IS NULL THEN 1 ELSE 0 END)
           |   AS BIGINT) AS n_nulls
           |FROM documents""".stripMargin))

  /** Per-column profile DRIFT between two date halves of `orders` — the
    * column-level companion to `dq_distribution_drift`'s value-level
    * monitor: row counts, null counts, and exact distinct counts per
    * column per half, with the NDV ratio in integer basis points. One
    * scan: `stack` unpivots the audited columns to (colname, val) rows
    * (an explicit ×|cols| fan-out — the same work a multi-column
    * distinct would hide inside an Expand), then a single
    * (colname, half)-keyed aggregation carries ONE distinct each, and
    * the |cols|×2 result pivots via conditional max. Values compare as
    * strings (ints via cast, money via integer cents) so cross-engine
    * NDV is exact.
    */
  private val profileDrift = Q(
    "dq_profile_drift",
    (s, d) => Tables.orders(s, d)
      .select(
        when(col("o_orderdate") < lit("1997-01-01"), "a").otherwise("b")
          .as("half"),
        expr("""stack(4,
          | 'o_custkey', cast(o_custkey as string),
          | 'o_orderstatus', o_orderstatus,
          | 'o_orderpriority', o_orderpriority,
          | 'o_totalprice_c',
          |   cast(cast(round(o_totalprice * 100) as long) as string)
          |) as (colname, val)""".stripMargin))
      .groupBy(col("colname"), col("half"))
      .agg(count(lit(1)).as("n"), count(col("val")).as("nn"),
        countDistinct(col("val")).as("ndv"))
      .groupBy(col("colname"))
      .agg(max(when(col("half") === "a", col("n"))).as("n_a"),
        max(when(col("half") === "b", col("n"))).as("n_b"),
        max(when(col("half") === "a", col("n") - col("nn"))).as("nulls_a"),
        max(when(col("half") === "b", col("n") - col("nn"))).as("nulls_b"),
        max(when(col("half") === "a", col("ndv"))).as("ndv_a"),
        max(when(col("half") === "b", col("ndv"))).as("ndv_b"))
      .withColumn("ndv_ratio_bp", expr("ndv_b * 10000 div ndv_a"))
      .orderBy(col("colname")),
    Some("""WITH l AS (
           | SELECT CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
           |    THEN 'a' ELSE 'b' END AS half,
           |  'o_custkey' AS colname, CAST(o_custkey AS VARCHAR) AS val
           | FROM orders
           | UNION ALL
           | SELECT CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
           |    THEN 'a' ELSE 'b' END,
           |  'o_orderstatus', o_orderstatus FROM orders
           | UNION ALL
           | SELECT CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
           |    THEN 'a' ELSE 'b' END,
           |  'o_orderpriority', o_orderpriority FROM orders
           | UNION ALL
           | SELECT CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
           |    THEN 'a' ELSE 'b' END,
           |  'o_totalprice_c',
           |  CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
           | FROM orders),
           |g AS (SELECT colname, half, count(*) AS n, count(val) AS nn,
           |   count(DISTINCT val) AS ndv
           |  FROM l GROUP BY 1, 2)
           |SELECT colname,
           | max(CASE WHEN half = 'a' THEN n END) AS n_a,
           | max(CASE WHEN half = 'b' THEN n END) AS n_b,
           | max(CASE WHEN half = 'a' THEN n - nn END) AS nulls_a,
           | max(CASE WHEN half = 'b' THEN n - nn END) AS nulls_b,
           | max(CASE WHEN half = 'a' THEN ndv END) AS ndv_a,
           | max(CASE WHEN half = 'b' THEN ndv END) AS ndv_b,
           | max(CASE WHEN half = 'b' THEN ndv END) * 10000
           |   // max(CASE WHEN half = 'a' THEN ndv END) AS ndv_ratio_bp
           |FROM g GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Incremental JOIN maintenance — the delta-join identity every
    * incremental view engine rests on: with A = A₀∪ΔA, B = B₀∪ΔB,
    *   A⋈B = A₀⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈B₀ ∪ ΔA⋈ΔB,
    * so yesterday's materialized A₀⋈B₀ aggregate plus three
    * delta-bounded joins equals today's full recompute WITHOUT
    * rescanning the base-base pair. The three delta joins each carry a
    * delta on at least one side — broadcast-sized when the daily delta
    * is small, which is the whole economics of incremental maintenance
    * at 100 TB. Deltas here are the orderkey%10==9 slice (a ~10%
    * "new arrivals" batch); partial aggregates merge by summing (count
    * and integer cent·bp revenue are both commutative monoids). The
    * oracle is the FULL-recompute join in DuckDB — equality proves the
    * delta decomposition, not just the arithmetic.
    *
    * Determinism: revenue per row is ext_cents·(10000−disc_bp), exact
    * BIGINT cent-basis-point units (each factor rounds a 2-to-4-dp
    * double once), so partial-merge order cannot skew sums.
    */
  private val incJoinMerge = Q(
    "inc_join_merge",
    (s, d) => {
      val ord = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderpriority"), (col("o_orderkey") % 10 === 9).as("od"))
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(10000L) - round(col("l_discount") * 10000).cast("long")))
          .as("rev_cbp"),
        (col("l_orderkey") % 10 === 9).as("ld"))
      def part(oDelta: Boolean, lDelta: Boolean) =
        ord.filter(col("od") === oDelta)
          .join(li.filter(col("ld") === lDelta),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(col("rev_cbp")).as("rev_cbp"))
      // base⋈base is "yesterday's materialization"; the three
      // delta-bounded joins are today's increment; merge = re-aggregate
      part(false, false)
        .unionByName(part(false, true))
        .unionByName(part(true, false))
        .unionByName(part(true, true))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("n")).as("n"), sum(col("rev_cbp")).as("rev_cbp"))
        .orderBy(col("o_orderpriority"))
    },
    // full recompute — equality proves the delta-join decomposition
    Some("""SELECT o_orderpriority, count(*) AS n,
           | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           |   * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
           |   AS BIGINT) AS rev_cbp
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** RFM customer segmentation (recency / frequency / monetary — the
    * classic CRM value model): per customer, days since last order,
    * order count, and lifetime spend in cents; each metric quintiled
    * with EXACT SQL ntile semantics via [[graft.ops.GlobalOrder.ntileBy]]
    * — the two-phase range-bucketed global index, never an
    * unpartitioned window (three of them, here). Output is the bounded
    * ≤5³ segment grid with customer counts and spend — the shape a
    * marketing warehouse materializes nightly. Tile 1 = most recent /
    * most orders / highest spend (frequency and spend rank on the
    * NEGATED metric, custkey tiebreak everywhere).
    */
  private val rfm = Q(
    "rfm_customer_segments",
    (s, d) => {
      val perCust = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate").cast("date")).as("last_day"),
          count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("spend_centi"))
      val maxDay = perCust.agg(max(col("last_day")).as("gmax"))
      // staged: each ntileBy runs two ACTIONS (quantile sketch + bucket
      // counts) on its input — unstaged, the second and third tiles
      // re-plan the orders scan+aggregate per action (8 scans total)
      import graft.ops.Checkpoints.StageCheckpoint
      val base = perCust.crossJoin(broadcast(maxDay))
        .select(col("o_custkey"),
          datediff(col("gmax"), col("last_day")).cast("long").as("rec_days"),
          col("n_orders"), col("spend_centi"),
          (-col("n_orders")).as("neg_orders"),
          (-col("spend_centi")).as("neg_spend"))
        .stageCheckpoint()
      val tiled = {
        val t1 = graft.ops.GlobalOrder.ntileBy(base, "rec_days", "o_custkey", 5, "r_tile")
          .stageCheckpoint()
        val t2 = graft.ops.GlobalOrder.ntileBy(t1, "neg_orders", "o_custkey", 5, "f_tile")
          .stageCheckpoint()
        graft.ops.GlobalOrder.ntileBy(t2, "neg_spend", "o_custkey", 5, "m_tile")
      }
      tiled.groupBy(col("r_tile"), col("f_tile"), col("m_tile"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("spend_centi")).as("sum_spend_centi"))
        .orderBy(col("r_tile"), col("f_tile"), col("m_tile"))
    },
    Some("""WITH pc AS (SELECT o_custkey,
           |  max(CAST(o_orderdate AS DATE)) AS last_day,
           |  count(*) AS n_orders,
           |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           |    AS spend_centi
           | FROM orders GROUP BY 1),
           |g AS (SELECT max(last_day) AS gmax FROM pc),
           |b AS (SELECT o_custkey,
           |  CAST(date_diff('day', last_day, gmax) AS BIGINT) AS rec_days,
           |  n_orders, spend_centi FROM pc, g),
           |t AS (SELECT spend_centi,
           |  ntile(5) OVER (ORDER BY rec_days, o_custkey) AS r_tile,
           |  ntile(5) OVER (ORDER BY -n_orders, o_custkey) AS f_tile,
           |  ntile(5) OVER (ORDER BY -spend_centi, o_custkey) AS m_tile
           | FROM b)
           |SELECT r_tile, f_tile, m_tile, count(*) AS n_customers,
           | CAST(sum(spend_centi) AS BIGINT) AS sum_spend_centi
           |FROM t GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
    headline = true)

  /** k-anonymity / l-diversity privacy audit (Sweeney 2002; Machanavajjhala
    * 2007) — the release-gate check a data pipeline runs before shipping
    * any table containing quasi-identifiers: group rows into equivalence
    * classes on the QI tuple (here nation × market segment), report the
    * class-size (k) distribution with classes and row mass per band, the
    * re-identifiable row share (k < 5) in basis points, and each band's
    * minimum l-diversity over a sensitive attribute (account-balance
    * sign — the "does every class mix sensitive values" check; a class
    * with l=1 leaks the attribute even at high k). One QI aggregation
    * (map-side combined, |QI-space| rows) then a banded rollup —
    * |bands| output rows at any scale. All-integer outputs; the share
    * uses integer bp division on positive counts (`div` == `//`).
    */
  private val kAnonymity = Q(
    "dq_k_anonymity",
    (s, d) => {
      val classes = Tables.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("k"),
          count_distinct(when(col("c_acctbal") >= 0, 1).otherwise(0))
            .as("l_div"))
      val banded = classes
        .withColumn("k_band",
          when(col("k") <= 10, col("k")).otherwise(lit(11L)))
        .groupBy(col("k_band"))
        .agg(count(lit(1)).as("n_classes"), sum(col("k")).as("n_rows"),
          min(col("l_div")).as("min_l"))
      val total = classes.agg(sum(col("k")).as("n_total"),
        sum(when(col("k") < 5, col("k")).otherwise(0L)).as("n_risky"))
      banded.crossJoin(broadcast(total))
        .select(col("k_band"), col("n_classes"), col("n_rows"),
          col("min_l"),
          expr("(n_risky * 10000) div n_total").as("risky_bp"))
        .orderBy(col("k_band"))
    },
    Some("""WITH c AS (SELECT c_nationkey, c_mktsegment, count(*) AS k,
           |  count(DISTINCT CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END)
           |    AS l_div
           | FROM customer GROUP BY 1, 2),
           |b AS (SELECT CASE WHEN k <= 10 THEN k ELSE 11 END AS k_band,
           |  count(*) AS n_classes, CAST(sum(k) AS BIGINT) AS n_rows,
           |  min(l_div) AS min_l
           | FROM c GROUP BY 1),
           |t AS (SELECT CAST(sum(k) AS BIGINT) AS n_total,
           |  CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
           |    AS n_risky FROM c)
           |SELECT k_band, n_classes, n_rows, min_l,
           | (n_risky * 10000) // n_total AS risky_bp
           |FROM b, t ORDER BY 1""".stripMargin))

  /** CDC changelog APPLY with delete tombstones — the missing half of
    * `warehouse_upsert_merge` (which only upserts): the event stream
    * maps to an I/U/D changelog (error events are the tombstones), the
    * LAST operation per key wins in (ts, event_id) order via one
    * partial-aggregating max(struct) — no window — and keys whose final
    * op is a delete leave the dimension entirely. Output is the apply
    * audit: changelog op counts, live vs deleted key counts, and the
    * surviving dimension's exact value mass. This is the Debezium →
    * warehouse apply shape; at 100 TB the struct-max is the only
    * formulation that combines map-side.
    */
  private val cdcApply = Q(
    "warehouse_cdc_apply_deletes",
    (s, d) => {
      val log = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "error", lit("D")).otherwise(lit("U"))
            .as("op"),
          coalesce(round(col("value") * 100).cast("long"), lit(0L))
            .as("val_c"))
      val last = log.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_ops"),
          sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_deletes"),
          max(struct(expr("unix_micros(ts)").as("us"), col("event_id"),
            col("op"), col("val_c"))).as("m"))
      last.agg(
        count(lit(1)).as("n_keys"),
        sum(col("n_ops")).as("n_changelog_rows"),
        sum(col("n_deletes")).as("n_delete_ops"),
        sum(when(col("m.op") === "D", 1L).otherwise(0L)).as("n_dead_keys"),
        sum(when(col("m.op") =!= "D", 1L).otherwise(0L)).as("n_live_keys"),
        sum(when(col("m.op") =!= "D", col("m.val_c")).otherwise(0L))
          .as("live_value_c"))
    },
    Some("""WITH log AS (SELECT user_id, ts, event_id,
           |  CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
           |  COALESCE(CAST(round(value * 100) AS BIGINT), 0) AS val_c
           | FROM events),
           |lst AS (SELECT user_id, count(*) AS n_ops,
           |   CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
           |     AS n_deletes,
           |   max(CASE WHEN rn = 1 THEN op END) AS last_op,
           |   max(CASE WHEN rn = 1 THEN val_c END) AS last_val
           |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
           |     ORDER BY ts DESC, event_id DESC) AS rn FROM log)
           |  GROUP BY 1)
           |SELECT count(*) AS n_keys,
           | CAST(sum(n_ops) AS BIGINT) AS n_changelog_rows,
           | CAST(sum(n_deletes) AS BIGINT) AS n_delete_ops,
           | CAST(sum(CASE WHEN last_op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
           |   AS n_dead_keys,
           | CAST(sum(CASE WHEN last_op <> 'D' THEN 1 ELSE 0 END) AS BIGINT)
           |   AS n_live_keys,
           | CAST(sum(CASE WHEN last_op <> 'D' THEN last_val ELSE 0 END)
           |   AS BIGINT) AS live_value_c
           |FROM lst""".stripMargin))

  /** Ledger reconciliation — the finance-grade cross-table consistency
    * check `dq_constraint_checks` (row-level referential integrity)
    * cannot express: the order headers' monthly total vs the lineitem
    * detail rolled up to the same months, both through the exact
    * DECIMAL money path, with the divergence in integer basis points.
    * Sign is a separate column so the bp division stays on positive
    * integers (`div` and `//` agree only there). One fact-fact join on
    * the order key, two keyed aggregations; headers and detail NEVER
    * agree in TPC-H-shaped data (detail is discounted), which is
    * exactly what makes the drift column informative.
    */
  private val ledgerRecon = Q(
    "dq_ledger_reconciliation",
    (s, d) => {
      val dec = "decimal(12,2)"
      val o = Tables.orders(s, d)
        .select((year(col("o_orderdate")) * 100 +
          month(col("o_orderdate"))).as("ym"),
          col("o_orderkey"),
          round(col("o_totalprice") * 10000).cast("long").as("hc"))
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          (col("l_extendedprice").cast(dec) *
            (lit(1).cast(dec) - col("l_discount").cast(dec))).as("net4"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("net4")).as("onet4"))
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy(col("ym"))
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("onet4").isNull, 1L).otherwise(0L))
            .as("n_headerless_detail"),
          sum(col("hc")).as("header_e4"),
          coalesce((sum(col("onet4")) * 10000).cast("long"), lit(0L))
            .as("detail_e4"))
        .select(col("ym"), col("n_orders"), col("n_headerless_detail"),
          col("header_e4"), col("detail_e4"),
          when(col("detail_e4") >= col("header_e4"), 1L).otherwise(-1L)
            .as("drift_sign"),
          expr("(10000 * abs(detail_e4 - header_e4)) div header_e4")
            .as("drift_abs_bp"))
        .orderBy(col("ym"))
    },
    Some("""WITH o AS (SELECT year(o_orderdate) * 100 + month(o_orderdate)
           |   AS ym, o_orderkey,
           |   CAST(round(o_totalprice * 10000) AS BIGINT) AS hc
           |  FROM orders),
           |l AS (SELECT l_orderkey,
           |   sum(CAST(l_extendedprice AS DECIMAL(12,2))
           |     * (CAST(1 AS DECIMAL(12,2))
           |        - CAST(l_discount AS DECIMAL(12,2)))) AS onet4
           |  FROM lineitem GROUP BY 1),
           |j AS (SELECT ym, hc, onet4 FROM o
           |  LEFT JOIN l ON o_orderkey = l_orderkey),
           |g AS (SELECT ym, count(*) AS n_orders,
           |   CAST(sum(CASE WHEN onet4 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |     AS n_headerless_detail,
           |   CAST(sum(hc) AS BIGINT) AS header_e4,
           |   COALESCE(CAST(sum(onet4) * 10000 AS BIGINT), 0) AS detail_e4
           |  FROM j GROUP BY 1)
           |SELECT ym, n_orders, n_headerless_detail, header_e4, detail_e4,
           | CASE WHEN detail_e4 >= header_e4 THEN 1 ELSE -1 END AS drift_sign,
           | (10000 * abs(detail_e4 - header_e4)) // header_e4 AS drift_abs_bp
           |FROM g ORDER BY 1""".stripMargin))

  /** Open-order BACKLOG over time — the event-sourced inventory shape:
    * an order is open from its placement month until the month its
    * last lineitem ships, and the backlog at each month-end is the
    * count (and exact cents value) of open orders. Computed the
    * interval-sweep way: every order contributes a +1 delta at its
    * start month and a −1 after its end month, the deltas reduce to
    * the |months|-bounded frame, and one bounded prefix sum yields the
    * whole backlog curve — never a per-month re-scan of the fact join
    * (the O(months·orders) trap). Orders with no lineitems never open.
    */
  private val backlog = Q(
    "warehouse_open_order_backlog",
    (s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .as("ym0"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val ship = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("maxship"))
        .select(col("l_orderkey"),
          (year(col("maxship")) * 100 + month(col("maxship"))).as("ym1"))
      val iv = o.join(ship, col("o_orderkey") === col("l_orderkey"))
        .select(col("ym0"), col("ym1"), col("cents"))
      // +1 at ym0, -1 at the month AFTER ym1 (month arithmetic in
      // ym-integer space: December rolls to January)
      val after = expr(
        "CASE WHEN ym1 % 100 = 12 THEN (ym1 div 100 + 1) * 100 + 1" +
          " ELSE ym1 + 1 END")
      val deltas = iv.select(col("ym0").as("ym"), lit(1L).as("dn"),
          col("cents").as("dc"))
        .unionByName(iv.select(after.as("ym"), lit(-1L).as("dn"),
          (-col("cents")).as("dc")))
        .groupBy(col("ym"))
        .agg(sum(col("dn")).as("dn"), sum(col("dc")).as("dc"))
      val wc = Window.orderBy(col("ym"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas
        .withColumn("open_orders", sum(col("dn")).over(wc))
        .withColumn("open_value_c", sum(col("dc")).over(wc))
        .select(col("ym"), col("open_orders"), col("open_value_c"))
        .orderBy(col("ym"))
    },
    Some("""WITH o AS (SELECT o_orderkey,
           |   year(o_orderdate) * 100 + month(o_orderdate) AS ym0,
           |   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           |  FROM orders),
           |sh AS (SELECT l_orderkey,
           |   year(max(l_shipdate)) * 100 + month(max(l_shipdate)) AS ym1
           |  FROM lineitem GROUP BY 1),
           |iv AS (SELECT ym0, ym1, cents FROM o
           |  JOIN sh ON o_orderkey = l_orderkey),
           |dl AS (SELECT ym0 AS ym, 1 AS dn, cents AS dc FROM iv
           | UNION ALL
           | SELECT CASE WHEN ym1 % 100 = 12 THEN (ym1 // 100 + 1) * 100 + 1
           |   ELSE ym1 + 1 END, -1, -cents FROM iv),
           |g AS (SELECT ym, CAST(sum(dn) AS BIGINT) AS dn,
           |   CAST(sum(dc) AS BIGINT) AS dc
           |  FROM dl GROUP BY 1)
           |SELECT ym,
           | CAST(sum(dn) OVER (ORDER BY ym ROWS BETWEEN UNBOUNDED
           |   PRECEDING AND CURRENT ROW) AS BIGINT) AS open_orders,
           | CAST(sum(dc) OVER (ORDER BY ym ROWS BETWEEN UNBOUNDED
           |   PRECEDING AND CURRENT ROW) AS BIGINT) AS open_value_c
           |FROM g ORDER BY ym""".stripMargin))

  /** Duplicate-payment screen — the double-charge audit every billing
    * pipeline runs: purchase pairs by the SAME user for the IDENTICAL
    * cent amount within 5 minutes. The self-join is keyed on
    * (user, cents) — the natural blocking key, so candidate fan-out is
    * bounded by per-user-per-amount multiplicity, never a time-window
    * cross product — with the id-ordered pair convention and the time
    * bound checked on truncated seconds. Output is the 1-row audit:
    * pair count, distinct later-events flagged (what a refund job
    * would act on), users affected, and the flagged value mass.
    */
  private val dupPayments = Q(
    "dq_duplicate_payments",
    (s, d) => {
      val p = Tables.events(s, d)
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("es"),
          round(col("value") * 100).cast("long").as("cents"))
      val a = p.select(col("user_id"), col("cents"),
        col("event_id").as("id_a"), col("es").as("es_a"))
      val b = p.select(col("user_id"), col("cents"),
        col("event_id").as("id_b"), col("es").as("es_b"))
      a.join(b, Seq("user_id", "cents"))
        .filter(col("id_a") < col("id_b") &&
          abs(col("es_b") - col("es_a")) <= 300L)
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("id_b")).as("n_flagged_events"),
          countDistinct(col("user_id")).as("n_users"),
          coalesce(sum(col("cents")), lit(0L)).as("flagged_value_c"))
    },
    Some("""WITH p AS (SELECT user_id, event_id,
           |   epoch(date_trunc('second', ts))::BIGINT AS es,
           |   CAST(round(value * 100) AS BIGINT) AS cents
           |  FROM events WHERE event_type = 'purchase'
           |   AND value IS NOT NULL),
           |j AS (SELECT a.user_id, a.cents, b.event_id AS id_b
           |  FROM p a JOIN p b ON a.user_id = b.user_id
           |   AND a.cents = b.cents AND a.event_id < b.event_id
           |   AND abs(b.es - a.es) <= 300)
           |SELECT count(*) AS n_pairs,
           | count(DISTINCT id_b) AS n_flagged_events,
           | count(DISTINCT user_id) AS n_users,
           | COALESCE(CAST(sum(cents) AS BIGINT), 0) AS flagged_value_c
           |FROM j""".stripMargin))

  /** Gaps-and-islands over a filtered key sequence — the classic
    * warehouse audit shape ("which contiguous id ranges satisfy the
    * predicate", here fully-shipped orders): island id = key − rank,
    * constant within each maximal consecutive run. The textbook SQL
    * uses `row_number()` over the WHOLE table — a single-partition sort
    * at scale — so the rank here is
    * [[graft.ops.GlobalOrder.indexBy]]'s exact distributed global index
    * (range-bucketed two-phase, centroid-sized driver state); keys are
    * unique so (key − idx) islands are exact. Output: the top-10
    * longest islands plus the island count and covered-row total
    * cross-joined on (bounded frames throughout — the island aggregate
    * is one keyed groupBy on the island id).
    */
  private val idIslands = Q(
    "dq_id_gaps_islands",
    (s, d) => {
      import graft.ops.Checkpoints.StageCheckpoint
      val base = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      val idx = graft.ops.GlobalOrder
        .indexBy(base, "o_orderkey", "o_orderkey", out = "idx")
      val islands = idx
        .groupBy((col("o_orderkey") - col("idx")).as("isl"))
        .agg(count(lit(1)).as("len"), min(col("o_orderkey")).as("start_key"),
          max(col("o_orderkey")).as("end_key"))
        .stageCheckpoint()
      val summary = islands.agg(count(lit(1)).as("n_islands"),
        sum(col("len")).as("n_rows"))
      islands
        .orderBy(col("len").desc, col("start_key"))
        .limit(10)
        .drop("isl")
        .crossJoin(broadcast(summary))
        .orderBy(col("len").desc, col("start_key"))
    },
    Some("""WITH b AS (SELECT o_orderkey FROM orders
           |  WHERE o_orderstatus = 'F'),
           |r AS (SELECT o_orderkey,
           |  o_orderkey - (row_number() OVER (ORDER BY o_orderkey) - 1)
           |    AS isl FROM b),
           |i AS (SELECT isl, count(*) AS len, min(o_orderkey) AS start_key,
           |   max(o_orderkey) AS end_key
           |  FROM r GROUP BY 1),
           |s AS (SELECT count(*) AS n_islands,
           |  CAST(sum(len) AS BIGINT) AS n_rows FROM i),
           |top AS (SELECT len, start_key, end_key FROM i
           |  ORDER BY len DESC, start_key LIMIT 10)
           |SELECT len, start_key, end_key, n_islands, n_rows
           |FROM top CROSS JOIN s
           |ORDER BY len DESC, start_key""".stripMargin))

  override def qs: Seq[Q] =
    Seq(upsertMerge, incMerge, cmsEstimates, kmvOverlap, checksumBuckets,
      calendarDim, jsonKeyProfile, fdAudit, profileDrift, incJoinMerge,
      rfm, kAnonymity, cdcApply, ledgerRecon, backlog, dupPayments,
      idIslands)
}
