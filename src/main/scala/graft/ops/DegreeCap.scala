package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hub cap for wedge-expansion operators (common-neighbor Jaccard,
  * triangle-ish joins keyed on a shared mid node): wedge work is
  * Σ d(mid)² over the mid nodes, so the handful of promiscuous hubs in
  * any power-law graph dominates the ENTIRE cost — the p99.9+ hub in a
  * co-purchase graph is "everyone shops there", which carries no
  * similarity signal yet contributes quadratically many candidate
  * pairs. The standard recommender move caps the wedge mids at a high
  * degree quantile: EXACT below the cap (the mass of the graph),
  * dropped above it.
  *
  * The cap itself must stay cheap and deterministic at 100 TB, so it is
  * an ORDER STATISTIC computed from the degree HISTOGRAM: one keyed
  * count (degree per mid), one tiny aggregation to (degree → #mids) —
  * a frame bounded by the number of DISTINCT degree values, not by the
  * node count — a running sum over that tiny frame, and
  * cap = min{ deg : cum ≥ ⌈(num/den)·n⌉ }. The quantile is a RATIONAL
  * (999/1000), so the rank threshold is pure integer arithmetic
  * (⌈a/b⌉ = (a + b − 1) div b) — no float ever enters the cap, and the
  * identical CTE chain runs in the DuckDB oracle. No sort of the node
  * set, no driver collect.
  */
object DegreeCap {

  /** Mids whose degree is ≤ the (num/den)-order-statistic cap. `e` is
    * the edge list (one row per distinct (mid, other) pair), `midCol`
    * the wedge mid key. Returns a one-column frame of kept mid keys for
    * a semi-join. num/den = 999/1000 keeps ≥ 99.9% of mids exact.
    */
  def keptMids(e: DataFrame, midCol: String,
      num: Long = 999L, den: Long = 1000L): DataFrame = {
    val dc = e.groupBy(col(midCol)).agg(count(lit(1)).as("dcap_deg"))
    val hist = dc.groupBy(col("dcap_deg")).agg(count(lit(1)).as("dcap_n"))
    // unpartitioned window over the DISTINCT-DEGREE histogram — a frame
    // bounded by |{distinct degrees}| (≤ max degree), never node count
    val cum = hist.withColumn("dcap_cum",
      sum(col("dcap_n")).over(Window.orderBy(col("dcap_deg"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = hist.agg(sum(col("dcap_n")).as("dcap_tot"))
    val cap = cum.crossJoin(broadcast(tot))
      .filter(col("dcap_cum") >=
        expr(s"($num * dcap_tot + ${den - 1}) div $den"))
      .agg(min(col("dcap_deg")).as("dcap_cap"))
    dc.crossJoin(broadcast(cap))
      .filter(col("dcap_deg") <= col("dcap_cap"))
      .select(col(midCol))
  }

  /** The shared DuckDB CTE chain for the same cap: given an edge CTE
    * named `eName` with mid column `midCol`, emits CTEs ending in
    * `<prefix>keep(midCol)` — the oracle mirror of [[keptMids]].
    */
  def keptMidsSql(eName: String, midCol: String,
      num: Long = 999L, den: Long = 1000L,
      prefix: String = "dc"): String =
    s"""${prefix}d AS (SELECT $midCol, count(*) AS dcg
       |  FROM $eName GROUP BY 1),
       |${prefix}h AS (SELECT dcg, count(*) AS hn FROM ${prefix}d
       |  GROUP BY 1),
       |${prefix}c AS (SELECT dcg, CAST(sum(hn) OVER (ORDER BY dcg)
       |    AS BIGINT) AS cum,
       |   (SELECT count(*) FROM ${prefix}d) AS tot
       |  FROM ${prefix}h),
       |${prefix}cap AS (SELECT min(dcg) AS cap FROM ${prefix}c
       |  WHERE cum >= ($num * tot + ${den - 1}) // $den),
       |${prefix}keep AS (SELECT $midCol FROM ${prefix}d, ${prefix}cap
       |  WHERE dcg <= cap)""".stripMargin
}
