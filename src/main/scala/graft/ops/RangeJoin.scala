package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyless point-in-interval join, the shape Spark has no native operator
  * for: `points p JOIN intervals i ON p.ts BETWEEN i.start AND i.end`
  * with NO equi key plans as BroadcastNestedLoopJoin — fine while the
  * interval side broadcasts, a cross-product disaster the day it doesn't
  * (campaign windows, incident periods, maintenance blackouts at
  * warehouse scale).
  *
  * The fix is the classic binning reduction to an equi join: pick a time
  * grain g, explode each interval to every g-bucket it overlaps, map each
  * point to its single bucket, hash-join on bucket, then re-check the
  * exact range as a residual. A (point, interval) pair can only meet in
  * the point's one bucket, so the reduction produces no duplicates by
  * construction — no post-join dedup pass.
  *
  * Scale properties: the join is a plain shuffled (or AQE-broadcast)
  * equi join keyed by bucket; interval blow-up is `len/g + 1` rows per
  * interval, so g trades shuffle width (small g → more interval copies)
  * against residual selectivity (big g → more false candidate pairs).
  * Set g near the median interval length; skewed hot buckets are ordinary
  * aggregation skew afterwards (salt or AQE), not a cross-product.
  */
object RangeJoin {

  /** @param points    frame with a timestamp column `ptTs`
    * @param intervals frame with timestamp columns `ivStart`/`ivEnd`
    *                  (inclusive bounds) — all other columns carried
    * @param grainSec  bucket width in seconds
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptTs: String, ivStart: String, ivEnd: String,
      grainSec: Long): DataFrame = {
    def bucketOf(c: Column): Column =
      floor(unix_micros(c) / (grainSec * 1000000L))
    val binnedIv = intervals.withColumn("iv_bucket",
      explode(sequence(bucketOf(col(ivStart)), bucketOf(col(ivEnd)))))
    val binnedPt = points.withColumn("pt_bucket", bucketOf(col(ptTs)))
    binnedPt.join(binnedIv, col("pt_bucket") === col("iv_bucket") &&
        col(ptTs) >= col(ivStart) && col(ptTs) <= col(ivEnd))
      .drop("pt_bucket", "iv_bucket")
  }
}
