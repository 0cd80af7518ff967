package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * Implemented by composition (preference (a) of the build rules) as the
  * classic union-sort trick rather than a row-exploding range join:
  * tag both sides, union on (key, ts), and carry the most recent right-side
  * payload forward with `last(_, ignoreNulls)` over a running window.
  *
  * Cost at scale: ONE shuffle of (|L|+|R|) rows hash-partitioned by `key`
  * plus a per-partition sort — identical movement to a sort-merge equi-join,
  * independent of time-range density (a naive `l.ts >= r.ts` range join is
  * O(|L|·|R|) within key groups and explodes on hot keys).
  */
object AsOfJoin {

  /** Left as-of backward join: for each left row, the latest right row with
    * the same `key` and `right.ts <= left.ts` (inclusive). Right payload
    * columns are appended to the left row (null when no match).
    *
    * @param tiebreak right-side column ordering simultaneous right rows;
    *                 the greatest wins — keeps the result deterministic.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String],
      tiebreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(col).toIndexedSeq: _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val leftStructT = left.select(struct(leftCols.map(col).toIndexedSeq: _*)).schema.head.dataType
    // Tiebreak stays in its NATIVE type: casting to double would null out
    // string tiebreakers and lose precision for longs above 2^53, silently
    // breaking the documented "greatest wins" determinism.
    val tiebreakType = right.select(col(tiebreak)).schema.head.dataType

    // _side 0 (right) sorts before _side 1 (left) at equal ts ⇒ inclusive.
    val lU = left.select(
      col(key).as("_k"), col(ts).as("_t"), lit(1).as("_side"),
      lit(null).cast(tiebreakType).as("_tb"),
      struct(leftCols.map(col).toIndexedSeq: _*).as("_l"),
      lit(null).cast(payloadType).as("_r"))
    val rU = right.select(
      col(key).as("_k"), col(ts).as("_t"), lit(0).as("_side"),
      col(tiebreak).as("_tb"),
      lit(null).cast(leftStructT).as("_l"),
      payloadStruct.as("_r"))

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"), col("_tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lU.unionByName(rU)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++
        payload.map(c => col(s"_match.$c").as(c)): _*)
  }

  /** Skew-resistant variant: identical semantics to [[backward]], but a
    * hot key no longer serializes through a single window partition.
    *
    * Two passes over time buckets of `bucketWidth` seconds:
    *  1. HEAVY, parallel: the union-sort window runs per (key, bucket) —
    *     a hot key's rows spread across its buckets, so the maximum
    *     sequential run is one bucket, not one user-lifetime.
    *  2. LIGHT: one row per (key, bucket) — each bucket's latest right
    *     payload — gets a running `last` over buckets (thousands of rows
    *     per key at most), producing the carry-in each bucket inherits
    *     from its past.
    *  A left row's match = its within-bucket match, else its bucket's
    *  carry-in.
    *
    * Equivalence with [[backward]] is asserted in AsOfJoinSpec.
    */
  def backwardBucketed(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String],
      tiebreak: String,
      bucketWidth: Long = 3600L): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(col).toIndexedSeq: _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val leftStructT = left.select(struct(leftCols.map(col).toIndexedSeq: _*)).schema.head.dataType
    val tiebreakType = right.select(col(tiebreak)).schema.head.dataType

    def bucketOf(c: Column) = floor(c.cast("timestamp").cast("double") / bucketWidth)

    val lU = left.select(
      col(key).as("_k"), bucketOf(col(ts)).as("_b"), col(ts).as("_t"),
      lit(1).as("_side"), lit(null).cast(tiebreakType).as("_tb"),
      struct(leftCols.map(col).toIndexedSeq: _*).as("_l"),
      lit(null).cast(payloadType).as("_r"))
    val rU = right.select(
      col(key).as("_k"), bucketOf(col(ts)).as("_b"), col(ts).as("_t"),
      lit(0).as("_side"), col(tiebreak).as("_tb"),
      lit(null).cast(leftStructT).as("_l"),
      payloadStruct.as("_r"))

    // pass 1: within-(key, bucket) running match — hot keys parallelize
    val wInner = Window.partitionBy(col("_k"), col("_b"))
      .orderBy(col("_t"), col("_side"), col("_tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inner = lU.unionByName(rU)
      .withColumn("_match_in", last(col("_r"), ignoreNulls = true).over(wInner))

    // pass 2: per-(key, bucket) summary → running carry-in over buckets.
    // |summary| = #non-empty buckets per key — bounded, never row-scale.
    val summaries = inner
      .groupBy(col("_k"), col("_b"))
      .agg(max_by(col("_r"), when(col("_r").isNotNull,
        struct(col("_t"), col("_tb")))).as("_last_r"))
    val wCarry = Window.partitionBy(col("_k")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = summaries.withColumn("_carry",
      last(col("_last_r"), ignoreNulls = true).over(wCarry))
      .select(col("_k"), col("_b"), col("_carry"))

    inner.filter(col("_side") === 1)
      .join(carries, Seq("_k", "_b"), "left")
      .withColumn("_match", coalesce(col("_match_in"), col("_carry")))
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++
        payload.map(c => col(s"_match.$c").as(c)): _*)
  }
}
