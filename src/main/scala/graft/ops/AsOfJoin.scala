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
  *
  * NULL semantics (shared by both variants, pinned in AsOfJoinSpec):
  * NULL join keys never match (SQL equality — right rows with a NULL key
  * are dropped, left rows with one emit a null payload), and a NULL
  * tiebreak LOSES to any non-null tiebreak at the same timestamp (sorts
  * first; struct comparison in the bucketed summary orders NULL smallest,
  * so both code paths agree).
  */
object AsOfJoin {

  /** The tagged-union frames both variants sort: left rows (side 1) and
    * right rows (side 0) on a shared (_k, _t, _side, _tb, _l, _r) shape,
    * plus the optional _b time bucket. One prep, two consumers — the two
    * variants MUST stay column-for-column identical or they drift.
    */
  private def taggedUnion(left: DataFrame, right: DataFrame, key: String,
      ts: String, payload: Seq[String], tiebreak: String,
      bucketWidth: Option[Long]): (DataFrame, Seq[String]) = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(col).toIndexedSeq: _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val leftStructT =
      left.select(struct(leftCols.map(col).toIndexedSeq: _*)).schema.head.dataType
    // Tiebreak stays in its NATIVE type: casting to double would null out
    // string tiebreakers and lose precision for longs above 2^53, silently
    // breaking the documented "greatest wins" determinism.
    val tiebreakType = right.select(col(tiebreak)).schema.head.dataType

    def bucketOf(c: Column) =
      bucketWidth.map(w => floor(c.cast("timestamp").cast("double") / w))
        .getOrElse(lit(0L))

    // _side 0 (right) sorts before _side 1 (left) at equal ts ⇒ inclusive.
    val lU = left.select(
      col(key).as("_k"), bucketOf(col(ts)).as("_b"), col(ts).as("_t"),
      lit(1).as("_side"), lit(null).cast(tiebreakType).as("_tb"),
      struct(leftCols.map(col).toIndexedSeq: _*).as("_l"),
      lit(null).cast(payloadType).as("_r"))
    // NULL-key right rows can never equi-match a left row — and the
    // window partition would otherwise group them with NULL-key LEFT
    // rows while the bucketed carry join would not: drop them once here
    val rU = right.filter(col(key).isNotNull).select(
      col(key).as("_k"), bucketOf(col(ts)).as("_b"), col(ts).as("_t"),
      lit(0).as("_side"), col(tiebreak).as("_tb"),
      lit(null).cast(leftStructT).as("_l"),
      payloadStruct.as("_r"))
    (lU.unionByName(rU), leftCols)
  }

  private def project(df: DataFrame, leftCols: Seq[String],
      payload: Seq[String]): DataFrame =
    df.select(leftCols.map(c => col(s"_l.$c").as(c)) ++
      payload.map(c => col(s"_match.$c").as(c)): _*)

  /** Left as-of backward join: for each left row, the latest right row with
    * the same `key` and `right.ts <= left.ts` (inclusive). Right payload
    * columns are appended to the left row (null when no match).
    *
    * @param tiebreak right-side column ordering simultaneous right rows;
    *                 the greatest wins (NULL loses) — keeps the result
    *                 deterministic.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String],
      tiebreak: String): DataFrame = {
    val (u, leftCols) =
      taggedUnion(left, right, key, ts, payload, tiebreak, None)
    // nulls FIRST: a NULL tiebreak must lose to any non-null one under
    // last(), matching the bucketed summary's struct comparison
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"), col("_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    project(
      u.withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
        .filter(col("_side") === 1),
      leftCols, payload)
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
    val (u, leftCols) =
      taggedUnion(left, right, key, ts, payload, tiebreak, Some(bucketWidth))

    // pass 1: within-(key, bucket) running match — hot keys parallelize.
    // Staged: BOTH the summaries branch and the final filter consume it,
    // and without the boundary the union-sort-window (the operator's
    // dominant cost) plans and runs twice.
    val wInner = Window.partitionBy(col("_k"), col("_b"))
      .orderBy(col("_t"), col("_side"), col("_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inner = graft.ops.Checkpoints.stage(
      u.withColumn("_match_in", last(col("_r"), ignoreNulls = true).over(wInner)))

    // pass 2: per-(key, bucket) summary → running carry-in over buckets.
    // |summary| = #non-empty buckets per key — bounded, never row-scale.
    // max_by's struct comparison orders a NULL _tb smallest — the same
    // "NULL tiebreak loses" rule as the window's asc_nulls_first.
    val summaries = inner
      .groupBy(col("_k"), col("_b"))
      .agg(max_by(col("_r"), when(col("_r").isNotNull,
        struct(col("_t"), col("_tb")))).as("_last_r"))
    val wCarry = Window.partitionBy(col("_k")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = summaries.withColumn("_carry",
      last(col("_last_r"), ignoreNulls = true).over(wCarry))
      .select(col("_k"), col("_b"), col("_carry"))

    project(
      inner.filter(col("_side") === 1)
        .join(carries, Seq("_k", "_b"), "left")
        .withColumn("_match", coalesce(col("_match_in"), col("_carry"))),
      leftCols, payload)
  }
}
