package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Per-key ordered scans with NONLINEAR state — the recurrence class
  * (`bal' = max(floor, bal + delta)`) that no window frame can express:
  * a clamped running balance depends on every prior clamp, so unlike a
  * plain cumulative sum it cannot be rewritten as an aggregate over a
  * frame. This is the one operator family where dropping below the
  * DataFrame algebra is the *right* call, and the implementation is the
  * scalable idiom for it: hash-repartition by key, sort WITHIN each
  * partition by (key, time, id) — Spark's secondary-sort, one shuffle,
  * no global ordering — then a single `mapPartitions` pass holding O(1)
  * state per key with key-change detection. At 100 TB the cost is one
  * shuffle of the fact table and a streaming scan per partition; skew
  * is bounded by the largest single key's row count, same as any
  * keyed aggregation.
  *
  * All arithmetic is integer centi-units so the DuckDB recursive-CTE
  * oracle can replay the identical trajectory bit-for-bit.
  */
object StatefulScan {

  /** (user, final/peak balance, floor-hit count) after replaying the
    * user's events in (ts, event_id) order: credits add `round(value *
    * 100)` cents, debits (the purchase type) subtract it, and the
    * balance clamps at zero — every clamp counts as a floor hit.
    */
  def cappedBalance(events: DataFrame, debitType: String = "purchase"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val delta = (round(col("value") * 100).cast("long") *
      when(col("event_type") === debitType, lit(-1L)).otherwise(lit(1L)))
    val prepared: Dataset[(Long, Long, Long, Long)] = events
      // null value = no delta: same skip rule as ewma/holt (a null would
      // otherwise crash the non-nullable tuple decode)
      .filter(col("value").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), delta.as("delta_c"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("us"), col("event_id"))
      .as[(Long, Long, Long, Long)]
    prepared.mapPartitions { rows =>
      // one (user, bal, peak, hits) register; emit on key change / end.
      // The iterator arrives user-contiguous and time-ordered by the
      // sortWithinPartitions above, so this is a single forward pass.
      new Iterator[(Long, Long, Long, Long)] {
        private var pending: Option[(Long, Long, Long, Long)] = None
        private var cur = Option.empty[Long]
        private var bal, peak, hits = 0L
        private def roll(): Unit = {
          while (pending.isEmpty && rows.hasNext) {
            val (u, _, _, d) = rows.next()
            if (cur.exists(_ != u)) {
              pending = Some((cur.get, bal, peak, hits))
              bal = 0L; peak = 0L; hits = 0L
            }
            cur = Some(u)
            val raw = bal + d
            if (raw < 0L) { bal = 0L; hits += 1 } else bal = raw
            if (bal > peak) peak = bal
          }
          if (pending.isEmpty && rows.isEmpty && cur.nonEmpty) {
            pending = Some((cur.get, bal, peak, hits))
            cur = None
          }
        }
        override def hasNext: Boolean = { roll(); pending.nonEmpty }
        override def next(): (Long, Long, Long, Long) = {
          roll(); val r = pending.get; pending = None; r
        }
      }
    }.toDF("user_id", "final_balance_c", "peak_balance_c", "floor_hits")
  }

  /** Registered-query wrapper: deterministic user order. */
  def cappedBalanceQuery(s: SparkSession, dir: String): DataFrame =
    cappedBalance(graft.Tables.events(s, dir)).orderBy(col("user_id"))

  /** Per-user integer EWMA (α = 1/4) with max pre-update deviation —
    * the SMOOTHING recurrence `e' = e + trunc((x − e)/4)` is nonlinear
    * under integer truncation (each step's rounding depends on the
    * whole prior trajectory), so like the clamped balance it cannot be
    * a window frame. Truncating division toward zero (Scala `/`) is
    * mirrored in the oracle as `trunc((x−e)/4.0)` — quarters are exact
    * in FP, so both engines replay identical integer trajectories.
    * The deviation |x − e_prev| is the online anomaly signal (how far
    * each event sat from its forecast).
    */
  def ewmaSmooth(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val prepared: Dataset[(Long, Long, Long, Long)] = events
      .filter(col("value").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), round(col("value") * 100).cast("long").as("x"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("us"), col("event_id"))
      .as[(Long, Long, Long, Long)]
    prepared.mapPartitions { rows =>
      new Iterator[(Long, Long, Long, Long)] {
        private var pending: Option[(Long, Long, Long, Long)] = None
        private var cur = Option.empty[Long]
        private var e, maxDev, n = 0L
        private def roll(): Unit = {
          while (pending.isEmpty && rows.hasNext) {
            val (u, _, _, x) = rows.next()
            if (cur.exists(_ != u)) {
              pending = Some((cur.get, e, maxDev, n))
              e = 0L; maxDev = 0L; n = 0L
            }
            if (cur.isEmpty || cur.get != u) { cur = Some(u); e = x; n = 1L }
            else {
              val dev = math.abs(x - e)
              if (dev > maxDev) maxDev = dev
              e = e + (x - e) / 4
              n += 1
            }
          }
          if (pending.isEmpty && rows.isEmpty && cur.nonEmpty) {
            pending = Some((cur.get, e, maxDev, n))
            cur = None
          }
        }
        override def hasNext: Boolean = { roll(); pending.nonEmpty }
        override def next(): (Long, Long, Long, Long) = {
          roll(); val r = pending.get; pending = None; r
        }
      }
    }.toDF("user_id", "ewma_c", "max_dev_c", "n_events")
  }

  def ewmaQuery(s: SparkSession, dir: String): DataFrame =
    ewmaSmooth(graft.Tables.events(s, dir)).orderBy(col("user_id"))

  /** Holt linear (double-exponential) smoothing per user — the third
    * member of the nonlinear-recurrence family: TWO coupled state
    * registers (level, trend), which no window frame and no single
    * prefix-scan can express. Integer centi-units with truncating
    * division (α = 1/2 on the forecast error, β = 1/4 on the trend
    * error; Scala Long `/` truncates toward zero, mirrored by
    * `trunc(x / 2.0)` in the oracle's recursive CTE):
    *
    *   f      = l + b                        (one-step forecast)
    *   l'     = f + (x − f) / 2
    *   b'     = b + (l' − l − b) / 4
    *
    * Init: l₁ = x₁, b₁ = 0. Emits per user: final level, final trend,
    * next-step forecast l+b, max |forecast error|, event count. Same
    * secondary-sort single-pass shape as [[cappedBalance]]: repartition
    * by user, sortWithinPartitions by (user, ts, event_id), O(1) state
    * per key.
    */
  def holtSmooth(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val prepared: Dataset[(Long, Long, Long, Long)] = events
      .filter(col("value").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), round(col("value") * 100).cast("long").as("x"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("us"), col("event_id"))
      .as[(Long, Long, Long, Long)]
    prepared.mapPartitions { rows =>
      new Iterator[(Long, Long, Long, Long, Long)] {
        private var pending: Option[(Long, Long, Long, Long, Long)] = None
        private var cur = Option.empty[Long]
        private var l, b, maxErr, n = 0L
        private def roll(): Unit = {
          while (pending.isEmpty && rows.hasNext) {
            val (u, _, _, x) = rows.next()
            if (cur.exists(_ != u)) {
              pending = Some((cur.get, l, b, maxErr, n))
              l = 0L; b = 0L; maxErr = 0L; n = 0L
            }
            if (cur.isEmpty || cur.get != u) { cur = Some(u); l = x; n = 1L }
            else {
              val f = l + b
              val err = math.abs(x - f)
              if (err > maxErr) maxErr = err
              val l1 = f + (x - f) / 2
              b = b + (l1 - l - b) / 4
              l = l1
              n += 1
            }
          }
          if (pending.isEmpty && rows.isEmpty && cur.nonEmpty) {
            pending = Some((cur.get, l, b, maxErr, n))
            cur = None
          }
        }
        override def hasNext: Boolean = { roll(); pending.nonEmpty }
        override def next(): (Long, Long, Long, Long, Long) = {
          roll(); val r = pending.get; pending = None; r
        }
      }
    }.toDF("user_id", "level_c", "trend_c", "max_err_c", "n_events")
      .withColumn("forecast_c", col("level_c") + col("trend_c"))
  }

  def holtQuery(s: SparkSession, dir: String): DataFrame =
    holtSmooth(graft.Tables.events(s, dir)).orderBy(col("user_id"))
}
