package graft.analytics

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-data semantics for the round-7 stats/temporal operators,
  * driven through the REGISTERED queries end-to-end: each test writes a
  * hand-checkable table set to a temp dir shaped like the harness data
  * (`<dir>/<table>.parquet`) and runs `SparkEntry.queries(name)` on it —
  * so the assertions exercise the exact code the driver verifies.
  */
class RoundSevenSpec extends SparkSpec {

  import spark.implicits._

  private def q(name: String, dir: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("r7spec").toString

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-02-$day%02d $hour%02d:00:00")

  private def writeEvents(dir: String,
      rows: Seq[(Long, Timestamp, Long, String, java.lang.Double, String)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

  test("ts_changepoint_cusum finds a planted level shift") {
    val dir = tmpDir()
    // 10 days at 2 events/day, then 10 days at 8/day → CUSUM deviation
    // peaks at the last low day (day 10)
    val rows = for {
      day <- 1 to 20
      i <- 1 to (if (day <= 10) 2 else 8)
    } yield ((day * 100 + i).toLong, ts(day), 1L, "click",
      Double.box(1.0), "{}")
    writeEvents(dir, rows)
    val out = q("ts_changepoint_cusum", dir)
      .select("event_type", "n_days", "total", "cp_day", "max_absdev")
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 20L && r.getLong(2) === 100L)
    assert(r.getDate(3).toString === "2024-02-10")
    // |N·prefix − t·S| at t=10: |20·20 − 10·100| = 600
    assert(r.getLong(4) === 600L)
  }

  test("dq_winsorized_means clamps exactly at the order-statistic fences") {
    val dir = tmpDir()
    // 20 values: 1..18 plus outliers −1000 and +1000; sorted order is
    // −1000, 1..18, 1000 with k=⌈q·20⌉ order-statistic fences:
    // lo = max(c | rn ≤ 1) = −1000·100, hi = max(c | rn ≤ 19) = 18·100.
    val vals = (1 to 18).map(_.toDouble) ++ Seq(-1000.0, 1000.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, ts(1, i % 24), 1L, "buy", Double.box(v), "{}")
    }
    writeEvents(dir, rows)
    val r = q("dq_winsorized_means", dir)
      .select("event_type", "n", "lo_centi", "hi_centi",
        "sum_raw_centi", "sum_winsor_centi").collect().head
    assert(r.getLong(1) === 20L)
    assert(r.getLong(2) === -100000L && r.getLong(3) === 1800L)
    // raw sum: (1..18)·100 + 0 = 17100; winsorized: +1000 clamps to 18
    assert(r.getLong(4) === 17100L)
    assert(r.getLong(5) === (171 + 18 - 1000) * 100L)
  }

  test("ts_seasonal_naive_error skips gap days and sums |y − y_prev|") {
    val dir = tmpDir()
    // hour 6 counts: day1=3, day2=5, day4=7 (day3 missing → the 2→4
    // step is NOT a forecast pair)
    val rows =
      (1 to 3).map(i => (100L + i, ts(1, 6), 1L, "click", Double.box(1.0), "{}")) ++
      (1 to 5).map(i => (200L + i, ts(2, 6), 1L, "click", Double.box(1.0), "{}")) ++
      (1 to 7).map(i => (400L + i, ts(4, 6), 1L, "click", Double.box(1.0), "{}"))
    writeEvents(dir, rows)
    val r = q("ts_seasonal_naive_error", dir)
      .select("event_type", "n_forecasts", "sum_abs_err", "sum_actual")
      .collect().head
    assert(r.getLong(1) === 1L)   // only day1→day2
    assert(r.getLong(2) === 2L)   // |5−3|
    assert(r.getLong(3) === 5L)   // the forecast day's actual
  }

  test("ts_decayed_engagement halves per week of age") {
    val dir = tmpDir()
    // anchor = day 15; user 1: 10.00 on day 15 (0 weeks) and 10.00 on
    // day 1 (2 weeks) → decayed = 1000 + 1000/4 = 1250
    val rows = Seq(
      (1L, ts(15), 1L, "buy", Double.box(10.0), "{}"),
      (2L, ts(1), 1L, "buy", Double.box(10.0), "{}"),
      (3L, ts(8), 2L, "buy", Double.box(10.0), "{}")) // 1 week → 500
    writeEvents(dir, rows)
    val out = q("ts_decayed_engagement", dir)
      .select("user_id", "raw_centi", "decayed_centi")
      .as[(Long, Long, Long)].collect()
      .map { case (u, r, dc) => u -> ((r, dc)) }.toMap
    assert(out(1L) === ((2000L, 1250L)))
    assert(out(2L) === ((1000L, 500L)))
  }

  test("dq_k_anonymity bands planted equivalence classes") {
    val dir = tmpDir()
    // classes: (1,A)×1, (2,B)×3, (3,C)×12 → bands 1, 3, 11(=">10");
    // risky rows (k<5): 1+3=4 of 16 → 2500 bp
    val rows =
      Seq((1L, "n1", 1, 10.0, "A")) ++
      (2 to 4).map(i => (i.toLong, s"n$i", 2, 10.0, "B")) ++
      (5 to 16).map(i => (i.toLong, s"n$i", 3, -5.0, "C"))
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val out = q("dq_k_anonymity", dir)
      .select("k_band", "n_classes", "n_rows", "min_l", "risky_bp")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)) ===
      Seq((1L, 1L, 1L), (3L, 1L, 3L), (11L, 1L, 12L)))
    assert(out.forall(_._5 === 2500L))
    // the all-negative-balance class has l-diversity 1
    assert(out.find(_._1 == 11L).get._4 === 1L)
  }

  test("inc_join_merge equals the directly-computed full join") {
    val dir = tmpDir()
    val orders = (1L to 20L).map(k =>
      (k, k % 5, "O", 100.0, ts((k % 28 + 1).toInt), s"P${k % 3}"))
    orders.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val li = (1L to 20L).flatMap(k => Seq((k, 1L, 10.0 + k, 0.05)))
    li.toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = q("inc_join_merge", dir)
      .select("o_orderpriority", "n", "rev_cbp")
      .as[(String, Long, Long)].collect()
      .map { case (p, n, r) => p -> ((n, r)) }.toMap
    // direct full-join recompute in the spec, same integer units
    val expect = orders.flatMap { case (k, _, _, _, _, prio) =>
      li.filter(_._1 == k).map { case (_, _, ext, disc) =>
        (prio, math.round(ext * 100) * (10000L - math.round(disc * 10000)))
      }
    }.groupBy(_._1).map { case (p, xs) => p -> (xs.size.toLong, xs.map(_._2).sum) }
    assert(got === expect)
  }
}
