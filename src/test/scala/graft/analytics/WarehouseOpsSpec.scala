package graft.analytics

import graft.{SparkEntry, SparkSpec}

/** Warehouse-maintenance operators: SCD2 run compression, the
  * partition-skew profiler, and mixture sampling to target proportions.
  * The DuckDB oracles prove cross-engine agreement; these specs prove
  * the SEMANTICS against independent in-process reimplementations and
  * pin the invariants the oracles can't see (saturation, determinism).
  */
class WarehouseOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def floorDiv(us: Long): Long = Math.floorDiv(us, 1000000L)

  test("scd2_event_type_runs matches an independent Scala fold over sorted events") {
    val got = SparkEntry.queries("scd2_event_type_runs")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

    // independent: collect raw events, sort per user by (ts, event_id),
    // fold into maximal same-type runs, aggregate per (user, type)
    val raw = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = raw.groupBy(_._1).flatMap { case (user, evs) =>
      // order by full-precision ts then event_id — the query's ordering;
      // spans floor to seconds afterwards (unix_timestamp semantics)
      val sorted = evs.sortBy(e => (e._2, e._3))
      val runs = sorted.foldLeft(List.empty[(String, Long, Long, Long)]) {
        // run = (type, n, minUs, maxUs), list head = current run
        case (acc @ ((t, n, lo, hi) :: rest), (_, us, _, et)) if t == et =>
          (t, n + 1, lo, math.max(hi, us)) :: rest
        case (acc, (_, us, _, et)) => (et, 1L, us, us) :: acc
      }
      runs.groupBy(_._1).map { case (et, rs) =>
        (user, et) -> (rs.size.toLong, rs.map(_._2).sum,
          rs.map(_._2).max,
          rs.map(r => floorDiv(r._4) - floorDiv(r._3)).sum)
      }
    }
    assert(got === expected)
  }

  test("dq_partition_skew: histogram totals reconcile and hot key bounds hold") {
    val r = SparkEntry.queries("dq_partition_skew")(spark, sf).collect()(0)
    val (nBuckets, total, minB, maxB, hotRows) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))
    val li = graft.Tables.lineitem(spark, sf)
    val n = li.count()
    val nKeys = li.select("l_suppkey").distinct().count()
    assert(total === n)
    assert(nBuckets <= 32 && nBuckets > 0)
    assert(minB <= total / nBuckets && total / nBuckets <= maxB)
    // the hottest key must carry at least the mean per-key load
    assert(hotRows >= n / nKeys)
  }

  test("text_mixture_sample: undersized sources saturate (kept == all), none oversample") {
    val rows = SparkEntry.queries("text_mixture_sample")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    val target = total * 0.5 / rows.size
    rows.foreach { case (src, nDocs, nKept) =>
      assert(nKept <= nDocs, s"$src oversampled: $nKept > $nDocs")
      if (nDocs <= target)
        assert(nKept === nDocs, s"undersized $src must keep all docs")
    }
    // the md5-uniform is a pure function of doc_id: rerun == same sample
    val again = SparkEntry.queries("text_mixture_sample")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.sortBy(_._1) === again.sortBy(_._1))
  }
}
