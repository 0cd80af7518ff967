package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import scala.util.Random

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("pointInInterval matches the naive cross-join on random data") {
    val rnd = new Random(42)
    // Points and intervals over a ~3-hour span; interval lengths straddle
    // the grain (some shorter, some several buckets long).
    val points = (1 to 500).map { i =>
      (i.toLong, ts(rnd.nextInt(10000).toLong))
    }.toDF("pid", "pt")
    val intervals = (1 to 80).map { i =>
      val start = rnd.nextInt(10000).toLong
      (i.toLong, ts(start), ts(start + 30 + rnd.nextInt(900)))
    }.toDF("iid", "w_start", "w_end")

    val got = RangeJoin.pointInInterval(points, intervals,
        "pt", "w_start", "w_end", grainSec = 120L)
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    val want = points.crossJoin(intervals)
      .filter(col("pt") >= col("w_start") && col("pt") <= col("w_end"))
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(want.nonEmpty, "degenerate fixture: no containment pairs at all")
    assert(got === want)
  }

  test("no duplicate pairs even when an interval spans many buckets") {
    val points = Seq((1L, ts(500))).toDF("pid", "pt")
    // one interval covering 10+ buckets at grain 60 — the pair must still
    // appear exactly once (it only meets in the point's own bucket)
    val intervals = Seq((1L, ts(0), ts(700))).toDF("iid", "w_start", "w_end")
    val got = RangeJoin.pointInInterval(points, intervals,
      "pt", "w_start", "w_end", grainSec = 60L)
    assert(got.count() === 1L)
  }

  test("inclusive bounds: points exactly on start/end are kept") {
    val points = Seq((1L, ts(100)), (2L, ts(200)), (3L, ts(201)),
      (4L, ts(99))).toDF("pid", "pt")
    val intervals = Seq((7L, ts(100), ts(200))).toDF("iid", "w_start", "w_end")
    val got = RangeJoin.pointInInterval(points, intervals,
        "pt", "w_start", "w_end", grainSec = 60L)
      .select("pid").as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 2L))
  }
}
