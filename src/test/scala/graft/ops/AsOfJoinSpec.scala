package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-row semantics of the as-of join (the oracle-checked registered
  * query only compares per-user aggregates) + equivalence of the
  * skew-resistant bucketed variant.
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def left = Seq(
    (1L, "2024-01-01 10:00:00", "p1"),
    (1L, "2024-01-01 12:00:00", "p2"),
    (2L, "2024-01-01 09:00:00", "p3"))
    .toDF("user_id", "ts", "pid")
    .withColumn("ts", col("ts").cast("timestamp"))

  private def right = Seq(
    (1L, "2024-01-01 09:30:00", 1.0, 100L),
    (1L, "2024-01-01 10:00:00", 2.0, 101L), // simultaneous with p1 — inclusive
    (1L, "2024-01-01 10:00:00", 3.0, 102L), // tie → greatest tiebreak wins
    (1L, "2024-01-01 13:00:00", 9.0, 103L), // after p2 — never matched
    (3L, "2024-01-01 08:00:00", 7.0, 104L)) // other key
    .toDF("user_id", "ts", "v", "eid")
    .withColumn("ts", col("ts").cast("timestamp"))

  test("backward: inclusive bound, greatest-tiebreak ties, null when no match") {
    val out = AsOfJoin.backward(left, right, "user_id", "ts",
      payload = Seq("v", "eid"), tiebreak = "eid")
      .orderBy(col("pid")).collect()
    assert(out(0).getAs[String]("pid") === "p1")
    assert(out(0).getAs[Double]("v") === 3.0) // eid 102 beats 101 at same ts
    assert(out(1).getAs[Double]("v") === 3.0) // latest ≤ 12:00 is still 10:00
    assert(out(2).isNullAt(out(2).fieldIndex("v"))) // user 2: no clicks
  }

  test("null tiebreaks LOSE and null keys never match — identically in both variants") {
    // right rows: at 10:00 user 1 has tiebreaks (null, 5); a NULL-key
    // right row could otherwise leak through the window path only
    val l = Seq(
      (Option(1L), "2024-01-01 10:30:00", "a"),
      (Option.empty[Long], "2024-01-01 10:30:00", "b"))
      .toDF("user_id", "ts", "pid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val r = Seq(
      (Option(1L), "2024-01-01 10:00:00", 1.0, Option.empty[Long]),
      (Option(1L), "2024-01-01 10:00:00", 2.0, Option(5L)),
      (Option.empty[Long], "2024-01-01 09:00:00", 9.0, Option(7L)))
      .toDF("user_id", "ts", "v", "eid")
      .withColumn("ts", col("ts").cast("timestamp"))
    for (variant <- Seq(
        AsOfJoin.backward(l, r, "user_id", "ts", Seq("v"), "eid"),
        AsOfJoin.backwardBucketed(l, r, "user_id", "ts", Seq("v"), "eid"))) {
      val rows = variant.orderBy(col("pid")).collect()
      // non-null tiebreak 5 beats the NULL tiebreak at the same ts
      assert(rows(0).getAs[Double]("v") === 2.0)
      // NULL-key left row matches nothing (SQL equality)
      assert(rows(1).isNullAt(rows(1).fieldIndex("v")))
    }
  }

  test("bucketed carry inherits the same null-tiebreak rule across buckets") {
    // both right rows in one bucket hour, the left row hours later: the
    // match comes from the CARRY summary, which must also prefer the
    // non-null tiebreak
    val l = Seq((1L, "2024-01-01 15:00:00", "a"))
      .toDF("user_id", "ts", "pid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val r = Seq(
      (1L, "2024-01-01 10:00:00", 1.0, Option.empty[Long]),
      (1L, "2024-01-01 10:00:00", 2.0, Option(5L)))
      .toDF("user_id", "ts", "v", "eid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val plain = AsOfJoin.backward(l, r, "user_id", "ts", Seq("v"), "eid")
      .collect().head.getAs[Double]("v")
    val bucketed = AsOfJoin
      .backwardBucketed(l, r, "user_id", "ts", Seq("v"), "eid")
      .collect().head.getAs[Double]("v")
    assert(plain === 2.0 && bucketed === 2.0)
  }

  test("bucketed variant ≡ plain backward on real events data") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("cv"),
        col("event_id").as("ceid"))
    val plain = AsOfJoin.backward(purchases, clicks, "user_id", "ts",
      Seq("cv", "ceid"), "ceid").orderBy(col("event_id")).collect()
    val bucketed = AsOfJoin.backwardBucketed(purchases, clicks, "user_id", "ts",
      Seq("cv", "ceid"), "ceid", bucketWidth = 3600L)
      .orderBy(col("event_id")).collect()
    assert(plain.length === bucketed.length)
    plain.zip(bucketed).foreach { case (a, b) => assert(a === b) }
  }

  test("bucketed variant: carry-in crosses many empty buckets") {
    // one click at 00:10, purchase 3 days later — carry must survive
    val l = Seq((1L, "2024-01-04 00:00:00", "p")).toDF("user_id", "ts", "pid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val r = Seq((1L, "2024-01-01 00:10:00", 5.0, 1L)).toDF("user_id", "ts", "v", "eid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = AsOfJoin.backwardBucketed(l, r, "user_id", "ts", Seq("v"), "eid")
      .collect()
    assert(out(0).getAs[Double]("v") === 5.0)
  }
}
