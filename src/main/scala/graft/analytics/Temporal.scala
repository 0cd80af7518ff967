package graft.analytics

import graft.{Q, QueryPack, Tables}
import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

/** Time-series operators over the `events` table: as-of join, tumbling
  * windows (the batch-equivalent of the Structured Streaming path in
  * `graft.streaming`), and JSON property extraction.
  */
object Temporal extends QueryPack {

  /** As-of join: each purchase matched to the user's latest prior click. */
  private val asof = Q(
    "asof_purchase_last_click",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
          col("value").as("click_value"), col("event_id").as("c_eid"))
      AsOfJoin.backward(
        purchases, clicks.withColumnRenamed("c_user", "user_id").withColumn("ts", col("click_ts")),
        key = "user_id", ts = "ts",
        payload = Seq("click_ts", "click_value"), tiebreak = "c_eid")
        .orderBy(col("event_id"))
    },
    Some("""SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts, c.value AS click_value
           |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
           |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
           |  ON p.user_id = c.user_id AND p.ts >= c.ts
           |ORDER BY p.event_id""".stripMargin),
    headline = true)

  /** Tumbling 1-hour window aggregation — identical logic drives the
    * Structured Streaming job in [[graft.streaming.EventStream]].
    */
  private val tumbling = Q(
    "stream_tumbling_hourly",
    (s, d) => Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour"), col("event_type")),
    Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
           | count(*) AS n, round(sum(value), 2) AS sum_value
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Semi-structured access: JSON props column (reference stores JSON
    * strings in the log channel, SURVEY.md §1.3 P15).
    */
  private val jsonExtract = Q(
    "json_extract_props",
    (s, d) => Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy(col("event_id")),
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           |FROM events ORDER BY event_id""".stripMargin))

  val qs: Seq[Q] = Seq(asof, tumbling, jsonExtract)
}
