package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Bucketed-table co-located join — the storage-level half of the 100 TB
  * join story: when both fact tables are bucketed on the join key with
  * the same bucket count, the join consumes bucket locality and plans
  * with NO shuffle exchange on either side. This is what a production
  * deployment does for the orders⋈lineitem join instead of paying the
  * sort-merge shuffle per query; the repartition+broadcast strategies in
  * the query packs cover the ad-hoc case.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // warehouse.dir is a static conf — managed tables land in the default
    // ./spark-warehouse; DROP TABLE below removes their files
    val sf = "/root/testdata/sf0.001"
    // force a sort-merge join: at this test scale AQE would broadcast the
    // small side, which bypasses the bucket-locality path under test
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.Tables.orders(spark, sf).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      graft.Tables.lineitem(spark, sf).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")

      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))

      val rows = joined.collect()
      assert(rows.nonEmpty)

      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      // the join itself must consume bucket locality: no Exchange may
      // feed the SortMergeJoin (the only allowed exchange is the
      // aggregation's, after the join)
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a sort-merge join:\n$plan")
      assert(!plan.substring(joinIdx).contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")

      // and the result matches the unbucketed plan
      val expected = graft.Tables.orders(spark, sf)
        .join(graft.Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
