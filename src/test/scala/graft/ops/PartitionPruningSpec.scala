package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Partition pruning — the other storage-level 100 TB lever next to
  * bucketing (BucketingSpec): a date-partitioned layout must let a
  * day-filtered query read ONLY that day's files, turning a full-corpus
  * scan into a partition-local one. This is how the events table would
  * actually be laid out in production (dt= partitions); the harness
  * parquet is unpartitioned, so the layout is built here.
  */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned write + day filter prunes to one partition") {
    val dirPath = Files.createTempDirectory("graft_part")
    val dir = dirPath.toString
    try {
      val sf = "/root/testdata/sf0.001"
      val ev = graft.Tables.events(spark, sf)
        .withColumn("dt", to_date(col("ts")))
      ev.write.partitionBy("dt").mode("overwrite").parquet(dir)

      val oneDay = spark.read.parquet(dir).filter(col("dt") === lit("2024-01-05"))
      val rows = oneDay.count()
      assert(rows > 0)
      assert(rows === ev.filter(to_date(col("ts")) === lit("2024-01-05")).count())

      val scan = (oneDay.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).collectLeaves().collectFirst { case f: FileSourceScanExec => f }.get
      // the dt predicate must be a partition filter (directory-level
      // pruning), not a data filter evaluated against every file
      assert(scan.partitionFilters.map(_.toString).exists(_.contains("dt")),
        scan.partitionFilters.mkString(";"))
      // and the scan must touch only the single matching partition
      assert(scan.relation.location.inputFiles.length >
        scan.selectedPartitions.totalNumberOfFiles,
        "scan did not prune partitions")
      assert(scan.selectedPartitions.partitionCount === 1,
        s"expected 1 selected partition, got ${scan.selectedPartitions.partitionCount}")
    } finally {
      // don't leak a partitioned copy of the events table per run
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(dirPath)) { walk =>
        walk.iterator().asScala.toSeq
          .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }
}
