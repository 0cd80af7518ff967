package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Diagnostic main: write `.explain("formatted")` for registered
  * queries to files — the audit substrate for the optimization rounds
  * (Exchange count, join strategy, PushedFilters/ReadSchema per plan)
  * and the generator of the committed `plans/rNN/<query>_{before,after}`
  * evidence.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <name>[,<name>...]|headline [sfDir]
  *
  * Plans are the STATIC (pre-AQE) formatted physical plans — the shape
  * the builder controls; AQE runtime rewrites are audited separately
  * with [[PlanProbe]] (executed plan). Building a plan still runs any
  * eager stageCheckpoint jobs inside the query builders, so a dump at a
  * big SF does real (bounded) work.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sf = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args(1) match {
      case "headline" => graft.SparkEntry.headlineNames
      case s => s.split(',').toSeq
    }
    new java.io.File(outDir).mkdirs()
    // EXEC=1: execute each query ONCE through the noop sink and dump
    // the EXECUTED (post-AQE) formatted plan instead of the static one
    // — the capture that shows AQE's runtime join rewrites, which the
    // static plan cannot (a join-strategy hint and an AQE flip both
    // surface only here).
    // A noop-sink write would execute a COPY of the plan (the write
    // command's own QueryExecution) and leave `df`'s AQE plan
    // unexecuted, so EXEC mode collects instead — these registry
    // queries all return bounded (top-k/agg) results.
    val exec = sys.env.contains("EXEC")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      if (exec) df.collect()
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$name.txt"), plan)
      val ex = "Exchange".r.findAllIn(plan).length
      val scans = "Scan parquet".r.findAllIn(plan).length
      println(s"[plan] $name exchanges=$ex scans=$scans " +
        s"bhj=${"BroadcastHashJoin".r.findAllIn(plan).length} " +
        s"smj=${"SortMergeJoin".r.findAllIn(plan).length}")
      // drop any checkpoint blocks the builder pinned, same rule as the
      // timing harnesses: leaked blocks distort the NEXT query's work
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
