package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Diagnostic main: run one registered query and print its EXECUTED
  * (post-AQE) physical plan with scan / exchange-reuse counts — the tool
  * for auditing stage re-evaluation in the composed pipelines, where the
  * static plan over-counts scans that AQE later collapses into
  * ReusedExchange reads.
  *
  * Usage: runMain graft.tools.PlanProbe <queryName> [sfDir]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = graft.SparkEntry.queries(name)(spark, sf)
    val t0 = System.nanoTime()
    df.collect()
    println(f"[probe] $name cold ${(System.nanoTime() - t0) / 1e9}%.2f s")
    // warm re-invocations (fresh frames, codegen/JIT warm): the number
    // that tracks the bench harness
    val times = (1 to 3).map { _ =>
      val d2 = graft.SparkEntry.queries(name)(spark, sf)
      val t1 = System.nanoTime()
      d2.collect()
      (System.nanoTime() - t1) / 1e9
    }
    println(f"[probe] $name warm min ${times.min}%.2f s (${times.map(t => f"$t%.2f").mkString(", ")})")
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val s = p.toString
    println(s"[probe] scans=${"Scan parquet".r.findAllIn(s).length} " +
      s"reusedExchanges=${"ReusedExchange".r.findAllIn(s).length} " +
      s"exchanges=${"Exchange".r.findAllIn(s).length}")
    println(s)
    spark.stop()
  }
}
