package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing harness for performance iteration:
  * `runMain graft.tools.TimeQuery <name>[,<name>...] [reps]` — warms each
  * query once at sf0.001 (same protocol as [[graft.Bench]]), then times
  * `reps` executions at SPARK_GRAFT_SF_DIR through the noop sink and
  * prints per-rep seconds. `EXPLAIN=1` additionally dumps the formatted
  * physical plan — the fast loop for "is this the plan I want".
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').toSeq)
      .getOrElse(sys.error("usage: TimeQuery <name>[,name...] [reps]"))
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same per-execution state scoping as Bench: checkpointed RDDs from
    // one rep otherwise stack into storage pressure that slows later
    // reps AND later queries (observed: kcore reps 9s→27s at 3× data,
    // then a 53s first rep on the NEXT query)
    def dropQueryState(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))

    names.foreach { name =>
      val q = SparkEntry.queries(name)
      q(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      dropQueryState()
      if (sys.env.contains("EXPLAIN"))
        q(spark, sfDir).explain("formatted")
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        dropQueryState()
        t
      }
      println(f"[time] $name reps=${times.map(t => f"$t%.3f").mkString(",")} min=${times.min}%.3f")
    }
    spark.stop()
  }
}
