package graft.ops

import org.apache.spark.sql.DataFrame

/** Stage boundary for iterative/staged operators (CC, k-core, PageRank,
  * the staged dedup pipelines): truncate lineage and pin the frame so
  * per-round plans stay flat and fan-out consumers never re-plan the
  * upstream stage.
  *
  * Two modes, selected by the session conf `spark.graft.checkpoint.mode`:
  *
  *  - `local` (default): `localCheckpoint()` — blocks live on executor
  *    block managers. Zero-infrastructure and right for local[N] and the
  *    bench harness, but NOT fault-tolerant: on a real cluster an
  *    executor loss mid-job loses its blocks and kills the job.
  *  - `reliable`: `checkpoint()` against the durable checkpoint dir from
  *    `spark.graft.checkpoint.dir` (HDFS/object store on a cluster) —
  *    survives executor loss, which a 100-TB multi-hour iterative job
  *    requires. Costs one write+read of the stage through the FS.
  *
  * Both are EAGER (materialize now), which the staged lifecycles rely on
  * for correct timing and for overwrite-input patterns (EventStream).
  */
object Checkpoints {

  def stage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get("spark.graft.checkpoint.mode", "local") match {
      case "reliable" =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          val dir = spark.conf.get("spark.graft.checkpoint.dir", "")
          require(dir.nonEmpty,
            "spark.graft.checkpoint.mode=reliable needs spark.graft.checkpoint.dir")
          sc.setCheckpointDir(dir)
        }
        df.checkpoint()
      case "local" => df.localCheckpoint()
      case other =>
        // fail fast: a typo'd mode silently running on non-fault-tolerant
        // localCheckpoint blocks is exactly the failure `reliable` exists
        // to prevent
        throw new IllegalArgumentException(
          s"spark.graft.checkpoint.mode must be 'local' or 'reliable', got '$other'")
    }
  }

  /** Postfix form so call sites read like the `localCheckpoint()` they
    * replace: `df.stageCheckpoint()`.
    */
  implicit class StageCheckpoint(private val df: DataFrame) extends AnyVal {
    def stageCheckpoint(): DataFrame = Checkpoints.stage(df)
  }
}
