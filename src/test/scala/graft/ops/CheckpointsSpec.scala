package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Checkpoints]] mode toggle: local (executor-block) vs reliable
  * (durable checkpoint dir) must be behaviorally identical — same
  * results from the iterative operator that leans on stage boundaries
  * hardest — differing only in where the blocks live.
  */
class CheckpointsSpec extends SparkSpec {

  private def ccResult(): Seq[(Long, Long)] = {
    import spark.implicits._
    // two components {1,2,3,4} (chain) and {10,11}, plus isolated via edge 20-20
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 20L))
      .toDF("src", "dst")
    ConnectedComponents.components(edges, "src", "dst")
      .orderBy(col("node"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("reliable mode produces identical components and writes the dir") {
    val expected =
      Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L), (20L, 20L))
    assert(ccResult() === expected) // default: local mode

    val dir = Files.createTempDirectory("graft-ckpt").toFile
    spark.conf.set("spark.graft.checkpoint.mode", "reliable")
    spark.conf.set("spark.graft.checkpoint.dir", dir.getAbsolutePath)
    try {
      assert(ccResult() === expected)
      // the toggle actually routed through the reliable path
      assert(spark.sparkContext.getCheckpointDir.isDefined)
      val wrote = Option(dir.listFiles()).exists(_.nonEmpty) ||
        spark.sparkContext.getCheckpointDir.exists(d =>
          new java.io.File(new java.net.URI(d).getPath).listFiles() != null)
      assert(wrote)
    } finally {
      spark.conf.set("spark.graft.checkpoint.mode", "local")
      spark.conf.unset("spark.graft.checkpoint.dir")
    }
  }

  test("ETL pipeline output is mode-invariant (fan-out stage boundary)") {
    // Patients.clean stages the derive chain before its five consumers;
    // the full pipeline must produce identical rows in both modes.
    // EtlPipeline.run, NOT runDefault: the latter memoizes per
    // (session, dir) and would hand the second call the first's frames.
    def runFresh() = graft.etl.EtlPipeline.run(spark,
      "/root/repo/fixtures/patients.csv",
      "/root/repo/fixtures/encounters.csv",
      "/root/repo/fixtures/diagnoses.xml")
    val base = runFresh()
    val baseRows = base.patients.orderBy(col("patient_id")).collect().toSeq
    val baseLogs = base.logs.count()
    val dir = Files.createTempDirectory("graft-ckpt-etl").toFile
    spark.conf.set("spark.graft.checkpoint.mode", "reliable")
    spark.conf.set("spark.graft.checkpoint.dir", dir.getAbsolutePath)
    try {
      val rel = runFresh()
      assert(rel.logs.count() === baseLogs)
      assert(rel.patients.orderBy(col("patient_id")).collect().toSeq ===
        baseRows)
    } finally {
      spark.conf.set("spark.graft.checkpoint.mode", "local")
      spark.conf.unset("spark.graft.checkpoint.dir")
    }
  }

  test("reliable mode without a dir fails loudly") {
    spark.conf.set("spark.graft.checkpoint.mode", "reliable")
    try {
      if (spark.sparkContext.getCheckpointDir.isEmpty) {
        import spark.implicits._
        val df = Seq(1, 2).toDF("x")
        intercept[IllegalArgumentException](Checkpoints.stage(df))
      } // else: a prior test already set the dir on the shared context —
        // the require is only reachable on a fresh context; nothing to pin
    } finally spark.conf.set("spark.graft.checkpoint.mode", "local")
  }

  test("unknown checkpoint mode fails fast instead of silently running local") {
    spark.conf.set("spark.graft.checkpoint.mode", "Reliable") // typo'd case
    try {
      import spark.implicits._
      val df = Seq(1, 2).toDF("x")
      val e = intercept[IllegalArgumentException](Checkpoints.stage(df))
      assert(e.getMessage.contains("Reliable"))
    } finally spark.conf.set("spark.graft.checkpoint.mode", "local")
  }
}
