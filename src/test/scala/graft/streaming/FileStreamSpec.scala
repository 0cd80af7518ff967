package graft.streaming

import graft.SparkSpec

/** Drives the file-stream wiring helper against the harness's own
  * TIMESTAMP(NANOS) events parquet — the case that used to throw
  * PARQUET_TYPE_ILLEGAL at schema inference.
  */
class FileStreamSpec extends SparkSpec {

  test("runFileStream streams the nano-timestamp events parquet end to end") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    // the streaming file source takes a DIRECTORY; stage the single
    // parquet file into one (in production this is the landing dir)
    val src = java.nio.file.Paths.get(tmp, "src")
    java.nio.file.Files.createDirectories(src)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      src.resolve("events.parquet"))
    val q = EventStream.runFileStream(spark, src.toString,
      s"$tmp/out", s"$tmp/ckpt")
    try {
      q.processAllAvailable()
      // append-mode windows only emit once the watermark passes them; a
      // bounded file source never advances past its max event, so assert
      // the stream RAN (progress recorded, rows ingested) rather than
      // final counts — window-close semantics are pinned in EventStreamSpec
      assert(q.recentProgress.nonEmpty)
      assert(q.recentProgress.map(_.numInputRows).sum > 0)
    } finally q.stop()
  }
}
