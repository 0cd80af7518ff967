package graft.streaming

import graft.SparkSpec
import graft.streaming.DocStream.Doc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Drives the streaming curation gates through MemoryStream: quality
  * and contamination drops are stateless per batch, exact dedup holds
  * cross-batch keyed state — and the surviving set equals the batch v5
  * gates applied to the same rows.
  */
class DocStreamSpec extends SparkSpec {

  import spark.implicits._

  private val benchText =
    "the quick brown fox jumps over the lazy dog again and again"

  private def benchFps = spark.createDataset(Seq(benchText)).toDF("text")
    .select(explode(graft.llm.TextAnalysis.shingles(col("text"), 5)).as("g"))
    .select(substring(md5(col("g")), 1, 16).as("fp")).distinct()

  test("curate: quality, contamination, and duplicate docs drop; clean docs pass") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = DocStream.curate(input.toDF(), benchFps, minTokens = 5)
      .writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append).start()
    try {
      val clean = "a perfectly ordinary document with enough clean tokens"
      input.addData(
        Doc(1, clean, "en", "web"),
        Doc(2, "too short", "en", "web"), // quality: < 5 tokens
        // contamination: contains a benchmark 5-gram run verbatim
        Doc(3, s"prefix words then the quick brown fox jumps over suffix",
          "en", "web"))
      q.processAllAvailable()
      // second batch: an exact duplicate of doc 1 (cross-batch dedup
      // state must drop it) and one new clean doc
      input.addData(
        Doc(4, clean, "en", "web"),
        Doc(5, "another clean document that sails through every gate",
          "en", "web"))
      q.processAllAvailable()
      val got = spark.table("curated").as[Doc].collect().map(_.doc_id).toSet
      assert(got === Set(1L, 5L))
    } finally q.stop()
  }

  test("streaming gates equal the batch gates on the same rows") {
    val docs = Seq(
      Doc(1, "a perfectly ordinary document with enough clean tokens", "en", "w"),
      Doc(2, "x1 9 . ,", "en", "w"),
      Doc(3, s"leading the quick brown fox jumps over trailing", "en", "w"),
      Doc(4, "a perfectly ordinary document with enough clean tokens", "en", "w"),
      Doc(5, "a different clean document entirely made of words", "en", "w"))
      .toDF()
    // batch semantics: same gates, same order, keep-first on fingerprint
    val batch = DocStream.curate(docs, benchFps, minTokens = 5)
      .as[Doc].collect().map(_.doc_id).toSet
    assert(batch === Set(1L, 5L))
  }

  test("decontaminate gates on the batch hit-RATIO, not any-hit") {
    // a long doc QUOTING one benchmark 5-gram (2 hits / 56 grams ≈ 3.6%
    // < 10%) must survive — the batch v5 gate keeps it, and the stream
    // must agree; a doc that is mostly benchmark text must drop
    val filler = (1 to 55).map(i => s"w$i").mkString(" ")
    val quoting = s"$filler the quick brown fox jumps over"
    val copied = s"$benchText and $benchText"
    val docs = Seq(
      Doc(1, quoting, "en", "w"),
      Doc(2, copied, "en", "w")).toDF()
    val kept = DocStream.decontaminate(docs, benchFps)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L))
    // and the stream agrees with the batch v5 convention exactly:
    // DISTINCT grams, n_hit * 10000 div n_grams >= 1000
    val grams = graft.llm.Hashing.shingles(quoting, 5)
      .map(graft.llm.Hashing.md5Hex16)
    val bench = benchFps.as[String].collect().toSet
    val hits = grams.count(bench.contains)
    assert(hits > 0, "the quoting doc must actually hit the benchmark")
    assert(hits * 10000L / grams.length < 1000L)
  }

  test("curate restart: dedup state survives the checkpoint, no reprocess") {
    // the bench restore phase at million-key scale (Bench.largeStateBench)
    // runs exactly this lifecycle on RocksDB; this pins the semantics at
    // spec scale: stop mid-stream, restart from the checkpoint, and the
    // restarted query must (a) not reprocess committed input and (b) still
    // hold the fingerprint state — a wave-1 duplicate must stay dropped
    implicit val sq = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-curate-rs").toString
    val clean1 = "a perfectly ordinary document with enough clean tokens"
    val clean2 = "another clean document that sails through every gate"
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the memory sink refuses checkpoint recovery by design; the
      // foreachBatch sink (what the bench restore phase uses) supports it
      val out1 = new java.util.concurrent.ConcurrentLinkedQueue[Long]
      val out2 = new java.util.concurrent.ConcurrentLinkedQueue[Long]
      def sink(q: java.util.concurrent.ConcurrentLinkedQueue[Long]) =
        (b: org.apache.spark.sql.DataFrame, _: Long) => {
          b.select("doc_id").as[Long].collect().foreach(q.add); ()
        }
      val input = MemoryStream[Doc]
      val q1 = DocStream.curate(input.toDF(), benchFps, minTokens = 5)
        .writeStream.foreachBatch(sink(out1))
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", s"$tmp/ckpt").start()
      try {
        input.addData(Doc(1, clean1, "en", "w"))
        q1.processAllAvailable()
        assert(out1.size === 1)
      } finally q1.stop()
      // wave 2 on the SAME source, consumed by a restarted query: one
      // exact duplicate of doc 1 and one genuinely new doc
      input.addData(Doc(2, clean1, "en", "w"), Doc(3, clean2, "en", "w"))
      val q2 = DocStream.curate(input.toDF(), benchFps, minTokens = 5)
        .writeStream.foreachBatch(sink(out2))
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", s"$tmp/ckpt").start()
      try {
        q2.processAllAvailable()
        import scala.jdk.CollectionConverters._
        val got = out2.iterator().asScala.toSet
        assert(got === Set(3L),
          s"dedup state lost across restart or wave-1 reprocessed: $got")
        assert(q2.recentProgress.map(_.numInputRows).sum === 2,
          "restarted query must consume exactly the uncommitted wave")
      } finally q2.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("dedupExact with an event-time watermark dedups within the horizon") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def at(s: Int) = new java.sql.Timestamp(base.getTime + s * 1000L)
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = DocStream.dedupExact(docs, eventTimeCol = Some("ts"),
        horizon = "10 minutes")
      .writeStream.format("memory").queryName("wm_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, at(0), "alpha beta gamma"),
        (2L, at(5), "alpha beta gamma"), // dup within horizon: dropped
        (3L, at(9), "delta epsilon zeta"))
      q.processAllAvailable()
      input.addData((4L, at(20), "alpha beta gamma")) // still in horizon
      q.processAllAvailable()
      val got = spark.table("wm_dedup").select("doc_id")
        .as[Long].collect().toSet
      assert(got === Set(1L, 3L))
    } finally q.stop()
  }

  test("maintainLshIndex: per-batch incremental pairs equal the full recompute") {
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("lshidx").toString
    val (corpusDir, pairsDir, ckpt) =
      (s"$root/corpus", s"$root/pairs", s"$root/ckpt")
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // waves: 1+2 near-dups arrive in wave 1; 3 unrelated; wave 2 brings
    // 4 (near-dup of 1 — a CROSS-WAVE pair only the incremental
    // new-vs-all join can find) and 5 (unrelated)
    val d = Map(
      1L -> s"$base lambda",
      2L -> s"$base mu",
      3L -> "completely different words about streaming state stores here",
      4L -> s"$base nu",
      5L -> "another unrelated document mentioning checkpoints and sinks")
    val input = MemoryStream[Doc]
    val q = DocStream.maintainLshIndex(input.toDF(), corpusDir, pairsDir,
      ckpt, threshold = 0.5)
    try {
      input.addData(Doc(1, d(1L), "en", "w"), Doc(2, d(2L), "en", "w"),
        Doc(3, d(3L), "en", "w"))
      q.processAllAvailable()
      input.addData(Doc(4, d(4L), "en", "w"), Doc(5, d(5L), "en", "w"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(pairsDir)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val full = graft.llm.MinHashLsh.nearDupPairs(
        d.toSeq.map { case (id, t) => (id, t) }.toDF("doc_id", "text"),
        "doc_id", "text", threshold = 0.5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(streamed === full)
    assert(streamed.contains((1L, 4L))) // the cross-wave pair
    // corpus store holds every doc exactly once
    val corpus = spark.read.parquet(corpusDir)
      .select("doc_id").as[Long].collect().sorted
    assert(corpus.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    // the band-signature store carries every doc's keys exactly once —
    // the structure that keeps later batches from recomputing the whole
    // corpus's signatures
    val sigs = spark.read.parquet(s"${pairsDir}_sigs")
    assert(sigs.select("id").distinct().as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L, 5L))
    assert(sigs.count() === 5L * graft.llm.MinHashLsh.Bands)
  }
}
