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
}
