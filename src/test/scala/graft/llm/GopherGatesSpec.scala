package graft.llm

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Planted-document proof for `docs_gopher_gates`: the synthetic corpus
  * fails the stop-word octet universally (its vocabulary is generated),
  * so the oracle never exercises the PASS branch or most single-rule
  * failures in isolation — this spec plants one document per rule that
  * fails EXACTLY that rule, plus a clean document that passes all
  * seven (the `dedup_embedding_cosine` planted-case pattern).
  */
class GopherGatesSpec extends SparkSpec {

  import spark.implicits._

  // 60 comfortable words: inside [50, 1e5], mean length in [3, 10],
  // no symbols/bullets/ellipses, alphabetic, stop words present.
  private val cleanText =
    (Seq("the", "cat", "sat", "with", "another", "friendly", "animal") ++
      Seq.fill(53)("word")).mkString(" ")

  private def gateCounts(rows: Seq[(Long, String)]): Map[String, Long] = {
    val dir = java.nio.file.Files.createTempDirectory("gopher").toString
    rows.map { case (id, t) => (id, t, "en", "planted", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("docs_gopher_gates")(spark, dir).collect()(0)
    r.schema.fieldNames.zipWithIndex.collect {
      case (n, i) if n != "source" => n -> r.getLong(i)
    }.toMap
  }

  test("a clean document passes every gate") {
    val g = gateCounts(Seq((1L, cleanText)))
    assert(g("n_docs") === 1 && g("n_pass_all") === 1)
    assert(g.filter(_._1.startsWith("n_fail")).values.forall(_ === 0L))
  }

  test("each rule trips on its planted violation (side-rules may co-fire)") {
    val bulleted = (1 to 10).map(i => s"- item $i").mkString("\n")
    val ellipses = (1 to 10).map(i => s"line $i trails off...").mkString("\n")
    val plants = Seq(
      "n_fail_wordcount" -> Seq.fill(20)("word").mkString(" "),
      "n_fail_meanwordlen" -> Seq.fill(60)("supercalifragilistic").mkString(" "),
      "n_fail_symbolratio" -> (cleanText + " " + Seq.fill(20)("#").mkString(" ")),
      "n_fail_bulletlines" -> bulleted,
      "n_fail_ellipsislines" -> ellipses,
      "n_fail_alphawords" -> (Seq("the", "with", "and") ++ Seq.fill(57)("12345")).mkString(" "),
      "n_fail_stopwords" -> Seq.fill(60)("lorem").mkString(" "))
    plants.foreach { case (rule, text) =>
      val g = gateCounts(Seq((1L, text)))
      assert(g(rule) === 1L, s"$rule should trip on: ${text.take(60)}")
      assert(g("n_pass_all") === 0L, rule)
    }
  }

  test("per-source aggregation counts planted failures next to passes") {
    val g = gateCounts(Seq(
      (1L, cleanText), (2L, cleanText),
      (3L, Seq.fill(60)("lorem").mkString(" "))))
    assert(g("n_docs") === 3)
    assert(g("n_pass_all") === 2)
    assert(g("n_fail_stopwords") === 1)
  }
}
