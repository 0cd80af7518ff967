package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins BM25 semantics on planted documents where the correct ordering
  * is derivable by hand: term frequency raises the score with
  * diminishing returns, document length normalizes it, and rarer terms
  * out-weigh common ones.
  */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  private def topIds(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.orderBy(col("rank")).select(col("doc_id")).as[Long].collect().toSeq

  test("bm25: more query-term hits rank higher; non-matching docs absent") {
    val docs = Seq(
      (1L, "cat cat cat dog bird"),
      (2L, "cat dog fish fish fish"),
      (3L, "fish fish fish fish fish"),
      (4L, "bird bird bird bird bird")
    ).toDF("doc_id", "text")
    val top = topIds(Retrieval.bm25TopK(docs, "doc_id", "text",
      terms = Seq("cat"), k = 10))
    // doc 1 (tf=3) above doc 2 (tf=1); docs 3/4 contain no query term
    assert(top === Seq(1L, 2L))
  }

  test("bm25: length normalization — same tf, shorter doc wins") {
    val filler = (1 to 95).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "cat cat alpha beta gamma"),
      (2L, s"cat cat $filler")
    ).toDF("doc_id", "text")
    val top = topIds(Retrieval.bm25TopK(docs, "doc_id", "text",
      terms = Seq("cat"), k = 10))
    assert(top === Seq(1L, 2L))
  }

  test("bm25: a rare term outweighs a ubiquitous one") {
    // "common" appears in every doc (idf ≈ ln(1 + 0.5/4.5) → tiny);
    // "rare" in one. The rare-term doc must outrank a common-only doc
    // even with lower tf.
    val docs = Seq(
      (1L, "common rare alpha beta"),
      (2L, "common common common alpha"),
      (3L, "common x y z"),
      (4L, "common p q r")
    ).toDF("doc_id", "text")
    val top = topIds(Retrieval.bm25TopK(docs, "doc_id", "text",
      terms = Seq("common", "rare"), k = 10))
    assert(top.head === 1L)
    assert(top.toSet === Set(1L, 2L, 3L, 4L))
  }

  test("bm25: deterministic ties break on doc_id") {
    val docs = Seq(
      (7L, "cat dog"), (3L, "cat dog"), (5L, "cat dog")
    ).toDF("doc_id", "text")
    val top = topIds(Retrieval.bm25TopK(docs, "doc_id", "text",
      terms = Seq("cat"), k = 10))
    assert(top === Seq(3L, 5L, 7L))
  }
}
