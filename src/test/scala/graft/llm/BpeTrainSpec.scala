package graft.llm

import graft.{SparkEntry, SparkSpec}

/** Planted-vocabulary proof for `text_bpe_train_merges`: the greedy
  * left-to-right non-overlapping merge ("aaaa" → [aa, aa], never
  * [aa, a, a] or an overlapped triple-count), merge composition across
  * rounds, weighted-by-frequency argmax, and early exhaustion (fewer
  * than 10 rows when the vocabulary runs out of pairs).
  */
class BpeTrainSpec extends SparkSpec {

  import spark.implicits._

  private def trainOn(text: String): Seq[(Long, String, String, String, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Seq((1L, text, "en", "planted", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("text_bpe_train_merges")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
  }

  test("greedy non-overlap: aaaa segments to [aa, aa] and merges on") {
    // vocab: aaaa x3, b x1. Round 1: (a,a) appears 3 times per word,
    // weighted 9; greedy merge leaves [aa, aa], so round 2 sees exactly
    // ONE (aa, aa) pair per word (weight 3) — an overlapping count
    // would have claimed more, a non-greedy segmentation fewer.
    val m = trainOn("aaaa aaaa aaaa b")
    assert(m.take(2) === Seq(
      (1L, "a", "a", "aa", 9L),
      (2L, "aa", "aa", "aaaa", 3L)))
    // every later round has no adjacent pair left: early exhaustion
    assert(m.size === 2)
  }

  test("tokenize stats survive pair exhaustion (LEFT-join rounds, no row loss)") {
    // same corpus as above: pairs run out after round 2, so rounds 3-10
    // must pass the segmentation through unchanged — a cross join with
    // the empty argmax would erase it and null every total here.
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    val text = "aaaa aaaa aaaa b"
    Seq((1L, text, "en", "planted", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("text_bpe_tokenize_stats")(spark, dir)
      .collect()(0)
    // 4 words, 13 chars; aaaa fully merges to ONE token, b stays one
    assert(r.getLong(0) === 4L, "n_words")
    assert(r.getLong(1) === 13L, "n_chars")
    assert(r.getLong(2) === 4L, "n_tokens")
    assert(r.getLong(3) === 9L, "tokens_saved")
    assert(r.getLong(4) === 1000L, "fertility_milli")
  }

  test("frequency weighting and lexicographic tiebreak pick the argmax") {
    // 'ab' x2 vs 'cd' x2: tie on count 2 -> pair string "a b" < "c d".
    val m = trainOn("ab ab cd cd")
    assert(m.head === (1L, "a", "b", "ab", 2L))
    assert(m(1) === (2L, "c", "d", "cd", 2L))
  }

  test("merges compose: the learned token feeds later rounds") {
    // 'abc' x4: round 1 merges (a,b) (tie "a b" < "b c"), round 2 must
    // see the COMPOSED pair (ab, c), not any character pair.
    val m = trainOn("abc abc abc abc")
    assert(m.take(2) === Seq(
      (1L, "a", "b", "ab", 4L),
      (2L, "ab", "c", "abc", 4L)))
  }
}
