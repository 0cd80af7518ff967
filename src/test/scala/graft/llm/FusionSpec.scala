package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-data semantics for the round-7 retrieval/featurization
  * operators: RRF fusion, hashing-trick featurization,
  * temperature-scaled mixture sampling, and the containment join.
  */
class FusionSpec extends SparkSpec {

  import spark.implicits._

  private def credit(rank: Long, k: Int = 60): Long =
    if (rank <= 0) 0L else math.floor(1000000.0 / (k + rank)).toLong

  test("rrf: doc in both lists outranks docs in one; credits exact") {
    val bm = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "bm25_rank")
    val ann = Seq((20L, 1L), (40L, 2L), (30L, 4L)).toDF("doc_id", "ann_rank")
    val out = RetrievalQueries.rrfFuse(bm, ann, k = 10)
      .orderBy(col("rank"))
      .select("rank", "doc_id", "rrf_micro", "bm25_rank", "ann_rank")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    // every credit is the exact floor(1e6/(60+r)) sum
    out.foreach { case (_, _, micro, br, ar) =>
      assert(micro === credit(br) + credit(ar))
    }
    // doc 20 (ranks 2+1) and doc 30 (ranks 3+4) are in both lists;
    // doc 20 beats everything, and single-list docs order by their rank
    assert(out.map(_._2) === Seq(20L, 30L, 10L, 40L))
    // absent-list sentinel is rank 0 with zero credit
    val d10 = out.find(_._2 == 10L).get
    assert(d10._5 === 0L && d10._3 === credit(1))
  }

  test("rrf: ties break on doc_id, ranks are 1..n") {
    // two docs with identical single-list ranks in opposite lists
    val bm = Seq((7L, 1L)).toDF("doc_id", "bm25_rank")
    val ann = Seq((3L, 1L)).toDF("doc_id", "ann_rank")
    val out = RetrievalQueries.rrfFuse(bm, ann, k = 10)
      .orderBy(col("rank")).select("rank", "doc_id")
      .as[(Int, Long)].collect().toSeq
    assert(out === Seq((1, 3L), (2, 7L)))
  }

  test("feature hashing: buckets partition the token mass deterministically") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "beta delta"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = RetrievalQueries.featureHashProfile(docs, buckets = 8)
    val rows = out.select("bucket", "n_tokens", "n_distinct_tokens", "n_docs")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._2).sum === 6L) // total token occurrences
    assert(rows.forall(r => r._1 >= 0 && r._1 < 8))
    assert(rows.forall(r => r._3 >= 1 && r._4 >= 1))
    // deterministic: the same input hashes identically on a second run
    val again = RetrievalQueries.featureHashProfile(docs, buckets = 8)
      .select("bucket", "n_tokens", "n_distinct_tokens", "n_docs")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows === again)
    // 4 distinct tokens across all buckets (collisions can only merge)
    assert(rows.map(_._3).sum >= 4L - 3 && rows.map(_._3).sum <= 4L)
  }

  test("temperature mixture: sqrt-allocation upweights the small source") {
    // big source 400 docs, small source 25: α=0.5 rates are
    // M·sqrt(n_s)/(sum_sqrt·n_s) with M=212.5 → small source saturates
    // (rate>1 → keeps all), big source keeps well under natural share
    val docs = (1L to 400L).map(i => (i, "big")) ++
      (401L to 425L).map(i => (i, "small"))
    val df = docs.toDF("doc_id", "source")
    val out = RetrievalQueries.temperatureMixture(df)
      .select("source", "n_docs", "n_kept")
      .as[(String, Long, Long)].collect()
      .map { case (s, n, k) => (s, (n, k)) }.toMap
    val (nBig, keptBig) = out("big")
    val (nSmall, keptSmall) = out("small")
    assert(nBig === 400L && nSmall === 25L)
    // sum_sqrt = 20+5 = 25; rate_small = 212.5*5/(25*25) = 1.7 → saturates
    assert(keptSmall === 25L)
    // rate_big = 212.5*20/(25*400) = 0.425 — kept fraction must sit near
    // it (md5-uniform over 400 draws: ±10% absolute is generous)
    assert(keptBig > 100L && keptBig < 240L)
  }

  test("containment join: subset doc flagged directionally, unrelated not") {
    val contained = "the quick brown fox jumps over the lazy dog today"
    val container = contained +
      " and then continues with many additional trailing words that talk" +
      " about entirely different topics for quite a while longer"
    val docs = Seq(
      (1L, contained),
      (2L, container),
      (3L, "completely unrelated text about database engines and queries" +
        " running distributed aggregations with shuffle exchanges")
    ).toDF("doc_id", "text")
    val pairs = DedupQueries.containmentJoin(docs, theta10 = 8)
      .select("i", "j").as[(Long, Long)].collect().toSeq
    // 1's shingles all appear in 2 → (1,2); 2 is NOT contained in 1
    // (|2|≫|1|), and 3 shares nothing
    assert(pairs === Seq((1L, 2L)))
  }

  test("containment join: near-identical docs flag both directions") {
    val a = "one two three four five six seven eight nine ten"
    val docs = Seq((1L, a), (2L, a)).toDF("doc_id", "text")
    val pairs = DedupQueries.containmentJoin(docs, theta10 = 8)
      .select("i", "j").as[(Long, Long)].collect().toSeq.sorted
    assert(pairs === Seq((1L, 2L), (2L, 1L)))
  }
}
