package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked retrieval over the corpus: BM25 (Robertson/Spärck Jones — the
  * standard probabilistic relevance function, public in every IR
  * textbook). A training-data pipeline runs this shape for query-based
  * corpus selection ("find documents relevant to these seed terms") and
  * for retrieval-augmented eval-set construction.
  *
  * Scale shape: the corpus pass explodes tokens but filters to the
  * query's terms BEFORE any shuffle, so the aggregation carries only
  * matching (doc, term) rows — vocabulary size and document length never
  * hit the wire. Document-frequency and corpus statistics are
  * term-count- and single-row-sized; both broadcast. Two passes over the
  * corpus total (term match + corpus stats), both scan-and-aggregate
  * with no wide intermediate.
  *
  * Determinism: per-term contributions are quantized to integer
  * micro-units (×1e6, rounded) BEFORE the per-document sum, so the
  * cross-document ranking is an exact BIGINT comparison — immune to
  * float-summation order and to the last-ulp differences between ln()
  * implementations across engines (same convention as the ANN family's
  * 6-dp rank quantization).
  */
object Retrieval {

  /** Word tokens under the shingle-family convention ([[Hashing.words]]:
    * edge-strip, split on whitespace runs, drop empties) — one pass,
    * mirrored in oracles by CorpusQueries.wordsExpr.
    */

  /** Top-k documents by BM25 score for a bag of query terms.
    * Output: (rank, doc_id, score_micro) — score in integer micro-units.
    *
    * k1/b are the standard defaults (1.2, 0.75). IDF is the
    * non-negative "+1" variant: ln(1 + (N - df + 0.5) / (df + 0.5)).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val withDl = docs.select(col(idCol).as("id"),
        graft.functions.Tokenize(col(textCol)).as("w"))
      .withColumn("dl", size(col("w")))

    // corpus statistics: one row; joined in by (trivially broadcast)
    // cross join. Exact integer inputs (count, token sum) — avgdl is the
    // one double, derived identically in the oracle.
    val stats = withDl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))

    // (doc, term) term frequencies: tokens filtered to the query's terms
    // BEFORE the aggregation shuffle
    val termSet = typedLit(terms)
    val tf = withDl
      .select(col("id"), col("dl"), explode(col("w")).as("tok"))
      .filter(array_contains(termSet, col("tok")))
      .groupBy(col("id"), col("tok"), col("dl")) // dl determined by id
      .agg(count(lit(1)).as("tf"))

    // per-term document frequency as a window over the (already tiny,
    // already shuffled) tf frame — one row per (doc, term), so the count
    // per term IS the document frequency. A groupBy-and-join-back
    // formulation re-plans the corpus pass a third time (Catalyst
    // specializes each reference); the window costs one |tf|-sized
    // exchange instead of a corpus scan.
    val withDf = tf.withColumn("df", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("tok"))))

    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    // operand order mirrors the oracle SQL exactly (dl/avgdl*b + (1-b))
    // so both engines execute the same double-op sequence
    val contrib = idf * (col("tf") * (k1 + 1.0)) /
      (col("tf") + (col("dl").cast("double") / avgdl * b + (1.0 - b)) * k1)

    val scored = withDf
      .crossJoin(broadcast(stats))
      .withColumn("micro", round(contrib * 1e6, 0).cast("long"))
      .groupBy(col("id"))
      .agg(sum(col("micro")).as("score_micro"))

    // top-k via a per-partition heap (TakeOrderedAndProject), then rank
    // the k survivors via BoundedRank (broadcast self-join count) — no
    // unpartitioned window anywhere in the plan
    val top = scored
      .orderBy(col("score_micro").desc, col("id"))
      .limit(k)
    graft.ops.BoundedRank.attach(top, "rank",
        Seq("score_micro" -> true, "id" -> false))
      .select(col("rank"), col("id").as("doc_id"), col("score_micro"))
      .orderBy(col("rank"))
  }
}
