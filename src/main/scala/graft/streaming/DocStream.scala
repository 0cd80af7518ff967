package graft.streaming

import graft.llm.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document CURATION — the batch training-data gates
  * ([[graft.llm.CorpusQueries]] family) as a continuous ingest stage.
  * A crawl pipeline at 100 TB doesn't re-run batch curation over the
  * full corpus per day; new documents stream through the same gates the
  * batch pipeline defines, and only survivors land in the training
  * store. Every gate here is STATELESS per micro-batch (quality
  * predicates, broadcast decontamination) or watermark/exact-key
  * bounded (fingerprint dedup), so state never grows with corpus size —
  * the property that separates a streamable gate from a batch-only one
  * (near-dup LSH clustering stays batch: its candidate state is
  * corpus-sized by nature).
  *
  * Semantics are shared with the batch pipelines by construction: the
  * quality gate calls the same [[TextAnalysis]] expressions, the
  * decontamination join consumes the same distinct-fingerprint frame
  * `docs_training_pipeline_v5` builds, and the dedup key is the same
  * [[TextAnalysis.fingerprint]] — DocStreamSpec pins stream output ==
  * the batch gates applied to the same rows.
  */
object DocStream {

  /** One streamed document (the `documents` table's curation columns). */
  final case class Doc(doc_id: Long, text: String, lang: String,
      source: String)

  /** Quality gate: same predicates as the v5 pipeline's first stage
    * (token count ≥ minTokens, alpha ratio ≥ minAlpha), stateless. */
  def qualityGate(docs: DataFrame, minTokens: Int = 10,
      minAlpha: Double = 0.5): DataFrame =
    docs.filter(
      TextAnalysis.tokenCount(col("text")) >= minTokens &&
        TextAnalysis.alphaRatio(col("text")) >= minAlpha)

  /** Decontamination: drop streamed docs sharing ANY distinct word
    * 5-gram fingerprint with the benchmark — the same md5-16 gram
    * fingerprints the v5 batch pipeline builds. A streaming frame can't
    * anti-join against its own exploded grams (stream-stream anti joins
    * are unsupported, and per-doc re-aggregation would carry state), so
    * the gate is ROW-LOCAL: the benchmark fingerprint frame — static
    * and eval-sized by definition — collects once to a broadcast set
    * and a one-pass predicate tests each doc's grams against it.
    * Driver/executor state is the eval set, independent of corpus
    * size; the filter is stateless per micro-batch.
    */
  def decontaminate(docs: DataFrame, benchFps: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val set = benchFps.select(col("fp")).collect()
      .map(_.getString(0)).toSet
    val bc = spark.sparkContext.broadcast(set)
    // gramHashes = the shared md5-16 positional-gram primitive (same
    // hashes the batch gram chains and their DuckDB twins compute); an
    // any-hit test over positional grams equals one over distinct grams
    val contaminated = udf { (t: String) =>
      t != null && graft.llm.Hashing.gramHashes(t, 5).exists(bc.value.contains)
    }
    docs.filter(!contaminated(col("text")))
  }

  /** Exact-content dedup across the stream: keep the first arrival of
    * each normalized-text fingerprint. State is one key per DISTINCT
    * surviving document — the same keyed-state bound as the batch
    * keep-first, held in the state store. */
  def dedupExact(docs: DataFrame): DataFrame =
    docs.withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .dropDuplicates("fp")
      .drop("fp")

  /** The full curation gate chain, composed in batch-pipeline order:
    * quality → decontamination → exact dedup. */
  def curate(docs: DataFrame, benchFps: DataFrame, minTokens: Int = 10,
      minAlpha: Double = 0.5): DataFrame =
    dedupExact(decontaminate(qualityGate(docs, minTokens, minAlpha), benchFps))
}
