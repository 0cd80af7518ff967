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

  /** Streaming LSH index maintenance — the daily-crawl lifecycle as a
    * foreachBatch sink: every micro-batch of arriving documents appends
    * to the corpus store and advances the verified near-dup PAIR store
    * via [[graft.llm.MinHashLsh.nearDupPairsIncremental]] — only
    * new-vs-all band candidates are verified, so per-batch cost scales
    * with |batch| · collision-rate, never |corpus|². The near-dup state
    * the stateless curation gates can't hold (it is corpus-sized by
    * nature) lives in the two parquet stores, not the state store.
    *
    * Idempotent on replay: the batch anti-joins the corpus store by
    * doc_id before indexing, so a restarted micro-batch re-derives
    * nothing and re-appends nothing. The merged pair frame is
    * stage-checkpointed BEFORE overwriting its own input dir (the
    * upsertSink overwrite-input rule).
    */
  def maintainLshIndex(docs: DataFrame, corpusDir: String, pairsDir: String,
      checkpoint: String, threshold: Double = 0.8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        import graft.ops.Checkpoints.StageCheckpoint
        val corpusExists = new java.io.File(corpusDir).exists
        val oldDocs =
          if (corpusExists) sp.read.parquet(corpusDir)
          else batch.sparkSession.emptyDataFrame
            .withColumn("doc_id", lit(0L)).withColumn("text", lit(""))
            .limit(0)
        val oldPairs =
          if (new java.io.File(pairsDir).exists) sp.read.parquet(pairsDir)
          else batch.sparkSession.emptyDataFrame
            .withColumn("i", lit(0L)).withColumn("j", lit(0L))
            .withColumn("jaccard", lit(0.0)).limit(0)
        val newDocs = batch.select(col("doc_id"), col("text"))
          .dropDuplicates("doc_id")
          .join(oldDocs.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .stageCheckpoint()
        val merged = graft.llm.MinHashLsh.nearDupPairsIncremental(
            oldDocs, oldPairs, newDocs, "doc_id", "text", threshold)
          .stageCheckpoint() // materialize BEFORE overwriting pairsDir
        merged.write.mode("overwrite").parquet(pairsDir)
        newDocs.write.mode("append").parquet(corpusDir)
        ()
      }
      .start()
}
