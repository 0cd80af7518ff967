package graft.streaming

import graft.llm.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming document CURATION — the batch training-data gates
  * ([[graft.llm.CorpusQueries]] family) as a continuous ingest stage.
  * A crawl pipeline at 100 TB doesn't re-run batch curation over the
  * full corpus per day; new documents stream through the same gates the
  * batch pipeline defines, and only survivors land in the training
  * store. The quality and decontamination gates are STATELESS per
  * micro-batch (pure predicates, broadcast benchmark set); the exact
  * dedup gate holds one fingerprint key per distinct surviving document
  * — corpus-keyed state, evictable only by a watermark horizon (the
  * [[dedupExact]] contract spells out both modes). Near-dup LSH
  * clustering stays out of the state store entirely: its corpus-sized
  * index lives in parquet ([[maintainLshIndex]]).
  *
  * Semantics are shared with the batch pipelines by construction: the
  * quality gate calls the same [[TextAnalysis]] expressions, the
  * decontamination gate applies the same positional-5-gram hit-RATIO
  * rule (≥ 10%) as `docs_training_pipeline_v5`, and the dedup key is
  * the same [[TextAnalysis.fingerprint]]. One documented divergence:
  * the stream keeps the first ARRIVAL per fingerprint (append mode
  * cannot retract an emitted row), while the batch keep-first window
  * keeps the lowest doc_id — identical whenever delivery is id-ordered,
  * and identical in the surviving fingerprint SET always.
  */
object DocStream {

  /** One streamed document (the `documents` table's curation columns). */
  final case class Doc(doc_id: Long, text: String, lang: String,
      source: String)

  private def pathExists(spark: SparkSession, dir: String): Boolean =
    graft.util.Fs.exists(spark, dir)

  /** Quality gate: same predicates as the v5 pipeline's first stage
    * (token count ≥ minTokens, alpha ratio ≥ minAlpha), stateless. */
  def qualityGate(docs: DataFrame, minTokens: Int = 10,
      minAlpha: Double = 0.5): DataFrame =
    docs.filter(
      TextAnalysis.tokenCount(col("text")) >= minTokens &&
        TextAnalysis.alphaRatio(col("text")) >= minAlpha)

  /** Decontamination: drop streamed docs whose share of word-5-gram
    * fingerprints hitting the benchmark set reaches `maxHitBp` basis
    * points — the SAME integer-ratio rule (`n_hit * 10000 div n_grams
    * >= 1000`) as the batch `docs_training_pipeline_v5` gate, so a doc
    * that merely quotes one benchmark line is kept by both engines and
    * a copied doc is dropped by both. A streaming frame can't anti-join
    * against its own exploded grams (stream-stream anti joins are
    * unsupported, and per-doc re-aggregation would carry state), so the
    * gate is ROW-LOCAL: the benchmark fingerprint frame — static and
    * eval-sized by definition — collects once to a broadcast set and a
    * one-pass predicate computes each doc's hit ratio against it.
    * Driver/executor state is the eval set, independent of corpus
    * size; the filter is stateless per micro-batch.
    */
  def decontaminate(docs: DataFrame, benchFps: DataFrame,
      maxHitBp: Int = 1000): DataFrame = {
    val spark = docs.sparkSession
    val set = benchFps.select(col("fp")).collect()
      .map(_.getString(0)).toSet
    val bc = spark.sparkContext.broadcast(set)
    // DISTINCT grams (Hashing.shingles), md5-16 hashed — the batch v5
    // gate counts each doc's distinct grams, so the stream must too, or
    // repeated-gram docs compute a different ratio; docs too short for
    // any 5-gram have no ratio and are kept, the batch convention (they
    // never appear in its flagged frame)
    val contaminated = udf { (t: String) =>
      if (t == null) false
      else {
        val grams = graft.llm.Hashing.shingles(t, 5)
        grams.nonEmpty && {
          var hit = 0L
          grams.foreach(g =>
            if (bc.value.contains(graft.llm.Hashing.md5Hex16(g))) hit += 1)
          hit * 10000L / grams.length >= maxHitBp.toLong
        }
      }
    }
    docs.filter(!contaminated(col("text")))
  }

  /** Exact-content dedup across the stream: keep the first arrival of
    * each normalized-text fingerprint.
    *
    * State: one key per distinct surviving fingerprint. With
    * `eventTimeCol` set, the state store holds only the watermark
    * horizon's worth of keys (`dropDuplicatesWithinWatermark`) — the
    * bounded mode a forever-running ingest needs; re-arrivals farther
    * apart than `horizon` are NOT deduped (they are the batch
    * compaction's job). Without it, state grows by one key per distinct
    * document for the life of the query — exact global dedup, the right
    * mode for bounded replays and tests, the wrong one for an unbounded
    * crawl.
    */
  def dedupExact(docs: DataFrame, eventTimeCol: Option[String] = None,
      horizon: String = "24 hours"): DataFrame = {
    val keyed = docs.withColumn("fp", TextAnalysis.fingerprint(col("text")))
    val deduped = eventTimeCol match {
      case Some(ts) => keyed.withWatermark(ts, horizon)
        .dropDuplicatesWithinWatermark("fp")
      case None => keyed.dropDuplicates("fp")
    }
    deduped.drop("fp")
  }

  /** The full curation gate chain, composed in batch-pipeline order:
    * quality → decontamination → exact dedup. Pass `eventTimeCol` to
    * bound the dedup state for an unbounded stream. */
  def curate(docs: DataFrame, benchFps: DataFrame, minTokens: Int = 10,
      minAlpha: Double = 0.5, eventTimeCol: Option[String] = None,
      horizon: String = "24 hours"): DataFrame =
    dedupExact(decontaminate(qualityGate(docs, minTokens, minAlpha), benchFps),
      eventTimeCol, horizon)

  /** Streaming LSH index maintenance — the daily-crawl lifecycle as a
    * foreachBatch sink: every micro-batch of arriving documents appends
    * to the corpus store AND the band-signature store, and advances the
    * verified near-dup PAIR store via
    * [[graft.llm.MinHashLsh.nearDupPairsFromIndex]] — the old corpus's
    * signatures are READ from the signature store, never recomputed, so
    * per-batch UDF work is |batch| signatures and the join work is
    * |batch| · collision-rate, with no per-batch term proportional to
    * |corpus| beyond the index-store column scans. The near-dup state
    * the stateless curation gates can't hold (it is corpus-sized by
    * nature) lives in the three parquet stores, not the state store.
    *
    * Idempotent on replay: the batch anti-joins the corpus store by
    * doc_id before indexing, so a restarted micro-batch re-derives
    * nothing and re-appends nothing. The merged pair frame and the new
    * band keys are stage-checkpointed BEFORE any store is written (the
    * upsertSink overwrite-input rule).
    */
  def maintainLshIndex(docs: DataFrame, corpusDir: String, pairsDir: String,
      checkpoint: String, threshold: Double = 0.8,
      sigsDir: String = null)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val sDir = Option(sigsDir).getOrElse(pairsDir + "_sigs")
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        import graft.ops.Checkpoints.StageCheckpoint
        val oldDocs =
          if (pathExists(sp, corpusDir)) sp.read.parquet(corpusDir)
          else sp.emptyDataFrame
            .withColumn("doc_id", lit(0L)).withColumn("text", lit(""))
            .limit(0)
        val oldPairs =
          if (pathExists(sp, pairsDir)) sp.read.parquet(pairsDir)
          else sp.emptyDataFrame
            .withColumn("i", lit(0L)).withColumn("j", lit(0L))
            .withColumn("jaccard", lit(0.0)).limit(0)
        val oldBands =
          if (pathExists(sp, sDir)) sp.read.parquet(sDir)
          else sp.emptyDataFrame
            .withColumn("id", lit(0L)).withColumn("band", lit(0))
            .withColumn("h", lit(0L)).limit(0)
        val newDocs = batch.select(col("doc_id"), col("text"))
          .dropDuplicates("doc_id")
          .join(oldDocs.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .stageCheckpoint()
        val newBands = graft.llm.MinHashLsh
          .bandKeys(newDocs, "doc_id", "text")
          .stageCheckpoint() // one signature pass, reused by join + store
        val merged = graft.llm.MinHashLsh.nearDupPairsFromIndex(
            oldDocs, oldBands, oldPairs, newDocs, newBands,
            "doc_id", "text", threshold)
          .stageCheckpoint() // materialize BEFORE overwriting pairsDir
        merged.write.mode("overwrite").parquet(pairsDir)
        newBands.write.mode("append").parquet(sDir)
        newDocs.write.mode("append").parquet(corpusDir)
        ()
      }
      .start()
  }
}
