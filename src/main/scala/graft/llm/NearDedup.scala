package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate detection at corpus scale: MinHash + banded LSH and
  * SimHash. Both are shuffle-bounded — candidate generation never
  * enumerates all pairs (the all-pairs join is O(n²) and impossible at
  * 100 TB; the band join shuffles 'bands-per-doc' rows and only docs
  * agreeing on a full band ever meet).
  *
  * Signatures are computed by one-pass JVM UDFs (see [[Hashing]] for why
  * expressions are the wrong tool here); everything relational around
  * them — explode, band shuffle, bucket join, verify join — is plain
  * Catalyst-planned DataFrame algebra.
  */
object MinHashLsh {

  /** Number of hash functions = bands × rows. r=4/b=32 puts the LSH
    * S-curve threshold at (1/b)^(1/r) ≈ 0.42 with miss probability
    * (1-J^r)^b ≈ 1.5e-15 at J=0.9 — effectively perfect recall for the
    * 0.8+ near-dup range, at a false-candidate rate (J≈0.05 background)
    * of ~2e-4 per pair, which the exact-Jaccard verify step then prunes.
    */
  val Rows = 4
  val Bands = 32

  /** Band keys only — docs with an empty shingle set (null text, <n
    * words) return null, which explode drops: they can never be
    * near-duplicate candidates and would otherwise all collide on the
    * empty-set signature.
    */
  private def bandsUdf(shingleN: Int) = udf { (text: String) =>
    val sh = if (text == null) Array.empty[String]
      else Hashing.shingles(text, shingleN)
    if (sh.isEmpty) null
    else Hashing.bandHashes(Hashing.minhashSignature(sh, Rows * Bands), Rows)
  }

  /** Verified near-duplicate pairs (i < j, exact Jaccard ≥ threshold).
    *
    * Plan shape: docs → one UDF pass (band keys only) → explode bands →
    * shuffle by band key → collect ids per bucket → expand in-bucket
    * pairs → distinct pair → join TEXT back for the candidate ids →
    * shingle + exact Jaccard on the candidate rows only.
    *
    * The input is evaluated exactly TWICE — once for the band pass, once
    * for the text fetch — and that bound is structural, not an
    * AQE-exchange-reuse hope: candidate pairs come from one
    * groupBy(band, h) + in-bucket expansion (a self-join would evaluate
    * the band pass per side, and at small SF Spark happily broadcasts
    * the whole corpus chain to build it), and the text fetch explodes
    * each pair into its two member ids so ONE join against the source
    * covers both sides. When the caller's input is itself an expensive
    * subplan (quality filters, dedup windows — see DedupQueries'
    * pipelines), each avoided re-evaluation is a full corpus re-scan.
    *
    * Nothing is cached: the band shuffle carries compact (id, hash)
    * pairs, and the verify step re-reads text for just the candidate
    * ids. At 100 TB this is the only workable lifecycle — caching full
    * shingle arrays for the corpus is not. Per-bucket id lists are
    * bounded by the S-curve math above (a band bucket collects only docs
    * agreeing on r consecutive minhashes); a pathological cluster of
    * thousands of true duplicates concentrates in buckets — and in
    * candidate pairs — under ANY pair-enumeration scheme; cluster-scale
    * dedup wants keep-first-per-bucket, not all pairs.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3): DataFrame = {
    val src = docs.select(col(idCol).as("id"), col(textCol).as("txt"))
    val buckets = src.select(col("id"),
      posexplode(bandsUdf(shingleN)(col("txt"))).as(Seq("band", "h")))
    val candidates = buckets
      .groupBy(col("band"), col("h"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("i"), col("ids"))
      .select(col("i"), explode(col("ids")).as("j"))
      .filter(col("i") < col("j"))
      .distinct()
    verifyPairs(src, candidates, threshold, shingleN)
  }

  /** Exact-Jaccard verification of candidate (i, j) pairs against the
    * (id, txt) source. One text join covers both pair sides: explode
    * (i, j) into member rows, fetch txt per member, fold back per pair.
    * The when-max fold is safe because band keys exist only for docs
    * with non-null text. Shingling is the codegen
    * [[graft.functions.Shingles]] expression (same `Hashing.shingles`
    * convention, same null→empty contract as the udf it replaced —
    * the udf paid a serialization boundary on every LSH/containment
    * verify and split whole-stage codegen around it).
    */
  private def verifyPairs(src: DataFrame, candidates: DataFrame,
      threshold: Double, shingleN: Int): DataFrame =
    candidates
      .select(col("i"), col("j"), explode(array(col("i"), col("j"))).as("id"))
      .join(src, "id")
      .groupBy(col("i"), col("j"))
      .agg(max(when(col("id") === col("i"), col("txt"))).as("txt_i"),
        max(when(col("id") === col("j"), col("txt"))).as("txt_j"))
      .withColumn("jaccard",
        TextAnalysis.jaccard(TextAnalysis.shingles(col("txt_i"), shingleN),
          TextAnalysis.shingles(col("txt_j"), shingleN)))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), round(col("jaccard"), 3).as("jaccard"))

  /** INCREMENTAL index maintenance: yesterday's verified pairs plus a
    * new-docs batch → today's full pair set, WITHOUT re-pairing the old
    * corpus. Band keys are computed for the new docs and joined against
    * the whole corpus's band index (old + new); only candidates with a
    * new member are verified, and the union with `oldPairs` is provably
    * the full recompute: a qualifying pair is either old×old (its band
    * collision exists within the old corpus alone, so it is in
    * `oldPairs`) or involves a new doc (caught by the new-vs-all band
    * join). At 100 TB this is the daily-crawl lifecycle — the index
    * side ships (id, band, hash) rows only, the old corpus's text is
    * touched just for verified candidates, and cost scales with
    * |new| · collision-rate, not |corpus|².
    */
  def nearDupPairsIncremental(oldDocs: DataFrame, oldPairs: DataFrame,
      newDocs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3): DataFrame =
    nearDupPairsFromIndex(oldDocs,
      bandKeys(oldDocs, idCol, textCol, shingleN), oldPairs,
      newDocs, bandKeys(newDocs, idCol, textCol, shingleN),
      idCol, textCol, threshold, shingleN)

  /** The persistable band index for a document frame: one (id, band, h)
    * row per band key. A long-lived index store (e.g. the streaming
    * [[graft.streaming.DocStream.maintainLshIndex]] sink) appends each
    * batch's keys ONCE and reuses them forever — recomputing minhash
    * signatures for the whole corpus per increment would make every
    * increment O(|corpus|) UDF work.
    */
  def bandKeys(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3): DataFrame =
    docs.select(col(idCol).as("id"),
      posexplode(bandsUdf(shingleN)(col(textCol))).as(Seq("band", "h")))

  /** [[nearDupPairsIncremental]] with the band passes precomputed
    * ([[bandKeys]] schema). The old corpus's TEXT is still the verify
    * source for candidates touching old docs — a column fetch for just
    * the candidate ids, never a signature recompute.
    */
  def nearDupPairsFromIndex(oldDocs: DataFrame, oldBands: DataFrame,
      oldPairs: DataFrame, newDocs: DataFrame, newBands: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      shingleN: Int = 3): DataFrame = {
    def prep(df: DataFrame) =
      df.select(col(idCol).as("id"), col(textCol).as("txt"))
    val src = prep(oldDocs).unionByName(prep(newDocs))
    val allB = oldBands.unionByName(newBands)
    val candNew = newBands.select(col("band"), col("h"), col("id").as("a"))
      .join(allB.select(col("band"), col("h"), col("id").as("b")),
        Seq("band", "h"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("i"),
        greatest(col("a"), col("b")).as("j"))
      .distinct()
    oldPairs.select(col("i"), col("j"), col("jaccard"))
      .unionByName(verifyPairs(src, candNew, threshold, shingleN))
      .distinct()
  }
}

/** Winnowing-based overlap detection: documents sharing selected
  * fingerprints ([[Hashing.winnow]]) share actual text runs — the
  * MOSS/plagiarism-detection complement to MinHash's set-similarity view
  * (MinHash scores bag overlap; winnowing localizes CONTIGUOUS shared
  * runs, which is what contamination checks against a training corpus
  * need).
  */
object Winnowing {

  private def fps(n: Int, w: Int)(c: org.apache.spark.sql.Column) =
    TextAnalysis.winnowedFingerprints(c, n, w)

  /** Benchmark decontamination: corpus documents sharing ≥ `minShared`
    * winnowed fingerprints with ANY benchmark document. The benchmark
    * side is small by definition (an eval set), so its distinct
    * fingerprint set is broadcast — the corpus side streams through a
    * broadcast hash join with no shuffle at all, which is the shape that
    * lets a contamination check ride along a 100 TB ingest scan.
    */
  def contaminated(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, minShared: Int = 2, n: Int = 3,
      window: Int = 4): DataFrame = {
    val benchFps = benchmark
      .select(explode(fps(n, window)(col(textCol))).as("fp"))
      .distinct()
    corpus
      .select(col(idCol).as("id"), explode(fps(n, window)(col(textCol))).as("fp"))
      .join(broadcast(benchFps), "fp")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** [[contaminated]] for the scale where even the benchmark fingerprint
    * set no longer broadcasts as an exact hash set (a multi-billion-
    * fingerprint held-out corpus): build a Bloom filter over the
    * benchmark fingerprints (distributed aggregation — only the compact
    * bitset reaches the driver, same contract as IVF's centroids), use
    * it as a pre-filter on the corpus side, then verify the few
    * survivors with an exact join so Bloom false positives never reach
    * the output. Result is bit-identical to [[contaminated]] — the
    * sketch changes WHERE the pruning happens (before the shuffle, at
    * ~10 bits/item instead of the full string set), not WHAT qualifies.
    *
    * The same shape Spark's own runtime row-level filtering
    * (InjectRuntimeFilter) uses for big joins: sketch the build side,
    * prune the probe side early, keep the exact join for correctness.
    */
  def contaminatedBloom(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, minShared: Int = 2, n: Int = 3,
      window: Int = 4, expectedFps: Long = 1000000L,
      fpp: Double = 0.03): DataFrame = {
    val benchFps = benchmark
      .select(explode(fps(n, window)(col(textCol))).as("fp"))
      .distinct()
    val bloom = benchFps.stat.bloomFilter("fp", expectedFps, fpp)
    val bloomBc = corpus.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((fp: String) => bloomBc.value.mightContainString(fp))
    corpus
      .select(col(idCol).as("id"), explode(fps(n, window)(col(textCol))).as("fp"))
      .filter(mightContain(col("fp")))
      .join(benchFps, "fp") // exact verify: Bloom false positives drop here
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Pairs (i < j) sharing ≥ `minShared` winnowed fingerprints.
    *
    * Plan shape: one UDF pass → explode fingerprints → shuffle by
    * fingerprint → collect ids per fingerprint (which IS the
    * doc-frequency filter: list size = df) → expand in-bucket pairs →
    * count shared per pair. One grouped aggregation replaces the
    * window-df-filter + self-join formulation, so the winnowing UDF runs
    * exactly once over the corpus and candidate generation stays
    * bucket-bounded — never all-pairs. The df cap drops
    * non-discriminative fingerprints (ubiquitous boilerplate runs): a
    * fingerprint in k docs creates k(k−1)/2 candidate rows, so one hot
    * bucket would otherwise re-create the quadratic blowup (and an
    * unbounded id list); dropping it loses only evidence that couldn't
    * distinguish documents anyway.
    */
  def overlapPairs(docs: DataFrame, idCol: String, textCol: String,
      minShared: Int = 5, n: Int = 3, window: Int = 4,
      maxDf: Int = 1000): DataFrame = {
    docs
      .select(col(idCol).as("id"), explode(fps(n, window)(col(textCol))).as("fp"))
      .groupBy(col("fp"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxDf))
      .select(explode(col("ids")).as("i"), col("ids"))
      .select(col("i"), explode(col("ids")).as("j"))
      .filter(col("i") < col("j"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}

/** SimHash: 64-bit locality-sensitive fingerprint — near-identical docs
  * differ in few bits. Hamming-ball search via the pigeonhole band trick:
  * distance ≤ d pairs must agree on ≥1 of d+1 signature chunks, so
  * chunk-equality buckets bound the candidate set (again: never all
  * pairs).
  */
object SimHash {

  def hammingDistance(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    bit_count(a.bitwiseXOR(b))

  /** Generic hamming-ball pair search over precomputed 64-bit signatures
    * — the pigeonhole bucketing shared by text SimHash and the
    * multimodal perceptual-hash dedup ([[Multimodal]]): distance ≤ d
    * pairs agree on ≥1 of d+1 signature chunks, so chunk-equality
    * buckets bound the candidate set. Input must already exclude
    * degenerate signatures (see [[simhashUdf]]'s null guard).
    */
  def hammingPairs(sigs: DataFrame, idCol: String, sigCol: String,
      maxDist: Int): DataFrame = {
    val chunks = maxDist + 1
    val width = 64 / chunks
    // not cached: the chunk-key frame self-joins on identical subplans,
    // so AQE reuses the one shuffle exchange — recomputing the cheap
    // one-pass signature beats holding corpus-sized blocks with no
    // unpersist point (the returned frame is lazy)
    val base = sigs.select(col(idCol).as("id"), col(sigCol).as("sig"))
    val chunkKeys = (0 until chunks).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("sig"), c * width)
          .bitwiseAND(lit((1L << width) - 1)).as("bits"))
    }
    val keys = base.select(col("id"), col("sig"),
      explode(array(chunkKeys: _*)).as("bk"))
    keys.as("l")
      .join(keys.as("r"), col("l.bk") === col("r.bk") && col("l.id") < col("r.id"))
      .select(col("l.id").as("i"), col("r.id").as("j"),
        hammingDistance(col("l.sig"), col("r.sig")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** Pairs within hamming distance `maxDist`, found via d+1 chunk-equality
    * buckets and verified exactly. The signature is the codegen
    * [[TextAnalysis.simhashSig]] (formerly a udf here); its NULL for
    * null/sub-3-word docs is filtered out — all of them would simhash
    * to 0 and pairwise-collide in every pigeonhole chunk, an O(m²)
    * candidate blowup with garbage output (the MinHash empty-set guard).
    */
  def nearPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame =
    hammingPairs(
      docs.select(col(idCol).as("id"),
          TextAnalysis.simhashSig(col(textCol), 3).as("sig"))
        .filter(col("sig").isNotNull),
      "id", "sig", maxDist)
}

/** Exact repeated-span detection — the distributed surrogate for
  * suffix-array exact-substring dedup (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL'22: remove any
  * substring occurring more than once in the corpus). A suffix array is
  * a single-node structure; the shuffle-native equivalent is positional
  * n-gram fingerprints: any repeated run of ≥ n words shares at least
  * one repeated n-gram, so flagging repeated n-grams and counting the
  * word positions they cover yields per-document repeated-span coverage
  * with one corpus pass and one fingerprint-keyed shuffle.
  *
  * Cost shape at 100 TB: the gram stream is |tokens| rows but carries
  * only (doc_id, pos, 16-hex fp); repetition flagging is a window count
  * partitioned by fp (no global sort, no self-join); the coverage
  * explode is proportional to FLAGGED windows only (the duplicate tail,
  * not the corpus). A pathological common-phrase fp concentrates its
  * occurrences in one fp-partition — ordinary aggregation skew, handled
  * by AQE, never a cross product.
  */
object RepeatedSpans {
  import org.apache.spark.sql.expressions.Window

  /** Per-document repeated-span coverage: documents containing at least
    * one word n-gram that occurs more than once corpus-wide (including
    * twice within one document — the paper's criterion), with the count
    * of flagged windows and of distinct word positions they cover.
    */
  def coverage(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val grams = docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.gramHashes(col(textCol), n))
          .as(Seq("pos", "fp")))
    val flagged = grams
      .withColumn("occ", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .filter(col("occ") > 1)
      .select(col("doc_id"), col("pos"))
    // Two countDistincts plan an Expand (x2 input), but the input here is
    // the flagged tail only — bounded by actual duplication, not corpus
    // size.
    val cov = flagged
      .select(col("doc_id"), col("pos"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("cv"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("pos")).as("n_rep_windows"),
        count_distinct(col("cv")).as("n_rep_tokens"))
    docs.select(col(idCol).as("doc_id"),
        size(graft.functions.Tokenize(col(textCol))).cast("long")
          .as("n_tokens"))
      .join(cov, "doc_id")
  }
}
