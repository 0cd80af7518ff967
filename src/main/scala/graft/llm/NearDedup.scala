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

  private def shBandsUdf(shingleN: Int) = udf { (text: String) =>
    val sh = if (text == null) Array.empty[String]
      else Hashing.shingles(text, shingleN)
    val bands = Hashing.bandHashes(Hashing.minhashSignature(sh, Rows * Bands), Rows)
    (sh, bands)
  }

  /** Verified near-duplicate pairs (i < j, exact Jaccard ≥ threshold).
    *
    * Plan shape: docs → one UDF pass (shingles + band keys) → explode
    * bands → shuffle by band key → within-bucket self-join (candidates) →
    * distinct pair → join shingles back → exact-Jaccard filter. The
    * exact check uses native array_intersect/array_distinct over the
    * already-materialized shingle arrays.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3): DataFrame = {
    // cached: referenced three times (bucket explode + both sides of the
    // verify join) — without it the signature UDF pass runs 3×. The cache
    // lives until Spark's LRU evicts it (the returned frame is lazy, so
    // the operator can't unpersist); sessions running many instances can
    // spark.catalog.clearCache() between batches.
    val base = docs
      .select(col(idCol).as("id"), shBandsUdf(shingleN)(col(textCol)).as("sb"))
      .select(col("id"), col("sb._1").as("sh"), col("sb._2").as("bands"))
      .filter(size(col("sh")) > 0)
      .cache()
    val buckets = base.select(col("id"),
      posexplode(col("bands")).as(Seq("band", "h")))
    val candidates = buckets.as("l")
      .join(buckets.as("r"),
        col("l.band") === col("r.band") && col("l.h") === col("r.h") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("i"), col("r.id").as("j"))
      .distinct()
    candidates
      .join(base.select(col("id").as("i"), col("sh").as("sh_i")), "i")
      .join(base.select(col("id").as("j"), col("sh").as("sh_j")), "j")
      .withColumn("jaccard", TextAnalysis.jaccard(col("sh_i"), col("sh_j")))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), round(col("jaccard"), 3).as("jaccard"))
  }
}

/** SimHash: 64-bit locality-sensitive fingerprint — near-identical docs
  * differ in few bits. Hamming-ball search via the pigeonhole band trick:
  * distance ≤ d pairs must agree on ≥1 of d+1 signature chunks, so
  * chunk-equality buckets bound the candidate set (again: never all
  * pairs).
  */
object SimHash {

  private val simhashUdf = udf((text: String) =>
    Hashing.simhash(
      if (text == null) Array.empty[String] else Hashing.shingles(text, 3)))

  def hammingDistance(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    bit_count(a.bitwiseXOR(b))

  /** Pairs within hamming distance `maxDist`, found via d+1 chunk-equality
    * buckets and verified exactly.
    */
  def nearPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    val width = 64 / chunks
    // cached: the chunk-key frame self-joins, so the simhash pass would
    // otherwise run twice
    val base = docs
      .select(col(idCol).as("id"), simhashUdf(col(textCol)).as("sig"))
      .cache()
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
}
