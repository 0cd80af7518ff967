package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the LLM-pipeline operators whose outputs are engine-defined
  * (hash-seeded) and therefore carry no SQL oracle.
  */
class NearDedupSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("minhash-lsh finds exactly the brute-force near-dup pairs") {
    import spark.implicits._
    // brute-force ground truth with the same shingle/jaccard operators
    val sh = docs.select(col("doc_id"), TextAnalysis.shingles(col("text")).as("sh"))
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", TextAnalysis.jaccard(col("a.sh"), col("b.sh")))
      .filter(col("j") >= 0.8)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
    val lsh = MinHashLsh.nearDupPairs(docs, "doc_id", "text", 0.8)
      .select(col("i"), col("j")).as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty) // the data does contain planted near-dups
    assert(lsh === brute)
  }

  test("simhash: identical docs distance 0; near-dups close; random docs far") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val c = "completely unrelated text about spark catalyst optimizer internals"
    def sig(t: String) = Hashing.simhash(Hashing.shingles(t, 3))
    assert(sig(a) === sig(a))
    val nearDist = java.lang.Long.bitCount(sig(a) ^ sig(b))
    val farDist = java.lang.Long.bitCount(sig(a) ^ sig(c))
    assert(nearDist < 16, s"near pair distance $nearDist")
    assert(farDist > 16, s"unrelated distance $farDist")
  }

  test("simhash pairs are a subset of minhash pairs on the corpus") {
    import spark.implicits._
    val sim = SimHash.nearPairs(docs, "doc_id", "text", maxDist = 3)
      .select(col("i"), col("j")).as[(Long, Long)].collect().toSet
    val mh = MinHashLsh.nearDupPairs(docs, "doc_id", "text", 0.8)
      .select(col("i"), col("j")).as[(Long, Long)].collect().toSet
    assert(sim.nonEmpty)
    assert(sim.subsetOf(mh), s"simhash-only pairs: ${sim -- mh}")
  }

  test("minhash signature: identical shingle sets → identical signatures") {
    val s1 = Hashing.minhashSignature(Array("a b c", "b c d", "c d e"), 128)
    val s2 = Hashing.minhashSignature(Array("c d e", "a b c", "b c d"), 128)
    assert(s1.toSeq === s2.toSeq) // order-invariant
    val s3 = Hashing.minhashSignature(Array("a b c", "b c d", "x y z"), 128)
    val agree = s1.zip(s3).count { case (x, y) => x == y }
    // E[agreement] = J(s1,s3) = 2/4 = 0.5 over 128 hashes
    assert(agree > 128 * 0.25 && agree < 128 * 0.75, s"agreement $agree/128")
  }
}

class AnnSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("cosine: unit properties") {
    assert(math.abs(Hashing.cosine(Array(1f, 0f), Array(1f, 0f)) - 1.0) < 1e-12)
    assert(math.abs(Hashing.cosine(Array(1f, 0f), Array(0f, 1f))) < 1e-12)
    assert(math.abs(Hashing.cosine(Array(1f, 2f), Array(2f, 4f)) - 1.0) < 1e-12)
  }

  test("ivf top-k recall vs brute force") {
    import spark.implicits._
    val q = emb.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val brute = pairs(Ann.bruteTopK(emb, q, "vec_id", "embedding", 5))
    val ivf = pairs(Ann.ivfTopK(emb, q, "vec_id", "embedding", 5))
    val recall = (brute & ivf).size.toDouble / brute.size
    // k-means centroids + 4-probe: substantially above the r2 single-
    // probe first-N-seed quantizer (which only had to clear 0.2)
    assert(recall >= 0.4, s"ivf top-5 recall $recall")
    assert(ivf.size === brute.size)
    // rank-1 recall is the headline IVF quality number
    val brute1 = pairs(Ann.bruteTopK(emb, q, "vec_id", "embedding", 1))
    val ivf1 = ivf // rank-1 hit = true NN present anywhere in ivf top-5
    val hit1 = brute1.count(ivf1.contains).toDouble / brute1.size
    assert(hit1 >= 0.6, s"ivf rank-1 recall $hit1")
  }

  test("ivf: k-means cells don't degenerate on skewed data") {
    import spark.implicits._
    // 64 near-identical vectors (a hot cluster) + 64 spread vectors:
    // multi-probe search must still return full k for spread queries
    val rows = (0 until 128).map { i =>
      if (i < 64) (i.toLong, Array.tabulate(8)(d => 1f + (if (d == 0) i * 1e-4f else 0f)))
      else (i.toLong, Array.tabulate(8)(d => math.sin(i * 7 + d * 3).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Ann.ivfTopK(df, df.filter(col("vec_id") >= 64), "vec_id",
      "embedding", k = 3, nCells = 8)
    val counts = out.groupBy(col("query_id")).count()
      .select(col("count")).as[Long].collect()
    assert(counts.length === 64 && counts.forall(_ === 3L),
      s"queries with <k results: ${counts.count(_ != 3L)}")
  }

  test("lsh top-k candidates rank correctly and recall rank-1 decently") {
    import spark.implicits._
    val q = emb.filter(col("vec_id") < 20)
    val brute1 = Ann.bruteTopK(emb, q, "vec_id", "embedding", 1)
      .select(col("query_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val lsh = Ann.lshTopK(emb, q, "vec_id", "embedding", 5, tables = 8, bits = 8)
    val lshAll = lsh.select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val hit = brute1.count(lshAll.contains).toDouble / brute1.size
    // sign-LSH on weakly-clustered 64-dim data: the nearest neighbor is
    // only marginally closer than the bulk, so single-probe recall is
    // modest by nature; the spec pins it above chance (candidate sets
    // cover ~15% of the corpus → random recall ≈ 0.15)
    assert(hit >= 0.3, s"rank-1 recall $hit")
    // within-candidate ordering must be by true cosine: rank 1 beats rank 2
    val scores = lsh.select(col("query_id"), col("rank"), col("score"))
      .as[(Long, Int, Double)].collect().groupBy(_._1)
    scores.values.foreach { rows =>
      val sorted = rows.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.drop(1)).forall { case (a, b) => a >= b })
    }
  }
}

class MultimodalSpec extends SparkSpec {

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("binary media plumbing: schema, payload determinism, batch decode") {
    implicit val s = spark
    val media = Multimodal.synthesize(docs, "doc_id", "text")
    val row = media.filter(col("media_id") === 0).collect()(0)
    assert(row.getAs[Array[Byte]]("media").length === 16) // md5 payload
    assert(Seq("png", "jpeg", "wav").contains(row.getAs[String]("format")))

    val feats = Multimodal.extractFeatures(media, dims = 8)
    val f = feats.filter(col("media_id") === 0).collect()(0)
    assert(f.n_bytes === 16)
    assert(f.features.length === 8)
    // deterministic: same payload → same features on recompute
    val f2 = Multimodal.extractFeatures(media, dims = 8)
      .filter(col("media_id") === 0).collect()(0)
    assert(f.features.toSeq === f2.features.toSeq)
  }

  test("codec stubs: resize and frame-sampling shapes") {
    val payload = Array.tabulate(100)(_.toByte)
    assert(Multimodal.MediaCodec.resize(payload, 4, 5).length === 20)
    assert(Multimodal.MediaCodec.sampleFrames(payload, 10).length === 10)
    val feats = Multimodal.MediaCodec.decodeToFeatures(payload, 4)
    assert(feats.length === 4 && feats.sum > 0)
  }

  test("sampleFrameCounts: ceil(len/N) per payload through batched decode") {
    implicit val s = spark
    import spark.implicits._
    val media = Seq(
      (1L, Array.tabulate(10)(_.toByte), "wav"), // indices 0,4,8 → 3
      (2L, Array.empty[Byte], "wav"),
      (3L, Array.tabulate(16)(_.toByte), "png"))
      .toDF("media_id", "media", "format")
    val got = Multimodal.sampleFrameCounts(media, everyN = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got === Map(1L -> 3, 2L -> 0, 3L -> 4))
  }
}

class TextAnalysisSpec extends SparkSpec {

  test("tokenCount/subwordCount/ratios on literal rows") {
    import spark.implicits._
    val df = Seq("hello world  foo", "a b", "", "one,two 3").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")).as("tc"),
      TextAnalysis.subwordCount(col("text")).as("sc"),
      TextAnalysis.alphaRatio(col("text")).as("ar")).collect()
    assert(r(0).getInt(0) === 3)
    assert(r(1).getInt(0) === 2)
    assert(r(2).getInt(0) === 0)
    assert(r(3).getInt(0) === 2) // whitespace tokens
    assert(r(3).getInt(1) === 4) // one | , | two | 3
    assert(math.abs(r(1).getAs[Double]("ar") - 2.0 / 3.0) < 1e-12)
  }

  test("langId picks marker-heavy language, und when no markers") {
    import spark.implicits._
    val df = Seq(
      "the cat and the dog is here",
      "der hund und die katze ist da",
      "le chat et la table est grande",
      "el perro y los gatos es grande",
      "xyzzy plugh quux").toDF("text")
    val out = df.select(TextAnalysis.langId(col("text"))).collect().map(_.getString(0))
    assert(out.toSeq === Seq("en", "de", "fr", "es", "und"))
  }

  test("chunkByTokens: boundaries, remainder chunk, roundtrip") {
    import spark.implicits._
    val text = (1 to 70).map(i => s"w$i").mkString(" ")
    val chunks = Seq(text).toDF("t")
      .select(TextAnalysis.chunkByTokens(col("t"), 32)).collect()(0)
      .getSeq[String](0)
    assert(chunks.length === 3) // 32 + 32 + 6
    assert(chunks(0).split(" ").length === 32)
    assert(chunks(2).split(" ").length === 6)
    assert(chunks.mkString(" ") === text) // lossless packing
  }

  test("sampleByHash: deterministic, append-stable, near the target rate") {
    import spark.implicits._
    val ids = (0L until 10000L).toDF("id")
    val kept1 = ids.filter(TextAnalysis.sampleByHash(col("id"), 100))
      .collect().map(_.getLong(0)).toSet
    val kept2 = ids.filter(TextAnalysis.sampleByHash(col("id"), 100))
      .collect().map(_.getLong(0)).toSet
    assert(kept1 === kept2) // reproducible
    assert(kept1.size > 800 && kept1.size < 1200, s"rate ${kept1.size}/10000")
    // append-stability: the same rows stay kept in a larger corpus
    val keptBig = (0L until 20000L).toDF("id")
      .filter(TextAnalysis.sampleByHash(col("id"), 100))
      .collect().map(_.getLong(0)).toSet
    assert(kept1.subsetOf(keptBig))
  }

  test("fingerprint: whitespace/case-insensitive, content-sensitive") {
    import spark.implicits._
    val df = Seq(("A  B\tC", 1), ("a b c", 2), ("a b d", 3)).toDF("text", "id")
    val fps = df.select(TextAnalysis.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }
}
