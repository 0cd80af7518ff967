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

  test("topComponent: unit norm, variance-dominant over baselines, deterministic") {
    val w = Ann.topComponent(emb, "embedding", iters = 3)
    assert(math.abs(w.map(a => a * a).sum - 1.0) < 1e-9)
    val xs = emb.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    def rayleigh(v: Array[Double]): Double = xs.map { x =>
      var p = 0.0; var i = 0
      while (i < x.length) { p += x(i) * v(i); i += 1 }
      p * p
    }.sum
    val rw = rayleigh(w)
    // the power-method direction must capture at least as much second
    // moment as every basis vector and several hash-deterministic
    // random unit directions
    val d = w.length
    for (b <- 0 until d) {
      val e = Array.fill(d)(0.0); e(b) = 1.0
      assert(rw >= rayleigh(e), s"basis $b beats the top component")
    }
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val r = Array.fill(d)(rnd.nextGaussian())
      val n = math.sqrt(r.map(a => a * a).sum)
      assert(rw >= rayleigh(r.map(_ / n)), s"random dir $seed beats it")
    }
    // canonical sign + 6dp-stable across invocations
    val w2 = Ann.topComponent(emb, "embedding", iters = 3)
    assert(w.zip(w2).forall { case (a, b) => math.abs(a - b) < 1e-6 })
    val lead = w.indices.minBy(i => (-math.round(math.abs(w(i)) * 1e6), i))
    assert(w(lead) > 0)
  }

  test("ivf recall EQUALS probe coverage (the exact IVF identity), above floors") {
    import spark.implicits._
    val q = emb.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val brute = pairs(Ann.bruteTopK(emb, q, "vec_id", "embedding", 5))
    val ivf = pairs(Ann.ivfTopK(emb, q, "vec_id", "embedding", 5))
    assert(ivf.size === brute.size)

    // The IVF approximation loses a true neighbor in EXACTLY one way: its
    // cell isn't probed. A probed true-top-5 neighbor is outranked by at
    // most 4 candidates, so it must appear in the returned top-5. That
    // makes expected recall computable, not just floorable: recompute the
    // same deterministic centroids the operator built and check
    //   ivf ∩ brute == { (q, n) ∈ brute : cell(n) ∈ probes(q) }.
    val cents = Ann.ivfCentroids(
      emb.select(col("vec_id"), col("embedding").as("nv")), nCells = 16, iters = 2)
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    val probed = brute.filter { case (qid, nid) =>
      Ann.probeCellIdxs(cents, vecs(qid), 4)
        .contains(Ann.nearestCellIdx(cents, vecs(nid)))
    }
    assert((ivf & brute) === probed,
      s"recall != probe coverage: missing=${probed -- ivf}, extra=${(ivf & brute) -- probed}")

    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.4, s"ivf top-5 recall $recall")
    val brute1 = pairs(Ann.bruteTopK(emb, q, "vec_id", "embedding", 1))
    val hit1 = brute1.count(ivf.contains).toDouble / brute1.size
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

    // Post-Lloyd per-cell candidate bound: the hot cluster must stay
    // confined to its own cell(s) instead of swallowing the spread
    // vectors, and the spread vectors must occupy several cells — a
    // degenerate quantizer (all mass in one cell) would make every probe
    // scan ~the whole corpus, which is the failure mode IVF exists to
    // prevent.
    val cents = Ann.ivfCentroids(
      df.select(col("vec_id"), col("embedding").as("nv")), nCells = 8, iters = 2)
    val cellSizes = rows.map { case (_, v) => Ann.nearestCellIdx(cents, v) }
      .groupBy(identity).map(_._2.size)
    assert(cellSizes.max <= 64 + 8,
      s"hot cell absorbed spread vectors: sizes=${cellSizes.toSeq.sorted.reverse}")
    assert(cellSizes.size >= 4,
      s"quantizer collapsed to ${cellSizes.size} non-empty cells of 8")
  }

  test("pq: ADC ranking IS brute ranking over reconstructions (exact identity)") {
    import spark.implicits._
    val q = emb.filter(col("vec_id") < 20)
    val pq = Ann.pqTopK(emb, q, "vec_id", "embedding", 5)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .as[(Long, Int, Long)].collect().toSet

    // rebuild the same deterministic codebooks and rank driver-side over
    // the decoded vectors — the operator's distributed window must agree
    // pair-for-pair, which pins encode, decode, AND the ranking tiebreak
    val books = Ann.pqCodebooks(
      emb.select(col("vec_id"), col("embedding").as("nv")), m = 16, ksub = 16, iters = 2)
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val recon = vecs.map { case (id, v) =>
      (id, Ann.pqDecode(books, Ann.pqEncode(books, v).toSeq)) }
    val expected = vecs.filter(_._1 < 20).flatMap { case (qid, qv) =>
      recon.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, graft.llm.Hashing.cosine(qv, nv)) }
        .sortBy { case (nid, s) => (-s, nid) }.take(5).zipWithIndex
        .map { case ((nid, _), i) => (qid, i + 1, nid) }
    }.toSet
    assert(pq === expected,
      s"missing=${expected -- pq}, extra=${pq -- expected}")

    // codes are the compressed index: m entries, each < ksub
    val codes = Ann.pqEncode(books, vecs.head._2)
    assert(codes.length === 16 && codes.forall(c => c >= 0 && c < 16))

    // recall floor vs the uncompressed ground truth (32× compression
    // keeps most of the neighborhood structure on this corpus)
    val brute = Ann.bruteTopK(emb, q, "vec_id", "embedding", 5)
      .select(col("query_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val pqPairs = pq.map { case (a, _, c) => (a, c) }
    val recall = (brute & pqPairs).size.toDouble / brute.size
    info(s"pq recall@5 = $recall")
    assert(recall >= 0.3, s"pq top-5 recall $recall")
  }

  test("lsh rank-1 recall EQUALS collision coverage; coverage matches the S-curve") {
    import spark.implicits._
    val tables = 8; val bits = 8
    val q = emb.filter(col("vec_id") < 50)
    val brute1 = Ann.bruteTopK(emb, q, "vec_id", "embedding", 1)
      .select(col("query_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val lsh = Ann.lshTopK(emb, q, "vec_id", "embedding", 5,
      tables = tables, bits = bits)
    val lshAll = lsh.select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet

    // Exact identity, not a loose floor: the true NN is missed iff it
    // shares no bucket with the query in ANY table (if it collides
    // anywhere it is a candidate, and as the max-cosine candidate it
    // ranks first). Recompute the same deterministic signatures and
    // check the returned hits are exactly the colliding NN pairs.
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def collides(a: Long, b: Long): Boolean =
      Hashing.rhpSignatures(vecs(a), tables, bits)
        .zip(Hashing.rhpSignatures(vecs(b), tables, bits))
        .exists { case (x, y) => x == y }
    val colliding = brute1.filter { case (qid, nid) => collides(qid, nid) }
    assert(brute1.filter(lshAll.contains) === colliding,
      s"hits != collisions: missing=${colliding.filterNot(lshAll.contains)}")

    // And the measured collision coverage must sit where the S-curve puts
    // it: per pair P = 1-(1-p^bits)^tables with p = 1-θ/π from the pair's
    // ACTUAL angle; coverage is a sum of independent Bernoulli(P_i), so
    // allow 3σ sampling slack around the expectation.
    val ps = brute1.toSeq.map { case (qid, nid) =>
      val c = math.max(-1.0, math.min(1.0, Hashing.cosine(vecs(qid), vecs(nid))))
      val p = 1.0 - math.acos(c) / math.Pi
      1.0 - math.pow(1.0 - math.pow(p, bits), tables)
    }
    val expected = ps.sum / ps.size
    val sigma = math.sqrt(ps.map(p => p * (1 - p)).sum) / ps.size
    val coverage = colliding.size.toDouble / brute1.size
    assert(math.abs(coverage - expected) <= 3 * sigma + 1e-9,
      s"coverage $coverage vs S-curve expectation $expected (3σ=${3 * sigma})")

    // within-candidate ordering must be by true cosine: rank 1 beats rank 2
    val scores = lsh.select(col("query_id"), col("rank"), col("score"))
      .as[(Long, Int, Double)].collect().groupBy(_._1)
    scores.values.foreach { rows =>
      val sorted = rows.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.drop(1)).forall { case (a, b) => a >= b })
    }
  }

  test("pq: dim not divisible by m — tail subspace trained, encoded, decoded") {
    import spark.implicits._
    // dim=10, m=4 → sub=ceil(10/4)=3 with a width-1 tail subspace; the
    // old layout dropped dims 8-9 and indexed books out of range
    val rnd = new scala.util.Random(7)
    val rows = (0L until 40L).map(i => (i, Array.fill(10)(rnd.nextFloat())))
    val df = rows.toDF("vec_id", "embedding")
    val books = Ann.pqCodebooks(
      df.select(col("vec_id"), col("embedding").as("nv")), m = 4, ksub = 8,
      iters = 2)
    assert(books.length === 4)
    assert(books.map(_.head.length).toSeq === Seq(3, 3, 3, 1))
    val codes = Ann.pqEncode(books, rows.head._2)
    assert(codes.length === 4 && codes.forall(c => c >= 0 && c < 8))
    // reconstruction covers ALL 10 dims (no dropped tail)
    assert(Ann.pqDecode(books, codes.toSeq).length === 10)
    val q = df.filter(col("vec_id") < 5)
    val pq = Ann.pqTopK(df, q, "vec_id", "embedding", 3, m = 4, ksub = 8)
      .as[(Long, Int, Long)].collect()
    assert(pq.length === 15) // 5 queries × full k
    // m > dim degenerates to one dim per subspace, not a crash
    val narrow = (0L until 10L).map(i => (i, Array.fill(3)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val booksN = Ann.pqCodebooks(
      narrow.select(col("vec_id"), col("embedding").as("nv")), m = 16,
      ksub = 4, iters = 1)
    assert(booksN.length === 3 && booksN.forall(_.head.length == 1))
  }

  test("pq/ann: empty corpus and null embedding rows degrade, never throw") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 3)
    assert(Ann.pqTopK(empty, q, "vec_id", "embedding", 5).count() === 0L)
    assert(Ann.ivfTopK(empty, q, "vec_id", "embedding", 5).count() === 0L)

    // a null embedding (failed upstream embed job) is a non-row for
    // every path — results equal the same call without the null row
    val good = (0L until 30L).map { i =>
      val rnd = new scala.util.Random(i)
      (i, Array.fill(8)(rnd.nextFloat()))
    }
    val withNull = (good :+ ((99L, null.asInstanceOf[Array[Float]])))
      .toDF("vec_id", "embedding")
    val clean = good.toDF("vec_id", "embedding")
    val qs = withNull.filter(col("vec_id") < 5 || col("vec_id") === 99L)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("rank"), col("vec_id"))
        .as[(Long, Int, Long)].collect().toSet
    assert(ids(Ann.bruteTopK(withNull, qs, "vec_id", "embedding", 3)) ===
      ids(Ann.bruteTopK(clean, clean.filter(col("vec_id") < 5), "vec_id", "embedding", 3)))
    assert(ids(Ann.lshTopK(withNull, qs, "vec_id", "embedding", 3)) ===
      ids(Ann.lshTopK(clean, clean.filter(col("vec_id") < 5), "vec_id", "embedding", 3)))
    assert(ids(Ann.ivfTopK(withNull, qs, "vec_id", "embedding", 3, nCells = 4)) ===
      ids(Ann.ivfTopK(clean, clean.filter(col("vec_id") < 5), "vec_id", "embedding", 3, nCells = 4)))
    assert(ids(Ann.pqTopK(withNull, qs, "vec_id", "embedding", 3, m = 4, ksub = 4)) ===
      ids(Ann.pqTopK(clean, clean.filter(col("vec_id") < 5), "vec_id", "embedding", 3, m = 4, ksub = 4)))
    val sd = Ann.semDedup(withNull, "vec_id", "embedding", 0.99, nCells = 4)
    assert(sd.select(col("vec_id")).as[Long].collect().toSet ===
      good.map(_._1).toSet)
    assert(Ann.cosineNearDupPairs(withNull, "vec_id", "embedding", 0.99)
      .filter(col("i") === 99L || col("j") === 99L).count() === 0L)
  }

  test("cosine: ragged lengths score the overlap instead of throwing") {
    assert(math.abs(Hashing.cosine(Array(1f, 0f, 5f), Array(1f, 0f)) - 1.0) < 1e-12)
    assert(math.abs(Hashing.cosine(Array(1f, 0f), Array(1f, 0f, 5f)) - 1.0) < 1e-12)
  }

  test("lshPortableRecall: planted near-dups recall 100, deterministic twice") {
    import spark.implicits._
    // 3 queries each with a planted near-identical neighbor (tiny nudge:
    // same half-space for almost every hyperplane → they collide and the
    // near-dup is the true top-1), plus random background
    val rnd = new scala.util.Random(11)
    val background = (100L until 160L).map(i => (i, Array.fill(16)(rnd.nextFloat())))
    val planted = (0L until 3L).flatMap { i =>
      val v = Array.fill(16)(rnd.nextFloat())
      val dup = v.clone; dup(0) += 1e-4f
      Seq((i, v), (i + 50L, dup))
    }
    val df = (planted ++ background).toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") < 3)
    val got = Ann.lshPortableRecall(df, q, "vec_id", "embedding", k = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 1L, 100L), (1L, 1L, 100L), (2L, 1L, 100L)),
      s"planted near-dup recall: $got")
    val again = Ann.lshPortableRecall(df, q, "vec_id", "embedding", k = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(again === got)
  }

  test("pqPortableRecall: planted exact dups recall 100, deterministic twice") {
    import spark.implicits._
    // exact duplicates: the dup encodes to the SAME per-subspace codes
    // as its query, so its reconstruction is the quantization of the
    // query itself — the ADC top-1 unless another vector shares all
    // codes (deterministic for this seeded corpus: none does)
    val rnd = new scala.util.Random(13)
    val background = (100L until 160L).map(i => (i, Array.fill(16)(rnd.nextFloat())))
    val planted = (0L until 3L).flatMap { i =>
      val v = Array.fill(16)(rnd.nextFloat())
      Seq((i, v), (i + 50L, v.clone))
    }
    val df = (planted ++ background).toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") < 3)
    val got = Ann.pqPortableRecall(df, q, "vec_id", "embedding", k = 1,
        sub = 4, ksub = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 1L, 100L), (1L, 1L, 100L), (2L, 1L, 100L)),
      s"planted exact-dup recall: $got")
    val again = Ann.pqPortableRecall(df, q, "vec_id", "embedding", k = 1,
        sub = 4, ksub = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(again === got)
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

  test("resize plan + batched resize: aspect kept, buckets bound shapes, bytes match") {
    implicit val s = spark
    val media = Multimodal.synthesize(docs, "doc_id", "text")
    val plan = Multimodal.resizePlan(media).collect()
    assert(plan.nonEmpty)
    plan.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (tw, th) = (r.getAs[Int]("tw"), r.getAs[Int]("th"))
      assert(Seq("png", "jpeg").contains(r.getAs[String]("format")))
      assert(tw <= 224 && th <= 224 && math.max(tw, th) === 224)
      // aspect preserved under integer floor: tw = w*224 div max(w,h)
      assert(tw === (w.toLong * 224 / math.max(w, h)).toInt)
      assert(th === (h.toLong * 224 / math.max(w, h)).toInt)
      assert(r.getAs[Int]("bw") === tw / 32 && r.getAs[Int]("bh") === th / 32)
    }
    // the byte path consumes the same plan: out_bytes == tw*th exactly
    val out = Multimodal.resizeTo(media.filter(col("media_id") < 30))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("out_bytes") ===
        r.getAs[Int]("tw") * r.getAs[Int]("th"))
    }
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

  test("phashNearDup: planted duplicates found, empty payloads never pair") {
    import spark.implicits._
    val base = Array.tabulate(256)(i => (i * 37 % 251).toByte)
    val nearDup = base.clone // one byte nudged: few aHash bits flip
    nearDup(0) = (nearDup(0) + 3).toByte
    val unrelated = Array.tabulate(256)(i => (i * i % 17).toByte)
    val media = Seq(
      (1L, base), (2L, base.clone), // exact dup → distance 0
      (3L, nearDup), //                near dup → small distance
      (4L, unrelated),
      (5L, Array.empty[Byte]), (6L, Array.empty[Byte]), // degenerate: no pairs
      (7L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "media")
    val pairs = Multimodal.phashNearDup(media, maxDist = 8)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((1L, 2L, 0)), s"exact dup missed: $pairs")
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L), s"near dup missed: $pairs")
    assert(!pairs.exists(p => p._1 >= 5L || p._2 >= 5L),
      s"degenerate payloads paired: $pairs")
    assert(!pairs.exists(p => p._2 == 4L && p._3 == 0), s"false exact dup: $pairs")

    // aHash determinism + null contract
    assert(Multimodal.aHash(base) == Multimodal.aHash(base.clone))
    assert(Multimodal.aHash(Array.empty[Byte]) == null)
    assert(Multimodal.aHash(null) == null)
  }

  test("ImageCodec: gray PNG encode→decode round trip is the identity") {
    val w = 23; val h = 17
    val pixels = Array.tabulate(w * h)(i => ((i * 131 + 7) % 256).toByte)
    val png = Multimodal.ImageCodec.encodeGrayPng(pixels, w, h)
    // a real PNG, not our bytes: magic header present
    assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte)
    val Some((samples, ow, oh)) = Multimodal.ImageCodec.decodeGray(png)
    assert(ow === w && oh === h)
    assert(samples.toSeq === pixels.toSeq.map(_ & 0xff))
    // non-image bytes: None / null, never a throw
    assert(Multimodal.ImageCodec.decodeGray("not a png".getBytes) === None)
    assert(Multimodal.ImageCodec.aHash("not a png".getBytes) == null)
    assert(Multimodal.ImageCodec.aHash(null) == null)
    assert(Multimodal.ImageCodec.decodeGray(Array.empty[Byte]) === None)
  }

  test("ImageCodec: planted REAL-image near-dups pair; corrupt payloads drop") {
    import spark.implicits._
    val w = 32; val h = 24
    // smooth gradient so a one-pixel nudge flips at most a bit or two
    val base = Array.tabulate(w * h)(i => ((i % w) * 8 % 256).toByte)
    val nearDup = base.clone
    nearDup(5) = (nearDup(5) + 4).toByte
    val unrelated = Array.tabulate(w * h)(i => (((i / w) * 16 + (i % 7) * 31) % 256).toByte)
    val enc = (p: Array[Byte]) => Multimodal.ImageCodec.encodeGrayPng(p, w, h)
    val media = Seq(
      (1L, enc(base)), (2L, enc(base.clone)), // same pixels → distance 0
      (3L, enc(nearDup)),
      (4L, enc(unrelated)),
      (5L, "corrupt crawl bytes".getBytes), // undecodable → dropped
      (6L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "media")
    val pairs = Multimodal.phashNearDupImage(media, maxDist = 8)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.contains((1L, 2L, 0)), s"exact real-pixel dup missed: $pairs")
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L),
      s"one-pixel near dup missed: $pairs")
    assert(!pairs.exists(p => p._1 >= 5L || p._2 >= 5L),
      s"undecodable payloads paired: $pairs")
    assert(!pairs.exists(p => p._2 == 4L && p._3 == 0),
      s"false exact dup vs unrelated: $pairs")
  }

  test("ImageCodec: integer area-average resize, exact values + roundtrip dims") {
    // 4×4 with known 2×2 block means: each target pixel = floor(block avg)
    val src = Array(
      0, 10, 100, 110,
      20, 30, 120, 130,
      200, 210, 40, 50,
      220, 230, 60, 70).map(_.toByte)
    val png = Multimodal.ImageCodec.encodeGrayPng(src, 4, 4)
    val out = Multimodal.ImageCodec.resizeGrayPng(png, 2, 2)
    val Some((s2, ow, oh)) = Multimodal.ImageCodec.decodeGray(out)
    assert(ow === 2 && oh === 2)
    assert(s2.toSeq === Seq(15, 115, 215, 55)) // exact block means
    // corrupt input → empty output
    assert(Multimodal.ImageCodec.resizeGrayPng("junk".getBytes, 2, 2).isEmpty)

    // DataFrame path: real decode of the produced payload confirms dims
    implicit val s = spark
    import spark.implicits._
    val media = Seq(
      (1L, png, "png", 4, 4),
      (2L, "junk".getBytes, "png", 9, 9))
      .toDF("media_id", "media", "format", "width", "height")
    val rows = Multimodal.resizeToImage(media, box = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(rows(1L) === ((8, 8, 8, 8))) // tw, th, out_w == tw, out_h == th
    assert(rows(2L)._3 === 0 && rows(2L)._4 === 0) // corrupt → (0, 0)
  }
}

class TextAnalysisSpec extends SparkSpec {

  test("spellVariantPairs: deletion buckets find exactly the distance-1 pairs") {
    import spark.implicits._
    val vocab = Seq("model", "modell", "madel", "nodel", // del/sub/sub of model
      "spark", "sprak", //                                  transposition: dist 2
      "query", "data" //                                    unrelated
    ).toDF("word")
    val got = TextAnalysis.spellVariantPairs(vocab, "word")
      .as[(String, String)].collect().toSet
    // brute-force ground truth over the same list
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val words = vocab.as[String].collect()
    val brute = (for {
      a <- words; b <- words if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(got === brute, s"got=$got brute=$brute")
    assert(got.contains(("madel", "model")) && got.contains(("model", "modell")))
    assert(!got.exists(p => p._1 == "spark" || p._2 == "sprak"),
      s"transposition is distance 2: $got")
  }

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

/** SemDeDup ([[Ann.semDedup]]): identities that hold for ANY clustering —
  * the spec surface for an operator whose cell assignment is
  * engine-defined and therefore un-oracle-able.
  */
class SemDedupSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("planted exact duplicates are always removed (same cell by construction)") {
    import spark.implicits._
    val dups = emb.filter(col("vec_id") < 25)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val withDups = emb.select(col("vec_id"), col("embedding")).union(dups)
    val out = Ann.semDedup(withDups, "vec_id", "embedding", threshold = 0.999)
      .filter(col("removed")).select(col("vec_id")).as[Long].collect().toSet
    (0L until 25L).foreach { i =>
      assert(out.contains(i + 10000L),
        s"planted duplicate of $i escaped semantic dedup")
    }
  }

  test("removal set is a subset of the brute-force global removal set") {
    import spark.implicits._
    // the natural corpus has no high-cosine pairs (max ≈ 0.5 at this sf),
    // so plant jittered near-copies to make the property non-trivial
    val theta = 0.9
    val jitter = udf((v: Seq[Float]) => v.map(x => x * 1.001f).toArray)
    val near = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 10000L).as("vec_id"),
        jitter(col("embedding")).as("embedding"))
    val corpus = emb.select(col("vec_id"), col("embedding")).union(near)
    val removed = Ann.semDedup(corpus, "vec_id", "embedding", threshold = theta)
      .filter(col("removed")).select(col("vec_id")).as[Long].collect().toSet
    val vecs = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val bruteRemoved = (for {
      ((i, vi), xi) <- vecs.zipWithIndex
      (j, vj) <- vecs.drop(xi + 1)
      if Hashing.cosine(vi, vj) >= theta
    } yield j).toSet
    assert(removed.subsetOf(bruteRemoved),
      s"cell-local pair outside the true pair set: ${removed -- bruteRemoved}")
    assert(bruteRemoved.nonEmpty, "trivial test: no pairs at this threshold")
  }

  test("deterministic across invocations (hash-seeded k-means, no RNG)") {
    val a = Ann.semDedup(emb, "vec_id", "embedding", threshold = 0.5)
      .orderBy("vec_id").collect().toSeq
    val b = Ann.semDedup(emb, "vec_id", "embedding", threshold = 0.5)
      .orderBy("vec_id").collect().toSeq
    assert(a === b)
  }

  test("semDedupPortable: planted exact dups removed; one row per vector") {
    import spark.implicits._
    val dups = emb.filter(col("vec_id") < 25)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val withDups = emb.select(col("vec_id"), col("embedding")).union(dups)
    val out = Ann.semDedupPortable(withDups, "vec_id", "embedding",
      threshold = 0.999)
    assert(out.count() === withDups.count())
    val removed = out.filter(col("removed"))
      .select(col("vec_id")).as[Long].collect().toSet
    (0L until 25L).foreach { i =>
      assert(removed.contains(i + 10000L),
        s"planted duplicate of $i escaped portable semantic dedup")
    }
    // and the lower-id original of each planted pair is kept
    (0L until 25L).foreach(i => assert(!removed.contains(i)))
  }
}

/** Prefix-filter exact set-similarity join: cross-validation against the
  * MinHash-LSH path — two disjoint algorithms, one ground truth.
  */
class PrefixJoinSpec extends SparkSpec {

  test("prefix-filter pairs == MinHash-LSH pairs (same theta, disjoint algorithms)") {
    val sf = "/root/testdata/sf0.001"
    val prefix = graft.SparkEntry.queries("dedup_prefix_filter_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefix === lsh,
      s"prefix-only=${prefix -- lsh} lsh-only=${lsh -- prefix}")
    assert(prefix.nonEmpty, "trivial test: corpus has no J>=0.8 pairs")
  }
}

/** Planted-case pin for the exact repeated-span (substring-dedup) family:
  * coverage math is easy to get off by one at window edges, so assert the
  * exact token counts a hand-checkable fixture implies.
  */
class RepeatedSpansSpec extends SparkSpec {
  import spark.implicits._

  test("shared 9-word run covers 9 tokens via two 8-gram windows; unique docs absent") {
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val docs = Seq(
      (1L, s"$shared juliet kilo"),
      (2L, s"prefix0 prefix1 $shared"),
      (3L, "uniq0 uniq1 uniq2 uniq3 uniq4 uniq5 uniq6 uniq7 uniq8 uniq9"))
      .toDF("doc_id", "text")
    val out = RepeatedSpans.coverage(docs, "doc_id", "text", n = 8)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // A 9-word shared run has two 8-gram windows (positions 0,1 within
    // the run); their union covers all 9 run tokens in each doc.
    assert(out.toSeq === Seq((1L, 11L, 2L, 9L), (2L, 11L, 2L, 9L)))
  }

  test("a doc repeating its own 8-gram is flagged without a partner doc") {
    val run = "w1 w2 w3 w4 w5 w6 w7 w8"
    val docs = Seq((7L, s"$run sep0 sep1 $run")).toDF("doc_id", "text")
    val out = RepeatedSpans.coverage(docs, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // two windows (one per occurrence), covering 16 distinct positions
    assert(out.toSeq === Seq((7L, 2L, 16L)))
  }
}
