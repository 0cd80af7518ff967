package graft.analytics

import java.sql.Timestamp

import graft.SparkSpec

/** Planted-data semantics for the round-10 widening wave, driven through
  * the REGISTERED queries end-to-end (the RoundNineWaveSpec pattern):
  * hand-checkable tables, independent in-spec recomputation, plus the
  * fully-empty-input guard every wave carries.
  */
class RoundTenWaveSpec extends SparkSpec {

  import spark.implicits._

  private def q(name: String, dir: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("r10spec").toString

  /** Co-purchase path graph 1-2-3-4-5: each edge planted as 5 orders
    * containing both suppliers, clearing the HAVING ≥ 5 support floor.
    */
  private def pathLineitem(dir: String): Unit = {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val li = for {
      ((a, b), ei) <- edges.zipWithIndex
      o <- 1 to 5
      sk <- Seq(a, b)
    } yield ((ei * 10 + o).toLong, sk)
    li.toDF("l_orderkey", "l_suppkey").write.parquet(s"$dir/lineitem.parquet")
  }

  test("effective diameter + mean distance on a planted path graph") {
    val dir = tmpDir()
    pathLineitem(dir)
    // exact regime (5 nodes << k=64): N(r) = [5, 13, 19, 23, 25, 25],
    // stop at the r=5 plateau; T = ceil(0.9*25) = 23 hit at r=3 with
    // interpolation (23-19)/(23-19) -> exactly 3.000
    val ed = q("graph_effective_diameter", dir)
      .select("r", "n_reach", "eff_diameter_milli")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(ed.map(r => (r._1, r._2)).toSeq ===
      Seq((0L, 5L), (1L, 13L), (2L, 19L), (3L, 23L), (4L, 25L), (5L, 25L)))
    assert(ed.map(_._3).distinct.toSeq === Seq(3000L))
    // mean distance over reachable ordered pairs of the path:
    // (8*1 + 6*2 + 4*3 + 2*4) / 20 = 2.000
    val md = q("graph_mean_distance_hyperball", dir)
      .as[(Long, Long, Long)].collect()
    assert(md.toSeq === Seq((5L, 25L, 2000L)))
  }

  test("CUPED recovers theta=2, rho2=1, zero adjusted effect on y=2x users") {
    val dir = tmpDir()
    // per user: one pre event (value v) and one post event (value 2v) —
    // the covariate explains the outcome exactly, so the adjustment
    // removes the whole between-variant difference
    val rows = (1 to 10).flatMap { u =>
      val v = u.toDouble // centi-exact
      Seq(
        ((u * 2).toLong, Timestamp.valueOf("2024-01-01 10:00:00"),
          u.toLong, "pre", Double.box(v), "{}"),
        ((u * 2 + 1).toLong, Timestamp.valueOf("2024-01-01 12:00:00"),
          u.toLong, "post", Double.box(2 * v), "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = q("stats_ab_cuped_adjusted", dir).collect()(0)
    assert(r.getAs[Long]("n_users") === 10L)
    assert(r.getAs[Double]("theta") === 2.0)
    assert(r.getAs[Double]("rho2") === 1.0)
    assert(r.getAs[Double]("effect_cuped_centi") === 0.0)
  }

  test("tfidf doc similarity: planted twins are mutual rank-1 near cos=1") {
    val dir = tmpDir()
    val twin = "alpha beta gamma delta epsilon zeta eta theta"
    // 18 fillers with unique words: every filler shingle has df=1 and
    // is excluded from the feature space, so the twins are the only
    // candidate pair; n=20 keeps the twins' df=2 under the df*10<=n cut
    val fillers = (3 to 20).map(i =>
      (i.toLong, (1 to 8).map(j => s"w${i}_$j").mkString(" "), "en", "s",
        40L))
    val docs = Seq(
      (1L, twin, "en", "s", twin.length.toLong),
      (2L, twin, "en", "s", twin.length.toLong)) ++ fillers
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q("text_tfidf_doc_similarity", dir)
      .select("doc_id", "rank", "nbr_id", "cos_micro")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((1L, 1L, 2L), (2L, 1L, 1L)))
    // identical feature vectors: cosine exactly 1 up to the sqrt ulp
    out.foreach(r => assert(r._4 >= 999999L && r._4 <= 1000000L, r))
  }

  test("quota fill: small-doc source fully admitted, oversize source empty") {
    val dir = tmpDir()
    val small = (1 to 5).map(i =>
      (i.toLong, (1 to 10).map(j => s"s${i}_$j").mkString(" "), "en",
        "small", 50L))
    // each big doc alone exceeds the 20k budget, so even the
    // best-quality one is dropped by the prefix rule
    val big = (6 to 8).map(i =>
      (i.toLong, (1 to 30000).map(j => s"b$j").mkString(" "), "en",
        "big", 90000L))
    (small ++ big).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q("docs_quota_fill_best_first", dir)
      .select("source", "n_docs", "n_kept", "kept_tokens")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("small") === (("small", 5L, 5L, 50L)))
    assert(out("big") === (("big", 3L, 0L, 0L)))
  }

  test("payload exact dedup: same text + same repeat + same format dedups") {
    val dir = tmpDir()
    // ids 0 and 15: both %5==0 (same payload length) and %3==0 (both
    // 'png'), same text -> identical payloads; 16 reclaimable bytes
    val docs = Seq(
      (0L, "same text here", "en", "s", 14L),
      (15L, "same text here", "en", "s", 14L),
      (1L, "unique one", "en", "s", 10L),
      (2L, "unique two", "en", "s", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q("mm_payload_exact_dedup", dir)
      .select("format", "n_media", "n_distinct", "n_dupes", "reclaim_bytes")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("png") === (("png", 2L, 1L, 1L, 16L)))
    assert(out.values.map(_._4).sum === 1L) // the twins are the only dupe
  }

  test("epoch shuffle overlap emits all three pairs with sane bounds") {
    val dir = tmpDir()
    (1 to 400).map(i => (i.toLong, s"doc $i text", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q("docs_epoch_shuffle_overlap", dir)
      .select("epoch_a", "epoch_b", "n_docs", "n_same_shard", "same_bp")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.map(r => (r._1, r._2)).toSeq ===
      Seq((0L, 1L), (0L, 2L), (1L, 2L)))
    out.foreach { r =>
      assert(r._3 === 400L)
      // independent md5 draws land near the 1/8 expectation (1250 bp);
      // 3-sigma over 400 draws ≈ ±500 bp
      assert(r._5 > 750L && r._5 < 1750L, r)
    }
  }

  test("every round-10 query survives fully empty inputs") {
    val dir = tmpDir()
    Seq.empty[(Long, Timestamp, Long, String, java.lang.Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq.empty[(Long, Long)]
      .toDF("l_orderkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val expectRows = Map(
      "graph_effective_diameter" -> Some(0L),
      "graph_mean_distance_hyperball" -> Some(1L),
      "stats_ab_cuped_adjusted" -> Some(1L),
      "dq_gate_agreement_kappa" -> Some(1L),
      "docs_epoch_shuffle_overlap" -> Some(3L),
      "text_tfidf_doc_similarity" -> Some(0L),
      "docs_quota_fill_best_first" -> Some(0L),
      "dedup_cross_source_matrix" -> Some(0L),
      "mm_payload_exact_dedup" -> Some(0L),
      "seq_journey_entropy_topk" -> Some(0L),
      "dedup_fragment_stitch_pairs" -> Some(0L),
      "ts_weekly_seasonality_strength" -> Some(1L),
      "dedup_decontam_method_agreement" -> Some(1L))
    val waveQueries = Seq("graph_effective_diameter",
      "graph_mean_distance_hyperball", "ann_ivf_recall_portable",
      "stats_ab_cuped_adjusted", "text_tfidf_doc_similarity",
      "docs_epoch_shuffle_overlap", "dq_gate_agreement_kappa",
      "dq_quality_calibration", "docs_quota_fill_best_first",
      "dedup_cross_source_matrix", "mm_payload_exact_dedup",
      "seq_journey_entropy_topk", "dedup_fragment_stitch_pairs",
      "ts_weekly_seasonality_strength",
      "dedup_decontam_method_agreement")
    waveQueries.foreach { name =>
      val rows = q(name, dir).collect()
      expectRows.getOrElse(name, None).foreach { want =>
        assert(rows.length.toLong === want, s"$name row count")
      }
    }
  }
}
