package graft.analytics

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Planted-data specs for the round-6 curation/maintenance operators
  * (interval coverage, compaction planning, distribution drift, n-gram
  * contamination fraction, bigram perplexity). Each test writes a tiny
  * hand-computable parquet star into a temp dir and drives the REGISTRY
  * query against it — the same code path Verify/Bench run, with outputs
  * derivable on paper. The DuckDB oracles prove cross-engine agreement
  * on the harness tables; these pin the semantics.
  */
class CurationOpsSpec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_cur").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s)

  /** Write a planted events table: (event_id, ts, user_id). */
  private def plantEvents(dir: String,
      rows: Seq[(Long, java.sql.Timestamp, Long, Double)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "value")
      .withColumn("event_type", lit("click"))
      .withColumn("props", lit(null).cast("string"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def plantDocs(dir: String,
      rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("ts_interval_coverage merges overlapping 15-minute sessions") {
    val dir = tmpDir()
    // user 1: sessions at minute 0, 10, 40 → [0,15]∪[10,25] and [40,55]
    //   = 2 islands, 25 + 15 = 40 covered minutes, 3 events
    // user 2: one session → 1 island, 15 minutes
    plantEvents(dir, Seq(
      (1L, ts("2024-01-05 10:00:00"), 1L, 1.0),
      (2L, ts("2024-01-05 10:10:30"), 1L, 1.0),
      (3L, ts("2024-01-05 10:40:00"), 1L, 1.0),
      (4L, ts("2024-01-06 00:00:00"), 2L, 1.0)))
    val got = SparkEntry.queries("ts_interval_coverage")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 40L, 3L), (2L, 1L, 15L, 1L)))
  }

  test("ts_interval_coverage: duplicate-minute events merge into one island") {
    val dir = tmpDir()
    plantEvents(dir, Seq(
      (1L, ts("2024-01-05 10:00:01"), 7L, 1.0),
      (2L, ts("2024-01-05 10:00:59"), 7L, 1.0)))
    val got = SparkEntry.queries("ts_interval_coverage")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((7L, 1L, 15L, 2L)))
  }

  test("storage_compaction_bins packs equal-size files deterministically") {
    val dir = tmpDir()
    // 12 files of exactly 5000 chars in one source partition, target
    // 25000 → bins of 5/5/2 files whatever the md5 pack order;
    // fill_bp = 10000, 10000, 4000
    val doc = "x" * 5000
    plantDocs(dir, (1L to 12L).map(i => (i, doc, "s1")))
    val got = SparkEntry.queries("storage_compaction_bins")(spark, dir)
      .select(col("bin"), col("n_files"), col("total_chars"), col("fill_bp"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 5L, 25000L, 10000L), (1L, 5L, 25000L, 10000L),
      (2L, 2L, 10000L, 4000L)))
  }

  test("storage_compaction_bins conserves bytes and keeps bins contiguous") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("storage_compaction_bins")(spark, sf)
    val perSource = got.groupBy(col("source"))
      .agg(sum(col("total_chars")).as("chars"), max(col("bin")).as("maxb"),
        count(lit(1)).as("nbins"))
      .as[(String, Long, Long, Long)].collect()
    val truth = graft.Tables.documents(spark, sf)
      .groupBy(col("source")).agg(sum(col("n_chars")).as("chars"))
      .as[(String, Long)].collect().toMap
    perSource.foreach { case (src, chars, maxb, nbins) =>
      assert(chars === truth(src), s"byte conservation for $src")
      assert(nbins === maxb + 1, s"contiguous bins for $src")
    }
  }

  test("dq_distribution_drift reports zero drift for identical halves") {
    val dir = tmpDir()
    // same value multiset 0.01..1.00 on each side of the 2024-01-15 cut
    val ref = (1 to 100).map(i =>
      (i.toLong, ts("2024-01-10 00:00:00"), 1L, i / 100.0))
    val cur = (1 to 100).map(i =>
      (100L + i, ts("2024-01-20 00:00:00"), 1L, i / 100.0))
    plantEvents(dir, ref ++ cur)
    val got = SparkEntry.queries("dq_distribution_drift")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.size === 10)
    got.foreach { case (bucket, nRef, nCur, refBp, curBp, diffBp) =>
      assert(nRef === 10L && nCur === 10L, s"bucket $bucket counts")
      assert(refBp === 1000L && curBp === 1000L && diffBp === 0L,
        s"bucket $bucket shares")
    }
  }

  test("dq_distribution_drift flags a one-sided shift") {
    val dir = tmpDir()
    val ref = (1 to 100).map(i =>
      (i.toLong, ts("2024-01-10 00:00:00"), 1L, i / 100.0))
    // current half sits entirely above the reference max → all mass in
    // the top bucket
    val cur = (1 to 50).map(i =>
      (100L + i, ts("2024-01-20 00:00:00"), 1L, 5.0 + i / 100.0))
    plantEvents(dir, ref ++ cur)
    val got = SparkEntry.queries("dq_distribution_drift")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val top = got.find(_._1 === 10L).get
    assert(top._3 === 50L && top._5 === 10000L && top._6 === 9000L)
    assert(got.filter(_._1 != 10L).forall(_._3 == 0L))
  }

  test("dedup_contaminate_ngram_frac scores exact copy 100%, partial pro-rata") {
    val dir = tmpDir()
    val benchText = "a b c d e f g h" // 4 distinct 5-grams
    plantDocs(dir, Seq(
      (1L, benchText, "bench"),
      (100L, benchText, "web"), // exact copy: 4/4 → 10000 bp
      (101L, "p q r s t u v w x y", "web"), // disjoint: filtered out
      (102L, "a b c d e x2 y2 z2 w2 q2", "web"))) // 1 of 6 grams → 1666 bp
    val got = SparkEntry.queries("dedup_contaminate_ngram_frac")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((100L, 4L, 4L, 10000L), (102L, 6L, 1L, 1666L)))
  }

  test("Tables.events reads NTZ and UTC-adjusted micro timestamps to the same instants") {
    // the harness has shipped events.ts as TIMESTAMP(NANOS), as NTZ
    // micros, and as adjusted micros across generations — the loader
    // must normalize all of them to the same session-UTC TIMESTAMP or
    // instant functions (unix_micros, window) silently break. Write the
    // same wall-clock data in the two writable encodings and pin that
    // the loaded instants are identical and unix_micros resolves.
    val dirNtz = tmpDir()
    val dirUtc = tmpDir()
    val base = Seq(
      (1L, ts("2024-01-05 10:00:00"), 1L, 1.0),
      (2L, ts("2024-01-05 11:30:45"), 2L, 2.0))
      .toDF("event_id", "ts", "user_id", "value")
      .withColumn("event_type", lit("click"))
      .withColumn("props", lit(null).cast("string"))
    base.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dirNtz/events.parquet")
    base.write.mode("overwrite").parquet(s"$dirUtc/events.parquet")
    def instants(dir: String): Seq[(Long, Long)] =
      graft.Tables.events(spark, dir)
        .select(col("event_id"), expr("unix_micros(ts)"))
        .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    val (ntz, utc) = (instants(dirNtz), instants(dirUtc))
    assert(ntz === utc)
    assert(ntz.head._2 === 1704448800000000L) // 2024-01-05T10:00Z in micros
    // both must load as TIMESTAMP (instant), not NTZ
    Seq(dirNtz, dirUtc).foreach { dir =>
      assert(graft.Tables.events(spark, dir).schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType)
    }
  }

  test("attr_linear_touch_credit splits exactly 1e6 per conversion, remainder to last touch") {
    val dir = tmpDir()
    val rows = Seq(
      // user 1: two touches in-window, one outside (36h before)
      (1L, ts("2024-01-05 11:00:00"), 1L, "click"),
      (2L, ts("2024-01-05 11:30:00"), 1L, "view"),
      (3L, ts("2024-01-04 00:00:00"), 1L, "click"),
      (10L, ts("2024-01-05 12:00:00"), 1L, "purchase"),
      // user 2: conversion with no touches — contributes nothing
      (20L, ts("2024-01-06 09:00:00"), 2L, "purchase"),
      // user 3: three touches → 333333 each, remainder 1 to the last (view)
      (21L, ts("2024-01-07 10:00:00"), 3L, "click"),
      (22L, ts("2024-01-07 10:30:00"), 3L, "click"),
      (23L, ts("2024-01-07 11:00:00"), 3L, "view"),
      (24L, ts("2024-01-07 11:30:00"), 3L, "purchase"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0))
      .withColumn("props", lit(null).cast("string"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("attr_linear_touch_credit")(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("click", 3L, 2L, 500000L + 2 * 333333L),
      ("view", 2L, 2L, 500000L + 333334L)))
    // per-conversion credit conservation: 2 credited conversions × 1e6
    assert(got.map(_._4).sum === 2000000L)

    // U-shaped position attribution on the SAME planted events:
    // u1 (2 touches): 500k/500k; u3 (3 touches): first click 400k,
    // middle click 200k, last view 400k (+ 200000 % 1 = 0 remainder)
    val pos = SparkEntry.queries("attr_position_credit")(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(pos === Seq(
      ("click", 3L, 2L, 500000L + 400000L + 200000L),
      ("view", 2L, 2L, 500000L + 400000L)))
    assert(pos.map(_._4).sum === 2000000L)
  }

  test("attribution models conserve exactly 1e6 micro-credits per conversion at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf)
    // independent count of purchases with >= 1 touch in the trailing 24h
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("cid"),
        col("ts").as("cts"))
    val touch = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts").as("tts"))
    val credited = conv.join(touch, Seq("user_id"))
      .filter(col("tts") < col("cts") &&
        col("tts") >= col("cts") - org.apache.spark.sql.functions
          .expr("INTERVAL 24 hours"))
      .select(col("cid")).distinct().count()
    for (q <- Seq("attr_linear_touch_credit", "attr_position_credit")) {
      val total = SparkEntry.queries(q)(spark, sf)
        .agg(sum(col("credit_micro"))).as[Long].collect().head
      assert(total === credited * 1000000L, q)
    }
  }

  test("ts_cumulative_users equals the running distinct and ends at the total") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("ts_cumulative_users")(spark, sf)
      .as[(java.sql.Date, Long, Long)].collect().toSeq
    // monotone, cum == prefix-sum of n_new, final == |distinct users|
    assert(got.map(_._2).sum === got.last._3)
    val prefix = got.map(_._2).scanLeft(0L)(_ + _).tail
    assert(got.map(_._3) === prefix)
    val total = graft.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(got.last._3 === total)
  }

  test("dq_profile_drift: halves partition the table and NDVs bound row counts") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("dq_profile_drift")(spark, sf).collect()
    assert(rows.length === 4)
    val nOrders = graft.Tables.orders(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_a")) + r.getLong(r.fieldIndex("n_b"))
        === nOrders, s"halves must partition: $r")
      assert(r.getLong(r.fieldIndex("ndv_a")) <= r.getLong(r.fieldIndex("n_a")))
      assert(r.getLong(r.fieldIndex("ndv_b")) <= r.getLong(r.fieldIndex("n_b")))
    }
  }

  test("seq_ewma_anomaly replays the truncating integer recurrence exactly") {
    val dir = tmpDir()
    // descending values force NEGATIVE deviations: e = 100 → 100 +
    // (-100)/4 = 75 → 75 + (-75)/4 = 75 - 18 = 57 under TRUNCATING
    // division (floor would give 56) — this pins the division
    // convention both engines must share
    plantEvents(dir, Seq(
      (1L, ts("2024-01-05 10:00:00"), 1L, 1.00),
      (2L, ts("2024-01-05 10:01:00"), 1L, 0.00),
      (3L, ts("2024-01-05 10:02:00"), 1L, 0.00)))
    val got = SparkEntry.queries("seq_ewma_anomaly")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 57L, 100L, 3L)))
  }

  test("incremental LSH equals the full recompute under a different split") {
    // the registered query proves the 80/20 split against the brute
    // oracle; this pins a second split (odd/even) equal to the direct
    // full-corpus run — the merge identity itself, engine-vs-engine
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val old = docs.filter(col("doc_id") % 2 === 0)
    val fresh = docs.filter(col("doc_id") % 2 === 1)
    val oldPairs = graft.llm.MinHashLsh.nearDupPairs(old, "doc_id", "text", 0.8)
    val inc = graft.llm.MinHashLsh.nearDupPairsIncremental(
      old, oldPairs, fresh, "doc_id", "text", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val full = graft.llm.MinHashLsh.nearDupPairs(docs, "doc_id", "text", 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(inc === full)
    assert(full.nonEmpty) // the corpus plants near-dups; equality must not be vacuous
  }

  test("er_multipass_blocking: the suffix pass recovers matches the prefix pass misses") {
    val dir = tmpDir()
    // n1/n2 differ at char 1 (prefix blocks differ, suffix blocks agree,
    // lev=1): ONLY pass 2 can catch them. n3/n4 share the 16-prefix and
    // differ in the last char (lev=1): pass 1 catches; their suffixes
    // differ. n5 collides with nothing.
    Seq(
      (1L, "Axxxxxxxxxxxxxxxzzzzzzzz"),
      (2L, "Bxxxxxxxxxxxxxxxzzzzzzzz"),
      (3L, "ppppppppppppppppqqqqqqq1"),
      (4L, "ppppppppppppppppqqqqqqq2"),
      (5L, "completely-unrelated-name"))
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = SparkEntry.queries("er_multipass_blocking")(spark, dir).collect()(0)
    assert(r.getLong(r.fieldIndex("n_cand_p1")) === 1L) // n3-n4
    assert(r.getLong(r.fieldIndex("n_cand_p2")) === 1L) // n1-n2
    assert(r.getLong(r.fieldIndex("n_cand_union")) === 2L)
    assert(r.getLong(r.fieldIndex("n_matched")) === 2L)
    assert(r.getLong(r.fieldIndex("n_match_only_p2")) === 1L)
  }

  test("text_bigram_perplexity ranks the out-of-distribution doc most surprising") {
    val dir = tmpDir()
    val common = "the cat sat on the mat"
    val docs = (1L to 5L).map(i => (i, common, "web")) :+
      (6L, "zq xv qw er ty ui", "web")
    plantDocs(dir, docs)
    val got = SparkEntry.queries("text_bigram_perplexity")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    // every bigram of doc 6 is corpus-unique (n2=1) while doc 1-5 share
    // theirs five ways — doc 6 must head the surprise ranking
    assert(got.head._1 === 6L)
    assert(got.head._2 === 5L) // 6 words → 5 bigram tokens
    // repeated docs tie exactly (identical integer scores), doc_id order
    assert(got.tail.map(_._1) === Seq(1L, 2L, 3L, 4L, 5L))
    val repeatedScores = got.tail.map(_._3).distinct
    assert(repeatedScores.size === 1)
    assert(got.head._3 > repeatedScores.head)
  }
}
