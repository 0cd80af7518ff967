package graft.analytics

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-data semantics for the round-9 widening wave, driven through
  * the REGISTERED queries end-to-end (the RoundSevenSpec pattern): each
  * test writes a hand-checkable table set shaped like the harness data
  * and asserts against an independent in-spec recomputation — the
  * accuracy/membership claims the cross-engine oracle cannot express
  * (it proves agreement, not correctness of the estimate).
  */
class RoundNineWaveSpec extends SparkSpec {

  import spark.implicits._

  private def q(name: String, dir: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("r9spec").toString

  test("agg_ddsketch_quantiles estimates within the 2% relative-error band") {
    val dir = tmpDir()
    // 200 known prices: 1.00 .. 200.00
    val prices = (1 to 200).map(_.toDouble)
    prices.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("l_orderkey", "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = q("agg_ddsketch_quantiles", dir)
      .select("q_bp", "n", "k", "est_centi")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(5000, 9000, 9900))
    val sorted = prices.sorted
    out.foreach { case (qBp, n, k, estCenti) =>
      assert(n === 200L)
      assert(k === (qBp * 200L + 9999) / 10000)
      val exact = sorted(k.toInt - 1)
      val relErr = math.abs(estCenti / 100.0 - exact) / exact
      // 32 linear sub-buckets per log₂ octave: the integer midpoint is
      // within half a bucket (≤ 1/64 ≈ 1.6%) of any value in it
      assert(relErr <= 0.016, s"q=$qBp est=${estCenti / 100.0} exact=$exact")
    }
  }

  test("stats_chi2_independence matches the direct contingency computation") {
    val dir = tmpDir()
    // two full ISO weeks; 1970-01-01 is a Thursday so (epoch+4)%7 maps
    // Sunday→0; plant one type uniform over all days, one Monday-only
    val days = (0 until 14).map(i => Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i).atStartOfDay()))
    val rows =
      days.zipWithIndex.flatMap { case (t, i) =>
        (1 to 3).map(j => ((i * 10 + j).toLong, t, 1L, "uniform",
          Double.box(1.0), "{}"))
      } ++
      days.zipWithIndex.filter { case (_, i) => i % 7 == 0 } // Mondays
        .flatMap { case (t, i) =>
          (1 to 21).map(j => ((1000 + i * 100 + j).toLong, t, 2L, "monday",
            Double.box(1.0), "{}"))
        }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = q("stats_chi2_independence", dir)
      .select("event_type", "row_total", "n_cells", "chi2_part_micro", "dof")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // direct recompute with the query's own rounding convention
    val cells = rows.groupBy { r =>
      val epochDays = r._2.toLocalDateTime.toLocalDate.toEpochDay
      (r._4, ((epochDays + 4) % 7).toInt)
    }.map { case (k, v) => k -> v.size.toLong }
    val rowM = cells.groupBy(_._1._1).map { case (t, m) => t -> m.values.sum }
    val colM = cells.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val nn = cells.values.sum
    // full grid: unobserved cells contribute o=0 → term = e
    // NB: .toSeq before the inner map — a Set would collapse the six
    // equal off-Monday terms into one
    val expect = rowM.keys.toSeq.map { t =>
      t -> colM.keys.toSeq.map { w =>
        val o = cells.getOrElse((t, w), 0L)
        val e = rowM(t).toDouble * colM(w) / nn
        math.round(math.pow(o.toDouble - e, 2) / e * 1e6)
      }.sum
    }.toMap
    assert(got("uniform")._4 === expect("uniform"))
    assert(got("monday")._4 === expect("monday"))
    assert(got("monday")._2 === 42L) // 2 Mondays × 21
    assert(got.values.forall(_._5 === 6L)) // dof = (2−1)(7−1)
    // the planted dependence is detected: χ² = 63 ≫ the 12.59 critical
    // value at dof 6 (in a 2-row table both rows contribute equally —
    // residuals are symmetric)
    assert(got.values.map(_._4).sum > 50L * 1000000L)
  }

  test("basket_pmi_pairs ranks the planted exclusive pair first") {
    val dir = tmpDir()
    // orders 1..5: parts {1,2} exclusively (perfect association);
    // orders 1..20: parts 3 and 4 everywhere (popular, independent)
    val li = (1L to 5L).flatMap(o => Seq((o, 1L), (o, 2L))) ++
      (1L to 20L).flatMap(o => Seq((o, 3L), (o, 4L)))
    li.toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = q("basket_pmi_pairs", dir)
      .select("pa", "pb", "support", "pmi_micro")
      .as[(Long, Long, Long, Long)].collect()
    val top = out.head
    assert((top._1, top._2, top._3) === ((1L, 2L, 5L)))
    // pmi(1,2) = ln((5/5)·(20/5)) = ln 4
    assert(top._4 === math.round(math.log(5.0 / 5 * (20.0 / 5)) * 1e6))
    // the popular pair is present but scores ln 1 = 0
    val popular = out.find(r => r._1 == 3L && r._2 == 4L).get
    assert(popular._3 === 20L && popular._4 === 0L)
  }

  test("er_sorted_neighborhood candidates are exactly the w=4 window pairs") {
    val dir = tmpDir()
    // 10 customers, balance i dollars → sorted order IS custkey order;
    // names all pairwise levenshtein 1 (single final-char difference)
    val rows = (1 to 10).map(i =>
      (i.toLong, s"CUST_$i", 0L, i.toDouble, "SEG"))
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val r = q("er_sorted_neighborhood", dir).collect().head
    val pairs = for {
      i <- 0 until 10; j <- i + 1 until 10; if j - i <= 3
    } yield (i, j)
    assert(r.getAs[Long]("n_cand") === pairs.size.toLong) // 3n−6 = 24
    assert(r.getAs[Long]("sum_idx") === pairs.map { case (i, j) => i + j }.sum)
    // CUST_1..CUST_9 differ in one char (d1); CUST_10 is d1 from CUST_1
    // (one insertion) but d2 from the rest — recompute rather than guess
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (x, y) =>
        if (x == 0) y else if (y == 0) x else 0 }
      for (x <- 1 to a.length; y <- 1 to b.length)
        dp(x)(y) = math.min(math.min(dp(x - 1)(y), dp(x)(y - 1)) + 1,
          dp(x - 1)(y - 1) + (if (a(x - 1) == b(y - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val names = rows.sortBy(x => (x._4, x._1)).map(_._2)
    val d1 = pairs.count { case (i, j) => lev(names(i), names(j)) <= 1 }
    val d2 = pairs.count { case (i, j) => lev(names(i), names(j)) <= 2 }
    assert(r.getAs[Long]("n_match_d1") === d1.toLong)
    assert(r.getAs[Long]("n_match_d2") === d2.toLong)
  }

  test("docs_ccnet_perplexity_buckets cuts exact ordered terciles") {
    val dir = tmpDir()
    // 9 docs with ≥2 tokens each; fluency varies from pure repetition
    // to unique-vocabulary text
    val docs = (1 to 9).map { i =>
      val text =
        if (i <= 3) "the cat sat the cat sat the cat sat"
        else if (i <= 6) s"the cat sat on mat number $i today"
        else s"zx$i qw$i er$i ty$i ui$i op$i"
      (i.toLong, text, "en", "s", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q("docs_ccnet_perplexity_buckets", dir)
      .select("bucket", "n_docs", "min_nll_micro", "max_nll_micro", "sum_ids")
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1, 2, 3))
    assert(out.map(_._2).toSeq === Seq(3L, 3L, 3L)) // 9 docs → 3/3/3
    assert(out.map(_._5).sum === (1 to 9).map(_.toLong).sum)
    // tercile boundaries respect the NLL order
    assert(out(0)._4 <= out(1)._3 && out(1)._4 <= out(2)._3)
    // repetitive docs are the fluent head, unique-vocab docs the tail
    assert(out(0)._5 === 1L + 2L + 3L)
    assert(out(2)._5 === 7L + 8L + 9L)
  }

  test("text_ngram_novelty_curve conserves first-seen attribution") {
    val dir = tmpDir()
    // 40 docs over shared + private vocab so shards overlap on grams
    val docs = (1 to 40).map { i =>
      val shared = "alpha beta gamma delta epsilon zeta"
      val priv = s"w${i}a w${i}b w${i}c w${i}d w${i}e"
      (i.toLong, s"$shared $priv", "en", "s", 10L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q("text_ngram_novelty_curve", dir)
      .select("shard", "n_distinct_grams", "n_novel", "novel_bp")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // the earliest populated shard is all-novel by construction
    assert(out.head._4 === 10000L)
    // every gram is novel in exactly one shard: Σ n_novel = |grams|
    val allGrams = docs.flatMap { case (id, text, _, _, _) =>
      graft.llm.Hashing.words(text).sliding(5).filter(_.length == 5)
        .map(_.mkString(" "))
    }.toSet
    assert(out.map(_._3).sum === allGrams.size.toLong)
    out.foreach { r =>
      assert(r._3 <= r._2 && r._4 >= 0 && r._4 <= 10000)
      assert(r._4 === r._3 * 10000 / r._2)
    }
  }

  test("dq_id_gaps_islands finds exactly the planted consecutive runs") {
    val dir = tmpDir()
    // F-keys {1,2,3, 7,8, 10, 15,16,17,18} → islands [15-18],[1-3],[7-8],[10]
    val fKeys = Set(1L, 2L, 3L, 7L, 8L, 10L, 15L, 16L, 17L, 18L)
    (1L to 20L).map(k => (k, if (fKeys(k)) "F" else "O"))
      .toDF("o_orderkey", "o_orderstatus")
      .write.parquet(s"$dir/orders.parquet")
    val out = q("dq_id_gaps_islands", dir)
      .select("len", "start_key", "end_key", "n_islands", "n_rows")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((4L, 15L, 18L), (3L, 1L, 3L), (2L, 7L, 8L), (1L, 10L, 10L)))
    assert(out.forall(r => r._4 === 4L && r._5 === 10L))
  }

  test("graph_hits_bipartite computes integer alternating-path counts") {
    val dir = tmpDir()
    // bipartite: c1→{s1,s2}, c2→{s1}; a1=deg, h1=Σ a1, a2=Σ h1
    Seq((1L, 1L), (2L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, 1L), (1L, 2L), (2L, 1L)).toDF("l_orderkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = q("graph_hits_bipartite", dir)
      .select("su", "a1", "a2").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // a1: s1=2, s2=1; h1: c1=a1(s1)+a1(s2)=3, c2=a1(s1)=2;
    // a2: s1=h1(c1)+h1(c2)=5, s2=h1(c1)=3
    assert(out(1000001L) === ((2L, 5L)))
    assert(out(1000002L) === ((1L, 3L)))
  }

  test("emb_matryoshka_prefix_recall separates prefix-blind from prefix-aware dims") {
    val dir = tmpDir()
    // query 0 = all-ones; "good" vectors anti-align on dims 1-8 but
    // align strongly after; "trap" vectors align on dims 1-8 only →
    // the 8-d prefix ranks all traps above all goods (recall 0), the
    // 16-d prefix already separates them (recall 100)
    def vec(a: Float, b: Float, c: Float, jitter: Int): Array[Float] =
      Array.tabulate(64) { i =>
        val base = if (i < 8) a else if (i < 16) b else c
        base + (if (i == 63) jitter * 1e-4f else 0f)
      }
    val query = (0L, Array.fill(64)(1.0f), 0)
    val good = (0 until 5).map(j => (10L + j, vec(-1f, 2f, 1f, j), 0))
    val trap = (0 until 5).map(j => (20L + j, vec(1f, -2f, -1f, j), 0))
    (Seq(query) ++ good ++ trap)
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = q("emb_matryoshka_prefix_recall", dir)
      .select("prefix_dim", "query_id", "n_hits", "recall_pct")
      .as[(Int, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out((8, 0L)) === ((0L, 0L)))
    assert(out((16, 0L)) === ((5L, 100L)))
  }

  test("stats_kendall_tau counts planted concordance exactly") {
    val dir = tmpDir()
    // day j has j events; per-event value (6−j)/j dollars → daily value
    // mass (6−j)·100 centi: x strictly increasing, y strictly decreasing
    // → all 10 day pairs discordant
    val rows = for {
      j <- 1 to 5
      i <- 1 to j
    } yield ((j * 10 + i).toLong,
      Timestamp.valueOf(f"2024-03-0$j%d 09:00:00"), 1L, "e",
      Double.box((6.0 - j) / j), "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = q("stats_kendall_tau", dir).collect().head
    assert(r.getAs[Long]("n_pairs") === 10L)
    assert(r.getAs[Long]("n_concordant") === 0L)
    assert(r.getAs[Long]("n_discordant") === 10L)
    assert(r.getAs[Long]("ties_x") === 0L && r.getAs[Long]("ties_y") === 0L)
  }

  test("stats_spearman_rho publishes exact doubled-rank integrals") {
    val dir = tmpDir()
    val rows = for {
      j <- 1 to 5
      i <- 1 to j
    } yield ((j * 10 + i).toLong,
      Timestamp.valueOf(f"2024-03-0$j%d 09:00:00"), 1L, "e",
      Double.box((6.0 - j) / j), "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = q("stats_spearman_rho", dir).collect().head
    assert(r.getAs[Long]("n") === 5L)
    // doubled ranks: rx = (2,4,6,8,10), ry reversed → Σ(rx−ry)² =
    // 64+16+0+16+64 = 160 (= 4·Σd² with d = (−4,−2,0,2,4))
    assert(r.getAs[Long]("sum_4d2") === 160L)
    assert(r.getAs[Long]("tie_cubic_x") === 0L)
    assert(r.getAs[Long]("tie_cubic_y") === 0L)
  }

  test("warehouse_scd2_pit_snapshot reconstructs the state at the midpoint") {
    val dir = tmpDir()
    def e(id: Long, t: String, u: Long, typ: String) =
      (id, Timestamp.valueOf(t), u, typ, Double.box(1.0), "{}")
    // data spans 10:00–14:00 → T = 12:00. At T: user1 in A (B opens
    // 13:00), user2 in B, user3 not yet active (first event 13:30),
    // user4 in A (B opens 12:30; the repeated 11:30 A extends, not
    // versions)
    val rows = Seq(
      e(1, "2024-03-01 10:00:00", 1, "A"), e(2, "2024-03-01 13:00:00", 1, "B"),
      e(3, "2024-03-01 11:00:00", 2, "B"), e(4, "2024-03-01 14:00:00", 2, "B"),
      e(5, "2024-03-01 13:30:00", 3, "C"),
      e(6, "2024-03-01 10:30:00", 4, "A"), e(7, "2024-03-01 11:30:00", 4, "A"),
      e(8, "2024-03-01 12:30:00", 4, "B"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = q("warehouse_scd2_pit_snapshot", dir)
      .select("event_type", "n_users_active", "sum_user_ids")
      .as[(String, Long, Long)].collect().toSet
    assert(out === Set(("A", 2L, 5L), ("B", 1L, 2L)))
  }

  test("dedup_threshold_sweep matches an independent all-pairs recompute") {
    val dir = tmpDir()
    // near-dup families at different overlap levels plus unrelated docs
    val base = (1 to 30).map(j => s"w$j").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base), // identical → j = 1.0
      (3L, base + " x1 x2 x3 x4 x5"), // high-overlap variant
      (4L, (1 to 18).map(j => s"w$j").mkString(" ") + " y1 y2 y3"),
      (5L, (1 to 60).map(j => s"z$j").mkString(" ")))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = q("dedup_threshold_sweep", dir)
      .select("tau10", "n_pairs", "n_docs_involved")
      .as[(Int, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // independent recompute: exact 3-gram Jaccard over all pairs
    val sets = docs.map { case (id, t, _, _, _) =>
      id -> graft.llm.Hashing.words(t).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    }.toMap
    val pairs = for {
      i <- sets.keys.toSeq.sorted; j <- sets.keys.toSeq.sorted
      if i < j
      inter = (sets(i) & sets(j)).size
      un = (sets(i) | sets(j)).size
      if un > 0
    } yield (i, j, inter, un)
    Seq(5, 6, 7, 8, 9).foreach { tau =>
      val want = pairs.filter { case (_, _, inter, un) => inter * 10 >= un * tau }
      val wantDocs = want.flatMap(p => Seq(p._1, p._2)).distinct.size
      assert(got(tau) === ((want.size.toLong, wantDocs.toLong)),
        s"tau=$tau got=${got(tau)} want=(${want.size}, $wantDocs)")
    }
    // the planted identical pair survives every threshold
    assert(got(9)._1 >= 1L)
  }

  test("dedup_threshold_sweep zero-fills thresholds no pair reaches") {
    val dir = tmpDir()
    // one pair just over tau=0.5, nothing tighter: every tau row must
    // still publish (n_pairs = 0), not vanish
    // a: 18 shingles; b: 17 shingles, 13 shared → J = 13/22 ≈ 0.59
    val a = (1 to 20).map(j => s"w$j").mkString(" ")
    val b = (1 to 15).map(j => s"w$j").mkString(" ") + " " +
      (1 to 4).map(j => s"q$j").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, (1 to 40).map(j => s"z$j")
      .mkString(" ")))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = q("dedup_threshold_sweep", dir)
      .select("tau10", "n_pairs", "n_docs_involved")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(5, 6, 7, 8, 9))
    assert(got.head._2 === 1L && got.head._3 === 2L)
    assert(got.drop(1).forall(r => r._2 === 0L && r._3 === 0L))
  }

  test("seq_pattern_match_negation excludes journeys with intervening errors") {
    val dir = tmpDir()
    def e(id: Long, u: Long, minute: Int, typ: String) =
      (id, Timestamp.valueOf(f"2024-03-01 10:$minute%02d:00"), u, typ,
        Double.box(1.0), "{}")
    val rows = Seq(
      // user 1: v c p → match
      e(1, 1, 1, "view"), e(2, 1, 2, "click"), e(3, 1, 3, "purchase"),
      // user 2: v e c p → error between view and click: no match
      e(4, 2, 1, "view"), e(5, 2, 2, "error"), e(6, 2, 3, "click"),
      e(7, 2, 4, "purchase"),
      // user 3: v c e p → error between click and purchase: no match
      e(8, 3, 1, "view"), e(9, 3, 2, "click"), e(10, 3, 3, "error"),
      e(11, 3, 4, "purchase"),
      // user 4: e v c p → the error PRECEDES the v anchor: match
      e(12, 4, 1, "error"), e(13, 4, 2, "view"), e(14, 4, 3, "click"),
      e(15, 4, 4, "purchase"),
      // user 5: v c only → no purchase: no match
      e(16, 5, 1, "view"), e(17, 5, 2, "click"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val r = q("seq_pattern_match_negation", dir).collect().head
    assert(r.getAs[Long]("n_users") === 5L)
    assert(r.getAs[Long]("n_matched") === 2L)
    assert(r.getAs[Long]("sum_matched_ids") === 1L + 4L)
    assert(r.getAs[Long]("sum_journey_len") === 17L)
  }

  test("graph_harmonic_hyperball is exact on a planted path graph") {
    val dir = tmpDir()
    // path 1-2-3-4-5 as supplier co-occurrence: each edge appears in 5
    // orders (the suppEdges support floor)
    val li = for {
      (a, b) <- Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      rep <- 1 to 5
      ok = a * 1000 + b * 100 + rep
      sk <- Seq(a, b)
    } yield (ok, sk)
    li.toDF("l_orderkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = q("graph_harmonic_hyperball", dir)
      .select("node", "b1", "b2", "b3", "harmonic_milli")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // below sketch width the balls are exact: center sees the whole
    // path by radius 2, the ends grow one hop per radius
    assert(out(3L) === ((3L, 3L, 5L, 5L, 2000L + 1000L + 0L)))
    assert(out(1L) === ((1L, 2L, 3L, 4L, 1000L + 500L + 333L)))
    assert(out(2L) === ((2L, 3L, 4L, 5L, 2000L + 500L + 333L)))
    assert(out(5L)._5 === out(1L)._5 && out(4L)._5 === out(2L)._5)
  }

  test("every extension-wave query survives fully empty inputs") {
    // an empty partition is a normal event at 1000 executors — every
    // registered query must yield a well-formed (possibly empty) frame,
    // never throw (the EdgeCaseSpec contract, applied to the wave)
    val dir = tmpDir()
    Seq.empty[(Long, java.sql.Timestamp, Long, String, java.lang.Double,
        String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq.empty[(Long, Long, Double, Double, Double, String)]
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_shipdate")
      .withColumn("l_suppkey", lit(0L)).limit(0)
      .write.parquet(s"$dir/lineitem.parquet")
    Seq.empty[(Long, Long, String)]
      .toDF("o_orderkey", "o_custkey", "o_orderstatus")
      .write.parquet(s"$dir/orders.parquet")
    Seq.empty[(Long, String, Long, Double, String)]
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val expectRows = Map(
      "dedup_threshold_sweep" -> Some(5L), // zero-filled τ frame
      "stats_kendall_tau" -> Some(1L), // global aggregate
      "stats_spearman_rho" -> Some(1L),
      "seq_pattern_match_negation" -> Some(1L))
    val waveQueries = Seq("agg_ddsketch_quantiles", "stats_chi2_independence",
      "basket_pmi_pairs", "er_sorted_neighborhood",
      "docs_ccnet_perplexity_buckets", "text_ngram_novelty_curve",
      "docs_length_bucket_batching", "dq_id_gaps_islands",
      "graph_hits_bipartite", "emb_matryoshka_prefix_recall",
      "stats_kendall_tau", "stats_spearman_rho",
      "warehouse_scd2_pit_snapshot", "dedup_threshold_sweep",
      "seq_pattern_match_negation", "graph_harmonic_hyperball")
    waveQueries.foreach { name =>
      val rows = q(name, dir).collect()
      expectRows.getOrElse(name, None).foreach { want =>
        assert(rows.length.toLong === want, s"$name row count")
      }
    }
  }

  test("docs_length_bucket_batching plans power-of-two buckets exactly") {
    val dir = tmpDir()
    // token counts 1, 2, 3, 5, 100, 20000 → widths 1, 2, 4, 8, 128, 16384
    val mk = (n: Int) => (1 to n).map(j => s"t$j").mkString(" ")
    val docs = Seq(1, 2, 3, 5, 100, 20000).zipWithIndex.map {
      case (n, i) => ((i + 1).toLong, mk(n), "en", "s", n.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = q("docs_length_bucket_batching", dir)
      .select("width", "n_docs", "docs_per_batch", "sum_tokens",
        "pad_tokens", "n_batches", "util_bp")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet === Set(1L, 2L, 4L, 8L, 128L, 16384L))
    // width 8 holds tc=5: pad 3, one batch of 2048 slots
    assert(out(8L)._4 === 5L && out(8L)._5 === 3L && out(8L)._6 === 1L)
    assert(out(8L)._3 === 2048L)
    // the 20000-token doc truncates to the 16384 cap: zero padding,
    // exactly one one-doc batch at full utilization
    assert(out(16384L)._4 === 16384L && out(16384L)._5 === 0L)
    assert(out(16384L)._3 === 1L && out(16384L)._6 === 1L)
    assert(out(16384L)._7 === 10000L)
    // utilization = fit / (batches · slots · width), in bp
    out.values.foreach { r =>
      assert(r._7 === r._4 * 10000 / (r._6 * r._3 * r._1))
    }
  }
}
