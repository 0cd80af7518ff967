package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan contracts — the properties that make these queries
  * viable at 1000-executor / 100 TB scale, asserted so a refactor can't
  * silently regress them:
  *  - dimension joins stay broadcast (no fact-side shuffle for dims),
  *  - filters and projections reach the parquet scan (PushedFilters /
  *    pruned ReadSchema),
  *  - top-K plans as TakeOrderedAndProject (per-partition heaps, no
  *    global sort),
  *  - whole-stage codegen covers the scan→filter→partial-agg pipeline.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  private def planString(df: DataFrame): String = {
    df.collect() // finalize AQE so the real join strategies are visible
    planOf(df).toString
  }

  test("q5: all four dimension joins broadcast; no shuffle for dims") {
    val s = planString(SparkEntry.queries("q5_nation_revenue")(spark, sf))
    assert(s.contains("BroadcastHashJoin"), s)
    // the only sort-merge (or shuffled-hash) join allowed is fact-fact
    val smj = "SortMergeJoin".r.findAllIn(s).length
    assert(smj <= 1, s"expected <=1 fact-fact SMJ, got $smj\n$s")
  }

  test("q6: filters push into the parquet scan; scan reads pruned schema") {
    val df = SparkEntry.queries("q6_revenue_forecast")(spark, sf)
    val scan = planOf(df).collectLeaves().map(_.toString).mkString("\n")
    assert(scan.contains("PushedFilters: ["), scan)
    assert(scan.contains("IsNotNull"), scan)
    // projection pruning: only the 4 referenced columns are read
    assert(!scan.contains("l_orderkey"), s"unpruned scan: $scan")
  }

  test("topK plans as TakeOrderedAndProject, never a global Sort+Limit") {
    val s = planString(SparkEntry.queries("topk_parts_by_lineitems")(spark, sf))
    assert(s.contains("TakeOrderedAndProject"), s)
  }

  test("anti/semi joins use broadcast variants at this scale") {
    val s = planString(SparkEntry.queries("join_anti_customers_no_orders")(spark, sf))
    assert(s.contains("LeftAnti"), s)
  }

  test("q1: whole-stage codegen covers scan→filter→partial agg") {
    val s = planString(SparkEntry.queries("q1_pricing_summary")(spark, sf))
    // codegen stages appear as "*(n) " prefixes in the plan toString
    assert(s.contains("*(1) "), s)
    assert(s.contains("partial_sum"), s) // map-side combine before shuffle
    assert(s.contains("HashAggregate"), s) // hash agg, not sort-agg
  }

  test("weight plan compiles under codegen (no janino fallback)") {
    // fallback=false turns a janino compile failure (64KB method blowup
    // from inlined subtrees — the round-2 defect) into a hard error
    // instead of a silent interpreted-mode regression
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = SparkEntry.queries("etl_weight_bmi")(spark, sf).collect()
      assert(rows.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("full ETL pipeline compiles under codegen (no 64KB janino fallback)") {
    // the round-4 defect: project collapse re-inlined the patients
    // cleaning chain into every log-union branch, the generated
    // processNext() grew past janino's 64 KB method limit, and the whole
    // stage silently ran interpreted (4 ERROR lines per Verify/Bench).
    // fallback=false turns any recurrence into a hard test failure.
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = graft.etl.EtlPipeline.run(spark,
        "/root/repo/fixtures/patients.csv",
        "/root/repo/fixtures/encounters.csv",
        "/root/repo/fixtures/diagnoses.xml")
      assert(r.patients.collect().nonEmpty)
      assert(r.encounters.collect().nonEmpty)
      assert(r.diagnoses.collect().nonEmpty)
      assert(r.logs.collect().nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("bucketed ops never degenerate to cartesian products") {
    // the LSH family must join through bucket keys — a cartesian or
    // nested-loop join here means candidate generation went all-pairs
    Seq("dedup_minhash_lsh", "dedup_simhash_pairs",
      "dedup_winnowing_overlap").foreach { q =>
      val s = planString(SparkEntry.queries(q)(spark, sf))
      assert(!s.contains("CartesianProduct"), s"$q went cartesian:\n$s")
      assert(!s.contains("BroadcastNestedLoopJoin"), s"$q went nested-loop:\n$s")
    }
    // ann_lsh_topk's REGISTERED query carries a recall-audit leg whose
    // ground truth is bruteTopK over the 10-query sample — a broadcast
    // NLJ with a 10-row build side (O(N) scan, the sampled-truth-refresh
    // shape), which is intentional. The INDEX path must still be
    // bucketed: assert on the operator itself.
    val e = graft.Tables.embeddings(spark, sf)
    val lshPlan = planString(graft.llm.Ann.lshTopK(
      e, e.filter(org.apache.spark.sql.functions.col("vec_id") < 10),
      "vec_id", "embedding", k = 5))
    assert(!lshPlan.contains("CartesianProduct"), lshPlan)
    assert(!lshPlan.contains("BroadcastNestedLoopJoin"), lshPlan)
    val full = planString(SparkEntry.queries("ann_lsh_topk")(spark, sf))
    assert(!full.contains("CartesianProduct"), full)
  }

  test("q19: part dim broadcast; per-side residuals pushed to scans") {
    val df = SparkEntry.queries("q19_bracket_revenue")(spark, sf)
    val s = planString(df)
    assert(s.contains("BroadcastHashJoin"), s)
    // the OR-of-brackets must reach BOTH scans as per-side residuals —
    // 'PushedFilters: [' alone would pass even when the list is empty
    val scan = planOf(df).collectLeaves().map(_.toString).mkString("\n")
    assert(scan.contains("GreaterThanOrEqual(l_quantity"), scan)
    assert(scan.contains("EqualTo(p_brand"), scan)
  }

  test("q9: one fact-fact shuffle join; part/supplier/nation broadcast") {
    val s = planString(SparkEntry.queries("q9_profit_by_nation_year")(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(s).length >= 3, s)
    val smj = "SortMergeJoin".r.findAllIn(s).length
    assert(smj <= 1, s"expected <=1 fact-fact SMJ, got $smj\n$s")
  }

  test("label propagation: edge frame checkpointed; mode argmax never windows or goes cartesian") {
    val s = planString(SparkEntry.queries("graph_label_propagation")(spark, sf))
    // the sym edge list must come from the one checkpoint, not a re-plan
    // of the orders x lineitem join per iteration
    assert(s.contains("Scan ExistingRDD"), s)
    assert(!s.contains("Window"), s"per-node mode must be max(struct), not a window:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("salted heavy hitters: two aggregation exchanges, then top-K heap") {
    val s = planString(SparkEntry.queries("agg_salted_heavy_hitters")(spark, sf))
    assert(s.contains("TakeOrderedAndProject"), s)
    // the salt column must survive into phase 1's grouping keys — its
    // disappearance means the two-phase rewrite collapsed back to a
    // single hot-key groupBy (the regression this test exists to catch)
    assert(s.contains("_salt"), s)
    assert("partial_sum|partial_count".r.findAllIn(s).nonEmpty, s)
  }

  test("range join keeps its equi key: sort-merge or hash, never nested-loop") {
    val s = planString(
      SparkEntry.queries("range_join_clicks_before_purchase")(spark, sf))
    assert(!s.contains("BroadcastNestedLoopJoin"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q4 EXISTS plans as a semi join, not an aggregate-distinct rewrite") {
    val s = planString(SparkEntry.queries("q4_priority_returned_orders")(spark, sf))
    assert(s.contains("LeftSemi"), s)
  }

  test("q8: five dimension broadcasts; only the fact-fact join shuffles") {
    val s = planString(SparkEntry.queries("q8_national_market_share")(spark, sf))
    assert(s.contains("BroadcastHashJoin"), s)
    val smj = "SortMergeJoin".r.findAllIn(s).length
    assert(smj <= 1, s"expected <=1 fact-fact SMJ, got $smj\n$s")
  }

  test("q17: correlated average decorrelates to a broadcast, not a shuffle join") {
    val s = planString(SparkEntry.queries("q17_small_quantity_revenue")(spark, sf))
    // the per-part averages (bounded by |parts of the brand|) must reach
    // the fact scan as a broadcast — a sort-merge here re-shuffles the
    // whole fact table against a dim-sized side
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("q18: top-10 large orders plans as TakeOrderedAndProject") {
    val s = planString(SparkEntry.queries("q18_large_volume_customers")(spark, sf))
    assert(s.contains("TakeOrderedAndProject"), s)
  }

  test("decontamination joins the benchmark fingerprints by broadcast") {
    val s = planString(SparkEntry.queries("dedup_decontaminate_winnow")(spark, sf))
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("training pipelines: corpus scan count stays bounded (no stage re-evaluation)") {
    // the r3 regression: nearDupPairs referenced its input 4x (band
    // self-join x2 + text join-back x2), so composing it after a quality
    // filter + dedup window re-ran that whole chain per reference — the
    // v1 pipeline planned FIVE full corpus scans. The restructured
    // operator consumes its input exactly twice (grouped band buckets +
    // one exploded-pair text fetch), bounding v1 at 3 document scans
    // (bands, text fetch, survivor agg) and v2 at 5 (those three +
    // decontamination corpus pass + benchmark side). An increase means
    // someone reintroduced a self-join or a chained anti-join that
    // re-evaluates an upstream stage.
    val v1 = planString(SparkEntry.queries("docs_training_pipeline")(spark, sf))
    val s1 = "Scan parquet".r.findAllIn(v1).length
    assert(s1 <= 3, s"docs_training_pipeline plans $s1 corpus scans (max 3):\n$v1")
    val v2 = planString(SparkEntry.queries("docs_training_pipeline_v2")(spark, sf))
    val s2 = "Scan parquet".r.findAllIn(v2).length
    assert(s2 <= 5, s"docs_training_pipeline_v2 plans $s2 document scans (max 5):\n$v2")
    // v4's LSH/CC stages read the checkpointed paragraph-survivor frame,
    // so the corpus parquet itself is scanned only by the quality +
    // paragraph stages (chunk fan-out, keep-first window, join-back)
    val v4 = planString(SparkEntry.queries("docs_training_pipeline_v4")(spark, sf))
    val s4 = "Scan parquet".r.findAllIn(v4).length
    assert(s4 <= 3, s"docs_training_pipeline_v4 plans $s4 corpus scans (max 3):\n$v4")
    assert(!v4.contains("CartesianProduct") &&
      !v4.contains("BroadcastNestedLoopJoin"), v4)
    // the full flagship keeps the LSH-family contracts end-to-end:
    // benchmark fingerprints broadcast, candidate generation bucketed
    assert(v2.contains("BroadcastHashJoin"), v2)
    assert(!v2.contains("CartesianProduct"), v2)
    assert(!v2.contains("BroadcastNestedLoopJoin"), v2)
  }

  test("stream enrichment joins the dimension by broadcast, never a shuffle") {
    val s = planString(SparkEntry.queries("stream_enrich_static")(spark, sf))
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("salted join keys on (key, salt) composite; no cartesian fallback") {
    val s = planString(SparkEntry.queries("join_salted_skew")(spark, sf))
    // the salt must be part of the join key (hot-key fan-out), not a
    // post-join filter — a residual-filter plan would keep the skew
    assert(s.contains("_fsalt"), s)
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("sequence packing: one document scan, one window sort") {
    val df = SparkEntry.queries("docs_pack_windows")(spark, sf)
    val s = planString(df)
    assert("Scan parquet".r.findAllIn(s).length == 1,
      s"packing should read the corpus exactly once:\n$s")
    assert("Window".r.findAllIn(s).length == 1,
      s"packing needs exactly one window pass:\n$s")
  }

  test("cluster dedup: the CC loop's edge frame is checkpointed (no LSH re-plan)") {
    // connected components iterates joins against the edge list; if the
    // localCheckpoint is dropped, every iteration re-plans the ENTIRE
    // LSH pair generation and the executed plan blows up with repeated
    // band-explode subtrees. A checkpointed edge frame appears as a
    // scan over an RDD, so the final plan contains no minhash UDF at all.
    val s = planString(SparkEntry.queries("dedup_lsh_clusters")(spark, sf))
    assert(s.contains("Scan ExistingRDD") || s.contains("LocalTableScan"),
      s"expected checkpointed edges in the final aggregation plan:\n$s")
  }

  test("triangle census: wedge joins broadcast the edge list, never sort-merge") {
    val s = planString(SparkEntry.queries("graph_triangle_count")(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(s).length >= 2, s)
    assert(!s.contains("SortMergeJoin"), s)
    assert(!s.contains("CartesianProduct"), s)
    // the only nested-loop joins permitted are the 1-row scalar
    // assembly crossJoins of the three final counters
    assert("BroadcastNestedLoopJoin".r.findAllIn(s).length <= 2, s)
  }

  test("equi-depth histogram: one boundary broadcast, two scans, no extra shuffle") {
    val df = SparkEntry.queries("agg_equidepth_hist_price")(spark, sf)
    val s = planString(df)
    assert("Scan parquet".r.findAllIn(s).length === 2,
      s"expected percentile pass + bucket pass only:\n$s")
    assert("BroadcastExchange".r.findAllIn(s).length === 1, s)
  }

  test("window value zoo: window and final groupBy share ONE user_id shuffle") {
    val s = planString(SparkEntry.queries("window_value_functions")(spark, sf))
    assert("Exchange hashpartitioning".r.findAllIn(s).length === 1,
      s"the groupBy must reuse the window's user_id partitioning:\n$s")
  }

  test("rolling WAU: dedup shrinks BEFORE the 7-day fan-out; no join anywhere") {
    val s = planString(SparkEntry.queries("agg_rolling_7d_distinct_users")(spark, sf))
    assert("Generate".r.findAllIn(s).length === 1, s)
    assert(!s.contains("Join"), s"the sliding DISTINCT must not self-join:\n$s")
    assert("Scan parquet".r.findAllIn(s).length === 1, s)
  }

  test("benford audit: a single scan feeds digit histogram and shares") {
    val s = planString(SparkEntry.queries("dq_benford_first_digit")(spark, sf))
    assert("Scan parquet".r.findAllIn(s).length === 1, s)
  }

  test("contamination fraction: benchmark fingerprint set joins broadcast") {
    val s = planString(
      SparkEntry.queries("dedup_contaminate_ngram_frac")(spark, sf))
    // the corpus side must never shuffle on gram fingerprints — the
    // bench set broadcasts and the only exchange keys on doc_id
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("round-6 window operators never plan an unpartitioned window") {
    // "No Partition Defined" windows move the whole input to one task —
    // the r4-flagged scale-killer class; every window below must carry
    // a partition spec
    Seq("ts_interval_coverage", "storage_compaction_bins",
      "attr_linear_touch_credit").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      val unpartitioned = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      assert(unpartitioned.isEmpty, s"$q has an unpartitioned window")
    }
  }

  test("distribution drift: decile boundaries broadcast to both bucket passes") {
    val s = planString(SparkEntry.queries("dq_distribution_drift")(spark, sf))
    // the 1-row boundary frame must reach each half as a broadcast
    // (nested-loop on the 1-row build side: ref pass, cur pass, plus
    // the two total scalars), never by shuffling the event stream
    assert("BroadcastNestedLoopJoin".r.findAllIn(s).length >= 2, s)
    // the only sort-merge join allowed is the bucket-level FULL OUTER —
    // a ≤10-row post-aggregation frame, not event-sized data
    assert("SortMergeJoin".r.findAllIn(s).length <= 1, s)
    assert(s.contains("FullOuter"), s)
  }

  test("JoinGate: shuffle_merge side hint flips the join off broadcast, AQE honors it") {
    // the decade-regime mechanism (r13 verdict item 2): above the gate
    // the text-dedup side tables carry this hint; it must beat AQE's
    // size-based broadcast choice even when the side is tiny
    val probe = spark.range(0, 10000).selectExpr("id % 100 AS k", "id AS v")
    val side = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS w")
    val b = planString(probe.join(graft.ops.JoinGate.sideTable(side, smj = false), "k"))
    assert(b.contains("BroadcastHashJoin"), b)
    val m = planString(probe.join(graft.ops.JoinGate.sideTable(side, smj = true), "k"))
    assert(m.contains("SortMergeJoin"), m)
    assert(!m.contains("BroadcastHashJoin"), m)
    // broadcastUnless: explicit broadcast below the gate, SMJ above it
    val eb = planString(probe.join(
      graft.ops.JoinGate.broadcastUnless(side, smj = false), "k"))
    assert(eb.contains("BroadcastHashJoin"), eb)
    val em = planString(probe.join(
      graft.ops.JoinGate.broadcastUnless(side, smj = true), "k"))
    assert(em.contains("SortMergeJoin"), em)
  }

  test("JoinGate: the documents-size gate stays in the broadcast regime at bench SFs") {
    val docs = Tables.documents(spark, sf)
    val bytes = graft.ops.JoinGate.inputBytes(docs)
    assert(bytes > 0L, "gate must see the parquet scan's files")
    assert(!graft.ops.JoinGate.textDedupSmj(docs),
      s"sf0.001 docs ($bytes B) must stay under the ${graft.ops.JoinGate.TextDedupSmjBytes} B gate")
    // the measured regime boundary: broadcast WINS at sf1.0 (5.6 MB docs),
    // LOSES at sf10 (57 MB docs) — the gate must sit strictly between
    assert(graft.ops.JoinGate.TextDedupSmjBytes > (6L << 20))
    assert(graft.ops.JoinGate.TextDedupSmjBytes < (56L << 20))
  }

  test("every registered query plans and executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
