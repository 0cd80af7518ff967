package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dashboard-operator semantics on known data + sketch accuracy bounds. */
class AnalyticsSpec extends SparkSpec {

  import spark.implicits._

  private def events = graft.Tables.events(spark, "/root/testdata/sf0.001")

  test("approxDistinct (HLL) within 2 sigma of exact (rsd=0.05 ⇒ 10%)") {
    val exact = events.select("user_id").distinct().count()
    val approx = Analytics.approxDistinct(events, "user_id")
      .collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx $approx vs exact $exact")
  }

  test("HLL sketch MERGE: union of per-group sketches equals the direct sketch") {
    // the property that makes the sketch useful at fleet scale: building
    // per-partition sketches and unioning them must lose nothing vs one
    // global pass — and both must track the exact cardinality
    val exact = events.select("user_id").distinct().count()
    val merged = events.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    val direct = events
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect()(0).getLong(0)
    assert(merged === direct,
      s"sketch union is lossy: merged=$merged direct=$direct")
    assert(math.abs(direct - exact).toDouble / exact < 0.05,
      s"estimate $direct vs exact $exact")
  }

  test("approx_percentile tracks exact percentile (the 100 TB quantile path)") {
    // the oracle-checked agg_exact_quantiles_quantity covers the exact
    // path cross-engine; price quantiles live here, where t-digest
    // approx_percentile (the mergeable-partials path at scale) is
    // pinned within 2% relative error of exact percentile
    val df = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val row = df.agg(
      expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").as("exact"),
      expr("approx_percentile(o_totalprice, array(0.25, 0.5, 0.75), 1000)").as("approx"))
      .collect()(0)
    val exact = row.getSeq[Double](0)
    val approx = row.getSeq[Double](1)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(a - e) / e < 0.02, s"approx $a vs exact $e")
    }
  }

  test("FreqItemsAgg returns every item above the support threshold") {
    // Misra-Gries guarantee: no false negatives above support — must
    // hold through per-partition reduce AND the parallel merge
    val exact = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum.toDouble
    val heavy = exact.filter { case (_, n) => n / total > 0.15 }.keySet
    val got = events.repartition(8)
      .agg(graft.functions.FreqItemsAgg.freqItems(col("event_type"), 0.15))
      .collect()(0).getSeq[String](0).toSet
    assert(heavy.subsetOf(got), s"missing heavy hitters: ${heavy -- got}")
  }

  test("FreqItemsAgg on skewed synthetic data and null inputs") {
    import spark.implicits._
    // 900 of 'a', 50 'b', 49 distinct tail + nulls: only 'a' exceeds 10%
    val rows = Seq.fill(900)("a") ++ Seq.fill(50)("b") ++
      (1 to 49).map(i => s"t$i") ++ Seq.fill(10)(null.asInstanceOf[String])
    val df = rows.toDF("v").repartition(16)
    val got = df.agg(graft.functions.FreqItemsAgg.freqItems(col("v"), 0.1))
      .collect()(0).getSeq[String](0)
    assert(got.contains("a"))
    assert(got.size <= 10) // capacity bound: at most ceil(1/support)
  }

  test("profile and profileApprox agree on nonnull counts; distinct close") {
    val df = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val p = Analytics.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pa = Analytics.profileApprox(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(p.keySet === df.columns.toSet)
    p.foreach { case (c, (n, nd)) =>
      assert(pa(c)._1 === n)
      // 2-sigma bound at the default rsd=0.05
      assert(math.abs(pa(c)._2 - nd).toDouble / math.max(nd, 1) < 0.1,
        s"$c: approx ${pa(c)._2} vs exact $nd")
      assert(nd <= n)
    }
    // known ground truth: o_orderkey is the PK
    assert(p("o_orderkey")._1 === df.count())
    assert(p("o_orderkey")._2 === df.count())
  }

  test("profile survives dotted and duplicate column names, empty schema") {
    val dotted = spark.range(3).toDF("a.b")
    assert(Analytics.profile(dotted).collect()(0).getString(0) === "a.b")
    val dup = spark.range(3).toDF("id").crossJoin(spark.range(2).toDF("id"))
    assert(Analytics.profile(dup).count() === 2) // one row per position
    assert(Analytics.profile(spark.range(3).select()).count() === 0)
  }

  test("valueCounts/topK ordering: count desc then key, deterministic under ties") {
    val df = Seq("b", "a", "a", "c", "b").toDF("k")
    val vc = Analytics.valueCounts(df, "k").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(vc.toSeq === Seq(("a", 2L), ("b", 2L), ("c", 1L)))
    assert(Analytics.topK(df, "k", 2).collect().map(_.getString(0)).toSeq ===
      Seq("a", "b"))
  }
}
