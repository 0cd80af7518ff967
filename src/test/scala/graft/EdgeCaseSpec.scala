package graft

import graft.analytics.Analytics
import graft.etl.Cleaning
import graft.llm.{MinHashLsh, TextAnalysis}
import graft.ops.{AsOfJoin, Dedup}
import org.apache.spark.sql.functions._

/** Empty-input and degenerate-shape guards: every operator must yield a
  * well-formed empty (or defined) result, never throw — an empty
  * partition is a normal event on a 1000-executor cluster.
  */
class EdgeCaseSpec extends SparkSpec {

  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("dedup operators on empty input") {
    val (kept, dropped) = Dedup.keepFirst(emptyDocs, Seq(col("text")), col("doc_id"))
    assert(kept.count() === 0 && dropped.count() === 0)
    val (k2, logged) = Dedup.cascade(emptyDocs, Seq(col("text")),
      Seq(col("doc_id")), col("doc_id"))
    assert(k2.count() === 0 && logged.count() === 0)
  }

  test("null text rows flow through every text operator without NPE") {
    val withNull = Seq((1L, "a b c d"), (2L, null)).toDF("doc_id", "text")
    assert(MinHashLsh.nearDupPairs(withNull, "doc_id", "text", 0.8).count() === 0)
    assert(graft.llm.SimHash.nearPairs(withNull, "doc_id", "text").count() === 0)
    val chunks = withNull.select(TextAnalysis.chunkByTokens(col("text"), 2)).collect()
    assert(chunks(1).getSeq[String](0).isEmpty)
    assert(withNull.filter(TextAnalysis.sampleByHash(col("text"), 999)).count() <= 1)
  }

  test("minhash-lsh on empty and single-doc input") {
    assert(MinHashLsh.nearDupPairs(emptyDocs, "doc_id", "text", 0.8).count() === 0)
    val one = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    assert(MinHashLsh.nearDupPairs(one, "doc_id", "text", 0.8).count() === 0)
    // docs shorter than the shingle width vanish rather than throw
    val short = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(MinHashLsh.nearDupPairs(short, "doc_id", "text", 0.8).count() === 0)
  }

  test("histogram on empty, constant, and single-row columns") {
    assert(Analytics.histogram(Seq.empty[Double].toDF("v"), "v", 10).count() === 0)
    val const = Analytics.histogram(Seq(5.0, 5.0, 5.0).toDF("v"), "v", 10).collect()
    assert(const.length === 1 && const(0).getLong(0) === 0 && const(0).getLong(1) === 3)
    val single = Analytics.histogram(Seq(42.0).toDF("v"), "v", 10).collect()
    assert(single.length === 1 && single(0).getLong(1) === 1)
  }

  test("as-of join with empty right side keeps all left rows unmatched") {
    val l = Seq((1L, "2024-01-01 10:00:00", "p")).toDF("user_id", "ts", "pid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val r = Seq.empty[(Long, String, Double, Long)]
      .toDF("user_id", "ts", "v", "eid")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = AsOfJoin.backward(l, r, "user_id", "ts", Seq("v"), "eid").collect()
    assert(out.length === 1 && out(0).isNullAt(out(0).fieldIndex("v")))
  }

  test("cleaning expressions on whitespace-only and empty strings") {
    val r = Seq("", "   ", "\t").toDF("s").select(
      Cleaning.heightToCm(col("s")).as("h"),
      TextAnalysis.tokenCount(col("s")).as("tc"),
      TextAnalysis.alphaRatio(col("s")).as("ar"),
      Cleaning.weightToKg(col("s"), lit(170.0)).getField("reason").as("wr"))
      .collect()
    r.foreach { row =>
      assert(row.isNullAt(0))
      assert(row.getInt(1) === 0)
      assert(row.getAs[String]("wr") === "missing_marker")
    }
  }
}
