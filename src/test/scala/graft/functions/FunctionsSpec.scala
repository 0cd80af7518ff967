package graft.functions

import graft.SparkSpec
import graft.llm.{Ann, TextAnalysis}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions: value semantics, SQL registration, and
  * codegen/interpreted agreement.
  */
class FunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("NfkcLower: NFKC folds + lowercase, via Column API and SQL") {
    val df = Seq("Ⅻ ＡＢＣ ﬁx", "Ñ É", "plain").toDF("s")
    val api = df.select(NfkcLower(col("s"))).collect().map(_.getString(0))
    assert(api.toSeq === Seq("xii abc fix", "ñ é", "plain"))

    GraftExtensions.register(spark)
    val sql = spark.sql("SELECT nfkc_lower('Ⅻ ＡＢＣ ﬁx')").collect()(0).getString(0)
    assert(sql === "xii abc fix")
  }

  test("PolyHash: polynomial over UTF-8 bytes, null-safe, SQL-callable") {
    val b = PolyHash.Base
    val expected = ("abc".getBytes("UTF-8").foldLeft(0L)((h, c) => h * b + (c & 0xff)))
    assert(PolyHash.hash(UTF8String.fromString("abc")) === expected)

    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT poly_hash('abc'), poly_hash(NULL)").collect()(0)
    assert(viaSql.getLong(0) === expected)
    assert(viaSql.isNullAt(1))
  }

  test("codegen and interpreted paths agree on corpus data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val withExprs = docs.select(col("doc_id"),
      NfkcLower(col("text")).as("n"), PolyHash(col("text")).as("p"))
    val a = withExprs.collect()
    val b = spark.conf.get("spark.sql.codegen.wholeStage") match {
      case _ =>
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        try withExprs.collect()
        finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(a.map(_.toString).sorted.toSeq === b.map(_.toString).sorted.toSeq)
  }

  test("polyhash distinct-count agrees with md5 fingerprint on corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val r = docs.agg(
      count_distinct(PolyHash(lower(col("text")))).as("poly"),
      count_distinct(TextAnalysis.fingerprint(col("text"))).as("md5")).collect()(0)
    assert(r.getLong(0) === r.getLong(1)) // collision-free on this corpus
  }

  test("cosineNearDupPairs finds planted duplicates, skips background") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // plant: copy of vec 0 with id 9000 (exact), near-copy with one
    // component doubled (cosine slightly below 1 but >= 0.9)
    val planted = emb.filter(col("vec_id") === 0)
      .select(lit(9000L).as("vec_id"), col("embedding"), col("label"))
    val all = emb.unionByName(planted.select(emb.columns.map(col): _*))
    val pairs = Ann.cosineNearDupPairs(all, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((0L, 9000L))) // the plant, nothing else
  }
}
