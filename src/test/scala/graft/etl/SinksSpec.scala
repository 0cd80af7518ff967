package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** K1/K2 sink drives (SURVEY §2.2): parquet overwrite of all four tables
  * and reason-filtered CSV export, read back and checked.
  */
class SinksSpec extends SparkSpec {

  test("K1: overwrite-parquet writes all 4 tables; overwrite is idempotent") {
    val out = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val result = EtlPipeline.runDefault(spark)
    Sinks.overwriteParquet(result, out)
    Sinks.overwriteParquet(result, out) // mode=overwrite: second run replaces
    assert(spark.read.parquet(s"$out/patients").count() === 11)
    assert(spark.read.parquet(s"$out/encounters").count() === 8)
    assert(spark.read.parquet(s"$out/diagnoses").count() === 8)
    assert(spark.read.parquet(s"$out/logs").count() === 12)
    // round-trip fidelity: schema + values survive the sink
    assert(spark.read.parquet(s"$out/logs").columns.toSeq === QualityLog.columns)
  }

  test("partitioned corpus sink: hive layout prunes at listing level") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString + "/docs"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Sinks.writePartitioned(docs, Seq("lang"), out)
    val langs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("lang=")).sorted
    assert(langs.length >= 3) // one directory per language
    val en = spark.read.parquet(out).filter(col("lang") === "en")
    val scan = en.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"), scan)
    assert(en.count() === docs.filter(col("lang") === "en").count())
  }

  test("K2: reason-filtered CSV export round-trips") {
    val out = java.nio.file.Files.createTempDirectory("graft-csv").toString + "/dups"
    val logs = EtlPipeline.runDefault(spark).logs
    Sinks.exportLogsCsv(logs, "duplicate_encounter_id", out)
    val back = spark.read.option("header", true).csv(out)
    assert(back.count() === 2)
    assert(back.select("reason").distinct().collect()(0).getString(0) ===
      "duplicate_encounter_id")
  }
}
