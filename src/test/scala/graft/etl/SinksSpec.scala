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
