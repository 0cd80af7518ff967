package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end healthcare ETL (ref `etl.py` E1): three verticals, one
  * unified quality-log table (SURVEY §3).
  *
  * Each vertical is an independent source→clean DAG; Catalyst plans them
  * separately and the log channels union lazily — at scale the whole
  * pipeline is three parallel scan→map stages plus the per-vertical dedup
  * shuffles, with the log table materializing as a byproduct of the same
  * scans (no second pass, unlike the reference's driver-side list).
  */
final case class EtlResult(
    patients: DataFrame,
    encounters: DataFrame,
    diagnoses: DataFrame,
    logs: DataFrame)

object EtlPipeline {

  /** Default fixture set — the reference's own adversarial inputs, vendored
    * under fixtures/ (every row exercises a dirty-data case; FIXTURES.md).
    */
  val defaultDir = "/root/repo/fixtures"

  def run(spark: SparkSession,
      patientsCsv: String,
      encountersCsv: String,
      diagnosesXml: String): EtlResult = {
    val (p, pLog) = Patients.run(spark, patientsCsv)
    val (e, eLog) = Encounters.run(spark, encountersCsv)
    val (d, dLog) = Diagnoses.run(spark, diagnosesXml)
    // final applymap(clean_utf8) over the log table itself (ref etl.py:695)
    val logs = Patients.applyCleanUtf8(QualityLog.combine(Seq(pLog, eLog, dLog)))
    EtlResult(p, e, d, logs)
  }

  // SINGLE-entry strong cache, not a WeakHashMap: the cached DataFrames
  // strongly reference their SparkSession, so weak keys could never be
  // collected anyway (the WeakHashMap javadoc's value→key warning) — the
  // bound comes from keeping exactly one (session, dir) entry, which the
  // next different caller replaces (and unpersists). The harness runs
  // one session; a multi-session driver pins at most one stale result
  // until its own first call.
  private var memo: Option[(SparkSession, String, EtlResult)] = None

  /** Drop the memoized pipeline (and its cached blocks). The Verify
    * determinism harness calls this between its two registry passes —
    * without it the second pass re-reads the first pass's cache and the
    * fixture queries' "determinism" check is a tautology.
    */
  def invalidate(): Unit = synchronized {
    memo.foreach { case (_, _, r) =>
      Seq(r.patients, r.encounters, r.diagnoses, r.logs)
        .foreach(_.unpersist(blocking = false))
    }
    memo = None
  }

  /** Memoized per (session, dir) with cached outputs: the four registered
    * fixture queries each consume one table of the same pipeline run —
    * without the memo the whole three-vertical DAG re-executes per query.
    */
  def runDefault(spark: SparkSession, dir: String = defaultDir): EtlResult =
    synchronized {
      memo match {
        case Some((s, d, r)) if (s eq spark) && d == dir => r
        case _ =>
          invalidate()
          val r = run(spark, s"$dir/patients.csv", s"$dir/encounters.csv",
            s"$dir/diagnoses.xml")
          val cached = EtlResult(r.patients.cache(), r.encounters.cache(),
            r.diagnoses.cache(), r.logs.cache())
          memo = Some((spark, dir, cached))
          cached
      }
    }
}

/** Sinks (SURVEY §2.2). K1: overwrite loads of the 4 tables — JDBC in the
  * reference (`etl.py:716-719`), parquet in this harness; K2: CSV export
  * of reason-filtered logs (`interactive_dashboard.py:189-194`).
  */
object Sinks {

  /** K1 parquet flavor. */
  def overwriteParquet(result: EtlResult, outDir: String): Unit = {
    result.patients.write.mode("overwrite").parquet(s"$outDir/patients")
    result.encounters.write.mode("overwrite").parquet(s"$outDir/encounters")
    result.diagnoses.write.mode("overwrite").parquet(s"$outDir/diagnoses")
    result.logs.write.mode("overwrite").parquet(s"$outDir/logs")
  }

  /** K1 JDBC flavor (`to_sql(if_exists='replace')` ≡ mode("overwrite")). */
  def overwriteJdbc(result: EtlResult, url: String,
      props: java.util.Properties): Unit = {
    result.patients.write.mode("overwrite").jdbc(url, "patients", props)
    result.encounters.write.mode("overwrite").jdbc(url, "encounters", props)
    result.diagnoses.write.mode("overwrite").jdbc(url, "diagnoses", props)
    result.logs.write.mode("overwrite").jdbc(url, "logs", props)
  }

  /** K2: header CSV of logs filtered to one reason. */
  def exportLogsCsv(logs: DataFrame, reason: String, outPath: String): Unit =
    logs.filter(org.apache.spark.sql.functions.col("reason") === reason)
      .write.mode("overwrite").option("header", true).csv(outPath)

  /** Corpus-layout sink: hive-partitioned parquet. Partition columns
    * become directories, so downstream jobs touching one language/source
    * read only their slice (partition pruning at the listing level — the
    * layout that matters most at 100 TB).
    */
  def writePartitioned(df: DataFrame, partitionCols: Seq[String],
      outDir: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(outDir)
}
