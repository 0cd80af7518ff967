package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Diagnoses vertical (ref `parse_diagnoses_to_df` `etl.py:97-132` +
  * `clean_diagnoses` `etl.py:609-659`):
  * S3 namespaced-XML scan → F5 drop-missing-code (log, full-row JSON) →
  * P10 fill missing encounter_id → P11 fill missing is_primary (elif
  * quirk: only when encounter_id was PRESENT) → D3 keyed dedup on the
  * FILLED (encounter_id, code) → P2 clean_utf8.
  */
object Diagnoses {

  /** Explicit element schema — inputs are stringly until cleaned. The
    * `code` element carries text + a `system` attribute, which Spark's
    * native XML source surfaces as struct(_VALUE, _system).
    */
  private val xmlSchema = StructType(Seq(
    StructField("encounterId", StringType),
    StructField("code", StructType(Seq(
      StructField("_VALUE", StringType),
      StructField("_system", StringType)))),
    StructField("isPrimary", StringType),
    StructField("recordedAt", StringType)))

  /** recordedAt: ISO-8601 with optional offset, date-only fallback
    * (ref `etl.py:114-119`: fromisoformat, retry with +"T00:00:00").
    */
  private def parseRecordedAt(c: Column): Column = coalesce(
    try_to_timestamp(c, lit("yyyy-M-d'T'H:mm:ssXXX")),
    try_to_timestamp(c, lit("yyyy-M-d'T'H:mm:ss")),
    try_to_timestamp(c, lit("yyyy-M-d H:mm:ss")),
    try_to_timestamp(c, lit("yyyy-M-d")))

  /** S3 (ref `etl.py:97-132`): Spark 4 ships the XML source natively —
    * rowTag row-splitting is distributable (the input is split on tag
    * boundaries), unlike the reference's whole-file ElementTree parse.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml")
      .option("rowTag", "Diagnosis")
      .schema(xmlSchema)
      .load(path)
      .select(
        col("encounterId").as("encounter_id"),
        col("code._VALUE").as("code"),
        col("code._system").as("code_system"),
        // text → tri-state bool via lower()=="true" (ref etl.py:108-111:
        // anything else, e.g. "yes", becomes false; missing stays null)
        when(col("isPrimary").isNull, lit(null).cast(BooleanType))
          .otherwise(lower(col("isPrimary")) === "true").as("is_primary"),
        parseRecordedAt(col("recordedAt")).as("recorded_at"))
      .withColumn("_ord", Ingest.ordinal)

  def clean(df: DataFrame): (DataFrame, DataFrame) = {
    val originalJson = Cleaning.rowJson(Seq(
      col("encounter_id"), col("code"), col("code_system"),
      col("is_primary"), col("recorded_at")))

    // --- F5: drop rows with missing code + log full original row ---
    val f5Log = df.filter(col("code").isNull)
      .select(
        col("encounter_id"),
        col("code"),
        lit("dropped for missing code").as("reason"),
        originalJson.as("original_value"),
        lit(null).cast(StringType).as("cleaned_value"))
    val withCode = df.filter(col("code").isNotNull)

    // --- P10/P11: fills. ELIF quirk kept (ref etl.py:633-640): a row
    // missing BOTH gets encounter_id filled but is_primary left null ---
    val filled = withCode
      .withColumn("_orig_eid", col("encounter_id"))
      .withColumn("_orig_ip", col("is_primary"))
      .withColumn("_had_eid", col("encounter_id").isNotNull)
      .withColumn("encounter_id", coalesce(col("encounter_id"), lit("UNKNOWN")))
      .withColumn("is_primary",
        when(col("_had_eid") && col("is_primary").isNull, false)
          .otherwise(col("is_primary")))

    // --- D3: streaming seen-set dedup ≡ keep-first-by-ingest-order over
    // the FILLED key (two null-encounter rows with the same code dedupe
    // as ("UNKNOWN", code) — ref etl.py:643-658) ---
    val (kept, droppedDups) = graft.ops.Dedup.keepFirst(
      filled, Seq(col("encounter_id"), col("code")), col("_ord"))
    // log key = FILLED id, but original_value = the PRE-fill row
    val dupLog = droppedDups
      .select(
        col("encounter_id"),
        col("code"),
        lit("duplicate encounter_id + code").as("reason"),
        Cleaning.rowJson(Seq(
          col("_orig_eid").as("encounter_id"), col("code"), col("code_system"),
          col("_orig_ip").as("is_primary"), col("recorded_at"))).as("original_value"),
        lit(null).cast(StringType).as("cleaned_value"))
    val deduped = kept.drop("_orig_eid", "_orig_ip", "_had_eid", "_ord")

    // --- P2 clean_utf8 (ref etl.py:690): strings only; the is_primary
    // bool and recorded_at timestamp survive ---
    val cleaned = Patients.applyCleanUtf8(deduped)

    (cleaned, QualityLog.combine(Seq(f5Log, dupLog)))
  }

  def run(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    clean(read(spark, path))
}
