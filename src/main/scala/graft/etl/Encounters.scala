package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Encounters vertical (ref `clean_encounters`, `etl.py:42-86,494-601`):
  * S2 messy multi-delimiter reader → P2 clean_utf8 → P7 tz-safe parse
  * (log) → D2 dup-id log-all-members dedup → F2 discharge<admit nullify
  * (log) → F3 missing-discharge log → F4 type-enum → "UNKNOWN" (log) →
  * P9 LOS hours → P8 tz strip (no-op under UTC session tz).
  *
  * Order is semantic: clean_utf8 runs FIRST here (ref `etl.py:509`), so
  * the enum check at F4 sees lowercased types, and the final outer
  * clean_utf8 pass (ref `etl.py:684`) lowercases F4's "UNKNOWN" sentinel
  * to "unknown" — quirk kept (SURVEY §2.4 F4).
  */
object Encounters {

  val columns: Seq[String] = Seq(
    "encounter_id", "patient_id", "admit_dt",
    "discharge_dt", "encounter_type", "source_file")

  /** S2 (ref `read_messy_encounters`, `etl.py:42-86`): line-oriented scan
    * with per-line delimiter sniffing — `;` iff the line has `;` and no
    * `,`; blank lines and repeated embedded header lines dropped; >6
    * fields truncated, <6 null-padded; every cell trimmed.
    *
    * Pure built-ins over `spark.read.text`: filter + split + transform +
    * try_element_at (past-end yields null = the pad). One narrow scan, no
    * UDF, fully codegen'd — at 100 TB this is an embarrassingly parallel
    * per-line map with no shuffle.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .withColumn("_ord", Ingest.ordinal)
      // Python-strip equivalent: also removes the \r a CRLF file leaves
      // on every line (Spark's trim would keep it and poison every cell)
      .withColumn("value", Cleaning.wsTrim(col("value")))
      .filter(length(col("value")) > 0 &&
        !lower(col("value")).startsWith("encounter_id"))
    val parts = when(
      col("value").contains(";") && !col("value").contains(","),
      split(col("value"), ";"))
      .otherwise(transform(split(col("value"), ","), x => trim(x)))
    val projected = columns.zipWithIndex.map { case (name, i) =>
      // wsTrim covers the ';' branch (the reference strip()s those via its
      // final applymap — all whitespace, not just ASCII spaces); empty
      // strings from ,, stay "" as in pandas
      Cleaning.wsTrim(try_element_at(parts, lit(i + 1))).as(name)
    }
    lines.select(projected :+ col("_ord"): _*)
  }

  def clean(df: DataFrame, filename: String): (DataFrame, DataFrame) = {
    // --- P2 clean_utf8 first (ref etl.py:509) ---
    val utf8 = df.select(columns.map(c =>
      graft.functions.NfkcLower(col(c)).as(c)) :+ col("_ord"): _*)

    // --- P7 robust tz-aware parse, both datetime columns ---
    val parsed = utf8
      .withColumn("_admit_raw", col("admit_dt"))
      .withColumn("_discharge_raw", col("discharge_dt"))
      .withColumn("admit_dt", Cleaning.parseDatetime(col("admit_dt")))
      .withColumn("discharge_dt", Cleaning.parseDatetime(col("discharge_dt")))

    def parseLog(raw: String, parsedC: String, colname: String) = parsed
      // wsTrim: a tabs-only cell is "missing" (no log), like Python strip
      .filter(col(raw).isNotNull && Cleaning.wsTrim(col(raw)) =!= "" &&
        col(parsedC).isNull)
      .select(
        col("patient_id"),
        lit(filename).as("filename"),
        lit(colname).as("column_name"),
        col(raw).as("original_value"),
        lit(null).cast(StringType).as("cleaned_value"),
        lit("invalid_datetime_format").as("reason"))
    val admitLog = parseLog("_admit_raw", "admit_dt", "admit_dt")
    val dischargeLog = parseLog("_discharge_raw", "discharge_dt", "discharge_dt")

    // --- D2 dedup by encounter_id: log EVERY member of a dup group
    // (keep=False, ref etl.py:539-548), keep first by ingest order.
    // Log filename = the row's source_file with NO fallback: the
    // reference's row.get("source_file", default) never falls back
    // because the column always exists — a null stays null. ---
    val dupLog = graft.ops.Dedup
      .dupGroupMembers(parsed, Seq(col("encounter_id")))
      .select(
        col("patient_id"),
        col("source_file").as("filename"),
        lit("encounter_id").as("column_name"),
        col("encounter_id").as("original_value"),
        lit(null).cast(StringType).as("cleaned_value"),
        lit("duplicate_encounter_id").as("reason"))
    val (deduped, _) = graft.ops.Dedup
      .keepFirst(parsed, Seq(col("encounter_id")), col("_ord"))

    // --- F2 discharge < admit: LOG then NULLIFY (not drop) ---
    val badTime = col("discharge_dt") < col("admit_dt") // null-safe: null → false
    val f2Log = deduped.filter(badTime)
      .select(
        col("patient_id"),
        col("source_file").as("filename"),
        lit("discharge_dt").as("column_name"),
        concat(col("discharge_dt").cast(StringType), lit("+00:00"))
          .as("original_value"), // str(aware Timestamp) keeps the offset
        lit(null).cast(StringType).as("cleaned_value"),
        lit("discharge_before_admit").as("reason"))
    val timeFixed = deduped.withColumn("discharge_dt",
      when(badTime, lit(null).cast("timestamp")).otherwise(col("discharge_dt")))

    // --- F3 missing discharge (row kept; fires for F2-nullified rows too,
    // because F2 runs first — ref order etl.py:552-574) ---
    val f3Log = timeFixed.filter(col("discharge_dt").isNull)
      .select(
        col("patient_id"),
        col("source_file").as("filename"),
        lit("discharge_dt").as("column_name"),
        lit(null).cast(StringType).as("original_value"),
        lit(null).cast(StringType).as("cleaned_value"),
        lit("missing_discharge").as("reason"))

    // --- F4 encounter_type enum → "UNKNOWN" + log ---
    val validTypes = Seq("inpatient", "outpatient", "ed")
    val invalidType = !col("encounter_type").isin(validTypes: _*) ||
      col("encounter_type").isNull
    val f4Log = timeFixed.filter(invalidType)
      .select(
        col("patient_id"),
        col("source_file").as("filename"),
        lit("encounter_type").as("column_name"),
        col("encounter_type").as("original_value"),
        lit(null).cast(StringType).as("cleaned_value"),
        lit("invalid_encounter_type").as("reason"))
    val typed = timeFixed.withColumn("encounter_type",
      when(invalidType, "UNKNOWN").otherwise(col("encounter_type")))

    // --- P9 LOS hours; P8 tz strip is a no-op under UTC session tz ---
    val withLos = typed.withColumn("length_of_stay_hours",
      Cleaning.lengthOfStayHours(col("admit_dt"), col("discharge_dt")))

    // --- outer clean_utf8 pass (ref etl.py:684): lowercases the UNKNOWN
    // sentinel; timestamps/doubles survive ---
    val cleaned = Patients.applyCleanUtf8(
      withLos.drop("_ord", "_admit_raw", "_discharge_raw"))

    val logs = QualityLog.combine(
      Seq(admitLog, dischargeLog, dupLog, f2Log, f3Log, f4Log))
    (cleaned, logs)
  }

  def run(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    clean(read(spark, path), filename = new java.io.File(path).getName)
}
