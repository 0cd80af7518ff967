package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The data-quality log side-channel — the reference's one genuinely
  * engine-like idea (ref `etl.py:664,694,719`): every cleaning operator
  * emits, besides its cleaned rows, zero or more log rows describing the
  * anomalies it saw, and all logs union into ONE loosely-typed table that
  * powers the quality dashboard (`interactive_dashboard.py:124-194`).
  *
  * The reference materializes a Python list of heterogeneous dicts and
  * relies on pandas' union-of-dict-keys; we declare the union schema
  * explicitly (SURVEY.md §1.4 catalogues the observed key sets, including
  * the `mapped_code`-vs-`cleaned_value` inconsistency, which is kept) and
  * combine with `unionByName(allowMissingColumns = true)` — the exact
  * Spark analogue.
  *
  * Scale: log rows are produced by the same filter predicates that drive
  * the cleaning `when`-chains, so each log channel is one extra codegen'd
  * projection over the already-scanned rows — no second source scan, no
  * driver-side accumulation (the reference's global `logs` list would be a
  * driver OOM at 100 TB).
  */
object QualityLog {

  /** Union of all log-row key sets observed in the reference (SURVEY §1.4). */
  val columns: Seq[String] = Seq(
    "patient_id", "encounter_id", "code", "filename", "column_name",
    "original_value", "cleaned_value", "mapped_code", "reason")

  val schema: StructType =
    StructType(columns.map(StructField(_, StringType, nullable = true)))

  /** Conform a partial log projection to the full union schema: missing
    * columns become nulls (pandas' union-of-dict-keys behavior).
    */
  def conform(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    df.select(columns.map { c =>
      if (present(c)) col(c).cast(StringType).as(c)
      else lit(null).cast(StringType).as(c)
    }: _*)
  }

  def empty(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Combine per-operator log channels into the single `logs` table. */
  def combine(logs: Seq[DataFrame]): DataFrame =
    logs.map(conform).reduce(_.unionByName(_, allowMissingColumns = true))
}
