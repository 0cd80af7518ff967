package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders for the harness testdata (TESTDATA.md).
  *
  * All engine queries read the driver-generated parquet star schema from a
  * scale-factor directory. Reads are plain `spark.read.parquet` so Catalyst
  * gets full pushdown: filters and column pruning reach the parquet scan
  * (`PushedFilters` / `ReadSchema` in explain), and partition sizing is
  * governed by `spark.sql.files.maxPartitionBytes` — at 100 TB the same
  * code simply fans out over more input splits.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Deterministic total order over every output column, nulls first —
    * mirrors the `ORDER BY ... NULLS FIRST` appended to each oracle so the
    * driver's hash compare sees identical row order regardless of whether
    * it sorts. Applied to final (small) results only, never mid-plan.
    */
  def canonical(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(c => col(c).asc_nulls_first).toIndexedSeq: _*)
}
