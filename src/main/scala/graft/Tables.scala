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

  /** The events table's `ts` has shipped in three physical parquet
    * encodings across harness generations, and the engine must read all
    * of them to the SAME session-UTC TIMESTAMP instants the oracle sees:
    *
    *  - TIMESTAMP(NANOS): Spark 4 rejects it outright
    *    (PARQUET_TYPE_ILLEGAL) — read as raw nanos (legacy conf) and
    *    truncate to micros, exactly what DuckDB's micro-precision
    *    TIMESTAMP does on the same file.
    *  - timestamp[us] with isAdjustedToUTC=false: Spark 4 infers
    *    TIMESTAMP_NTZ, on which instant functions (`unix_micros`,
    *    `window`) don't resolve — cast to TIMESTAMP; under the engine's
    *    fixed UTC session zone the wall-clock is preserved bit-for-bit,
    *    which is also how DuckDB treats the same naive value.
    *  - timestamp[us] UTC-adjusted: plain TIMESTAMP, passes through.
    *
    * Normalizing at the load boundary keeps every downstream operator
    * written against one type; conversion is schema-conditional so each
    * branch is a no-op for the other encodings.
    */
  private def loadNanosSafe(spark: SparkSession, dir: String, name: String,
      tsCols: Seq[String]): DataFrame = {
    // Deliberately left SET for the session (not save/restore-scoped):
    // the parquet reader consults it lazily at each action's
    // reader-factory build, so restoring it after read() would break
    // later actions on the returned frame. Session-wide consequence: a
    // TIMESTAMP(NANOS) column in any OTHER parquet read surfaces as raw
    // LongType instead of erroring — normalize such columns at their own
    // load boundary exactly as this helper does for `tsCols`.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, name)
    tsCols.foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType =>
          d.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          d.withColumn(c, col(c).cast("timestamp"))
        case _ => d
      }
    }
  }

  /** S4 JDBC flavor (ref `interactive_dashboard.py:23-27`: read_sql_table
    * + cache). Partitioned reads via (partitionColumn, lowerBound,
    * upperBound, numPartitions) so a 1000-executor cluster fans the table
    * scan out instead of funneling through one connection. No database
    * ships with this harness — the parquet loaders above are the tested
    * path; this is the production binding.
    */
  def jdbcTable(s: SparkSession, url: String, table: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None,
      props: java.util.Properties = new java.util.Properties): DataFrame = {
    val base = s.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    val reader = partitionColumn match {
      case Some((c, lo, hi, n)) => base
        .option("partitionColumn", c).option("lowerBound", lo)
        .option("upperBound", hi).option("numPartitions", n)
      case None => base
    }
    reader.load().cache()
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame =
    loadNanosSafe(s, d, "events", Seq("ts"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

}
