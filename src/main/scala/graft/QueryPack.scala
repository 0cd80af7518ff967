package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark plan builder plus (optionally) an
  * equivalent ANSI SQL text the driver runs in DuckDB over the same parquet
  * tables (the correctness oracle). Queries with no SQL-expressible oracle
  * (e.g. MinHash-LSH, whose hash functions are engine-specific) carry
  * `oracle = None` and are covered by ScalaTest specs instead.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

trait QueryPack {
  def qs: Seq[Q]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.fn).toMap
  final def oracles: Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
