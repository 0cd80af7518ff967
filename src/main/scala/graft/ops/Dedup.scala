package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep-first deduplication operators — the reference's key-matching
  * workhorse (SURVEY §2.5 D1-D3), generalized.
  *
  * All variants need an explicit ingest ordinal: pandas keep-first means
  * FILE order, while Spark's `dropDuplicates` keeps an arbitrary row. The
  * ordinal makes the choice deterministic and, at scale, is the only
  * stable notion of "first" that exists ((file, offset) order).
  *
  * Cost: one hash shuffle per key set + per-partition sort — the same
  * movement as the groupBy the dedup replaces; no row explosion.
  */
object Dedup {

  /** D2/D3 shape: keep the first row per key by `ord`; second return is
    * the dropped rows (D3 logs dropped only).
    */
  def keepFirst(df: DataFrame, keys: Seq[Column], ord: Column): (DataFrame, DataFrame) = {
    val rn = row_number().over(Window.partitionBy(keys: _*).orderBy(ord))
    val marked = df.withColumn("_rn", rn)
    (marked.filter(col("_rn") === 1).drop("_rn"),
      marked.filter(col("_rn") > 1).drop("_rn"))
  }

  /** D2 log flavor: every member of every >1 group (pandas keep=False). */
  def dupGroupMembers(df: DataFrame, keys: Seq[Column]): DataFrame =
    df.withColumn("_n", count(lit(1)).over(Window.partitionBy(keys: _*)))
      .filter(col("_n") > 1).drop("_n")

  /** D1 shape: two-key CASCADE — dedup by `keys1` (keep first by `ord`),
    * then by `keys2` on the survivors. Second return: rows marked
    * duplicate by EITHER mask evaluated on the ORIGINAL input — the
    * pandas log-before-cascaded-drop quirk (a `keys2` dup whose group head
    * was dropped by the `keys1` pass may survive the cascade yet still be
    * logged; ref `etl.py:451-488`).
    */
  def cascade(df: DataFrame, keys1: Seq[Column], keys2: Seq[Column],
      ord: Column): (DataFrame, DataFrame) = {
    val marked = df
      .withColumn("_d1", row_number().over(Window.partitionBy(keys1: _*).orderBy(ord)) > 1)
      .withColumn("_d2", row_number().over(Window.partitionBy(keys2: _*).orderBy(ord)) > 1)
    val logged = marked.filter(col("_d1") || col("_d2")).drop("_d1", "_d2")
    val kept = marked.filter(!col("_d1"))
      .withColumn("_rn2", row_number().over(Window.partitionBy(keys2: _*).orderBy(ord)))
      .filter(col("_rn2") === 1)
      .drop("_d1", "_d2", "_rn2")
    (kept, logged)
  }
}
