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

  // collision-proofed internals: withColumn would silently REPLACE a
  // same-named caller column and the trailing drop would delete it
  private val Rn = "_graft_dedup_rn"
  private val D1 = "_graft_dedup_d1"
  private val D2 = "_graft_dedup_d2"
  private val Rn2 = "_graft_dedup_rn2"
  private val N = "_graft_dedup_n"

  private def guard(df: DataFrame): Unit =
    require(!Seq(Rn, D1, D2, Rn2, N).exists(df.columns.contains),
      "Dedup input must not carry reserved _graft_dedup_* columns")

  /** D2/D3 shape: keep the first row per key by `ord`; second return is
    * the dropped rows (D3 logs dropped only).
    */
  def keepFirst(df: DataFrame, keys: Seq[Column], ord: Column): (DataFrame, DataFrame) = {
    guard(df)
    val rn = row_number().over(Window.partitionBy(keys: _*).orderBy(ord))
    val marked = df.withColumn(Rn, rn)
    (marked.filter(col(Rn) === 1).drop(Rn),
      marked.filter(col(Rn) > 1).drop(Rn))
  }

  /** D2 log flavor: every member of every >1 group (pandas keep=False). */
  def dupGroupMembers(df: DataFrame, keys: Seq[Column]): DataFrame = {
    guard(df)
    df.withColumn(N, count(lit(1)).over(Window.partitionBy(keys: _*)))
      .filter(col(N) > 1).drop(N)
  }

  /** D1 shape: two-key CASCADE — dedup by `keys1` (keep first by `ord`),
    * then by `keys2` on the survivors. Second return: rows marked
    * duplicate by EITHER mask evaluated on the ORIGINAL input — the
    * pandas log-before-cascaded-drop quirk (a `keys2` dup whose group head
    * was dropped by the `keys1` pass may survive the cascade yet still be
    * logged; ref `etl.py:451-488`).
    */
  def cascade(df: DataFrame, keys1: Seq[Column], keys2: Seq[Column],
      ord: Column): (DataFrame, DataFrame) = {
    guard(df)
    val marked = df
      .withColumn(D1, row_number().over(Window.partitionBy(keys1: _*).orderBy(ord)) > 1)
      .withColumn(D2, row_number().over(Window.partitionBy(keys2: _*).orderBy(ord)) > 1)
    val logged = marked.filter(col(D1) || col(D2)).drop(D1, D2)
    val kept = marked.filter(!col(D1))
      .withColumn(Rn2, row_number().over(Window.partitionBy(keys2: _*).orderBy(ord)))
      .filter(col(Rn2) === 1)
      .drop(D1, D2, Rn2)
    (kept, logged)
  }
}
