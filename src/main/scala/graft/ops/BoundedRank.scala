package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rank a BOUNDED frame (a post-`limit` top-k, a dim-sized aggregate)
  * without a window: `rank(a) = 1 + |{b : b strictly before a}|`,
  * computed as a broadcast self-join + count.
  *
  * Why not `row_number().over(Window.orderBy(...))`: an unpartitioned
  * window moves its whole input through ONE task and logs the
  * "WindowExec: No Partition Defined" scale warning on every execution —
  * harmless on a 10-row frame, but indistinguishable in the logs from a
  * genuine single-partition sort of a 100 TB input. Ranking top-k
  * survivors through this operator keeps plans (and log tails)
  * warning-free, and the cost is k² comparisons on a broadcast-sized k.
  *
  * The order must be TOTAL (last key a tiebreaking id): ties would
  * otherwise produce equal ranks (the join counts strict predecessors),
  * where row_number would have broken them arbitrarily.
  */
object BoundedRank {

  /** Attach `rankCol` (1-based INT) to `df` ordered lexicographically by
    * `order` — (column name, descending?) pairs. `df` must be bounded
    * (both join sides re-evaluate it; keep it post-limit / post-agg),
    * and the order columns must be NON-NULL (a null never compares, so a
    * null-carrying row would neither count predecessors nor be counted —
    * the totality precondition already excludes it).
    */
  def attach(df: DataFrame, rankCol: String,
      order: Seq[(String, Boolean)]): DataFrame = {
    val outCols = df.columns.toSeq
    val before: Column = order.indices.map { i =>
      val eqPrefix = order.take(i)
        .map { case (c, _) => col(s"b.$c") === col(s"a.$c") }
        .foldLeft(lit(true))(_ && _)
      val (c, desc) = order(i)
      val cmp =
        if (desc) col(s"b.$c") > col(s"a.$c") else col(s"b.$c") < col(s"a.$c")
      eqPrefix && cmp
    }.reduce(_ || _)
    // count a non-null MARKER, not an order column: counting b.<col>
    // would skip matched predecessors whose first order column is null
    val marked = df.withColumn("_graft_rank_one", lit(1))
    marked.as("a").join(broadcast(marked.as("b")), before, "left")
      .groupBy(outCols.map(c => col(s"a.$c").as(c)): _*)
      .agg((count(col("b._graft_rank_one")) + 1).cast("int").as(rankCol))
  }
}
