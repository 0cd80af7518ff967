package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped top-K as a typed [[Aggregator]] with a K-bounded buffer —
  * the scale-safe alternative to `row_number() OVER (PARTITION BY g)`:
  * the window plan ships EVERY row of a group into one sort partition
  * before discarding all but K, so one hot group serializes the stage;
  * the aggregator's partial buffers never exceed K entries, combine
  * map-side, and the shuffle carries |groups|·K structs total.
  *
  * Buffer is a sorted Vector, not a PriorityQueue: ordered collections
  * lose their comparator through the kryo buffer round-trip and fail at
  * merge (EXPRESSION_DECODING_FAILED) — bounded-sorted semantics via
  * re-sort-on-insert keeps the buffer a plain serializable Seq, and the
  * O(k log k) insert cost is amortized by the cheap reject branch
  * (full rows sort only when they beat the current k-th).
  */
object TopKByGroup {

  /** (measure, tiebreak id): ranked by measure DESC, id ASC. */
  type Entry = (Double, Long)
  private val ord: Ordering[Entry] = Ordering.by((e: Entry) => (-e._1, e._2))

  final class TopK(k: Int)
      extends Aggregator[(String, Double, Long), Seq[Entry], Seq[Entry]] {
    def zero: Seq[Entry] = Vector.empty
    def reduce(b: Seq[Entry], row: (String, Double, Long)): Seq[Entry] = {
      val e = (row._2, row._3)
      if (b.size < k) ((b :+ e).sorted(ord))
      else if (ord.lt(e, b.last)) ((b :+ e).sorted(ord)).take(k)
      else b
    }
    def merge(x: Seq[Entry], y: Seq[Entry]): Seq[Entry] =
      (x ++ y).sorted(ord).take(k)
    def finish(b: Seq[Entry]): Seq[Entry] = b
    def bufferEncoder: Encoder[Seq[Entry]] = Encoders.kryo[Seq[Entry]]
    def outputEncoder: Encoder[Seq[Entry]] = Encoders.kryo[Seq[Entry]]
  }

  /** Top-K orders per priority class: (priority, rank, orderkey, price),
    * rank 1 = highest price, orderkey breaks ties.
    */
  def topOrdersByPriority(orders: DataFrame, k: Int): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    orders
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .agg(new TopK(k).toColumn.name("top"))
      .flatMap { case (prio, entries) =>
        entries.iterator.zipWithIndex.map { case ((price, key), i) =>
          (prio, i + 1, key, price)
        }
      }
      .toDF("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
      .orderBy(col("o_orderpriority"), col("rnk"))
  }
}
