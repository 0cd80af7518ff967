package graft.functions

import graft.llm.Hashing

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode–Muthukrishnan '05) as a typed [[Aggregator]]
  * — the frequency-estimation sibling of [[FreqItemsAgg]]: Misra-Gries
  * answers "which items are heavy", CMS answers "about how often does
  * THIS item occur" for any item, in O(depth × width) state per
  * partition regardless of cardinality.
  *
  * Structure: `depth` hash rows × `width` counters. Every occurrence
  * increments one counter per row (md5-derived row hashes — fully
  * deterministic AND cross-engine reproducible, see [[CountMinAgg.cellIdx]]);
  * a point estimate is the MIN over the item's cells.
  * Collisions only ever ADD, so estimates are one-sided:
  * `est ≥ true`, and `est ≤ true + ε·N` with probability 1−δ for
  * ε = e/width, δ = e^−depth — the textbook bound CountMinSpec pins.
  *
  * The merge is element-wise addition — exactly associative and
  * commutative, so sketch(A) ⊕ sketch(B) == sketch(A ∪ B) BIT-FOR-BIT
  * (unlike Misra-Gries, whose residual counts are merge-order-shaped).
  * That identity makes CMS the sketch you can ship per-partition,
  * per-day, or per-shard and fold later; the spec asserts it exactly.
  * (`DataFrame.stat.countMinSketch` computes the same structure eagerly;
  * this Aggregator keeps it lazy, mergeable, and composable in a plan.)
  */
class CountMinAgg(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth >= 1 && width >= 2, s"bad sketch shape: $depth x $width")

  private def cell(row: Int, item: String): Int =
    CountMinAgg.cellIdx(row, width, item)

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], a: String): Array[Long] = {
    if (a != null) {
      var r = 0
      while (r < depth) { b(cell(r, a)) += 1L; r += 1 }
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMinAgg {
  /** The one hash convention both update and query use: the md5-derived
    * 60-bit uniform of "row:item" folded into the row's counter range.
    * md5 rather than a seeded splitmix mix so the WHOLE sketch is
    * rebuildable by an independent engine —
    * `('0x' || substring(md5(row || ':' || item), 1, 15))::BIGINT % width`
    * in DuckDB reproduces every cell, which is what lets the
    * a2_cms_point_estimates oracle recompute the sketch from raw rows
    * instead of trusting the engine's seeds.
    */
  private[functions] def cellIdx(row: Int, width: Int, item: String): Int = {
    val h = Hashing.md5Uniform60(s"$row:$item")
    row * width + (h % width).toInt
  }

  /** Point estimate from a finished sketch: min over the item's cells. */
  def estimate(sketch: Array[Long], depth: Int, width: Int,
      item: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = sketch(cellIdx(r, width, item))
      if (v < best) best = v
      r += 1
    }
    best
  }

  /** Column form: aggregate a string column into one sketch. */
  def sketch(c: org.apache.spark.sql.Column, depth: Int,
      width: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new CountMinAgg(depth, width),
      Encoders.STRING).apply(c)
}
