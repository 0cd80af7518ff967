package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy hitters as a typed [[Aggregator]] — the custom
  * mergeable-aggregate escape hatch (SURVEY §2.8 extension): per-partition
  * sketches of at most `k` counters reduce locally and merge
  * associatively, so the shuffle carries O(k) state per partition
  * regardless of input size.
  *
  * Guarantee (and the only thing the spec may pin): every item with true
  * frequency > n/(k+1) is present in the final sketch — no false
  * negatives above the support threshold. False-positive membership and
  * residual counts depend on reduce/merge order, which Spark does not fix
  * for a global aggregate, so outputs are a guaranteed SUPERSET, not a
  * deterministic set. (`DataFrame.stat.freqItems` computes the same
  * sketch but EAGERLY at call time; this Aggregator keeps the query
  * lazy and composable like every other registered plan.)
  *
  * The buffer is a mutable map updated in place: Spark plans a typed
  * Aggregator as a TypedImperativeAggregate, so the buffer stays a JVM
  * object across every per-row reduce call and the encoder below only
  * runs at partial-aggregation boundaries (O(k) sketches, once per
  * partition) — an immutable buffer would instead allocate a fresh map
  * per input row on the hot path.
  */
class FreqItemsAgg(k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Seq[String]] {

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, Long], a: String): mutable.HashMap[String, Long] = {
    if (a != null) {
      b.get(a) match {
        case Some(c) => b.update(a, c + 1)
        case None if b.size < k => b.update(a, 1L)
        case None => // decrement-all step: drop counters reaching zero
          b.mapValuesInPlace((_, c) => c - 1)
          b.filterInPlace((_, c) => c > 0)
      }
    }
    b
  }

  /** Parallel MG merge (Agarwal et al., PODS'12): sum counters, then if
    * more than k survive, subtract the (k+1)-th largest count from all
    * and drop the non-positive — preserves the frequency-error bound.
    */
  override def merge(x: mutable.HashMap[String, Long],
      y: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    y.foreach { case (key, c) => x.update(key, x.getOrElse(key, 0L) + c) }
    if (x.size > k) {
      val offset = x.values.toArray.sorted(Ordering[Long].reverse)(k)
      x.filterInPlace((_, c) => c > offset)
      x.mapValuesInPlace((_, c) => c - offset)
    }
    x
  }

  override def finish(b: mutable.HashMap[String, Long]): Seq[String] =
    b.keys.toSeq.sorted

  /** Kryo, not an expression encoder: the sketch crosses the wire only at
    * partial-agg boundaries as O(k) opaque state — nothing downstream
    * reads into it, so a binary payload is the honest representation.
    */
  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

object FreqItemsAgg {
  /** Column form at a relative support threshold: capacity ⌈1/support⌉. */
  def freqItems(c: org.apache.spark.sql.Column, support: Double): org.apache.spark.sql.Column = {
    require(support > 0 && support < 1, s"support must be in (0,1): $support")
    val k = math.ceil(1.0 / support).toInt
    org.apache.spark.sql.functions.udaf(new FreqItemsAgg(k), Encoders.STRING)
      .apply(c)
  }
}
