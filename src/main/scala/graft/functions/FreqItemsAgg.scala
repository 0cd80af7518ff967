package graft.functions

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
  */
class FreqItemsAgg(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b
    else b.get(a) match {
      case Some(c) => b.updated(a, c + 1)
      case None if b.size < k => b.updated(a, 1L)
      case None => // decrement-all step: drop counters reaching zero
        b.flatMap { case (key, c) => if (c > 1) Some(key -> (c - 1)) else None }
    }

  /** Parallel MG merge (Agarwal et al., PODS'12): sum counters, then if
    * more than k survive, subtract the (k+1)-th largest count from all
    * and drop the non-positive — preserves the frequency-error bound.
    */
  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val combined = y.foldLeft(x) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      val offset = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
      combined.flatMap { case (key, c) =>
        if (c > offset) Some(key -> (c - offset)) else None
      }
    }
  }

  override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
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
