package graft.functions

import scala.collection.mutable

import graft.llm.Hashing

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-Minimum-Values distinct sketch (Bar-Yossef et al. '02 / Beyer et
  * al. SIGMOD'07) — the set-OPERATION sketch of the family: HLL unions,
  * Misra-Gries ranks, CMS point-estimates, KMV additionally estimates
  * INTERSECTIONS. The sketch is literally the k smallest distinct
  * 64-bit hashes seen; because "k smallest of A ∪ B" is a pure function
  * of the two sketches, merge is EXACT (sketch(A) ⊕ sketch(B) ==
  * sketch(A ∪ B), bit for bit — pinned in KmvSpec), and two sketches
  * over different sets share hash space, so |A ∩ B| falls out of
  * counting shared minima (the Jaccard-style estimator below).
  *
  * Estimates: with v_k = k-th smallest hash mapped to (0,1),
  * D̂ = (k−1)/v_k, relative error ~1/√k. Below k distinct values the
  * sketch IS the distinct set and estimates are exact.
  *
  * State is O(k) per partition (a bounded sorted set), reduce is
  * O(log k), merge is O(k log k) — the mergeable shape that ships one
  * sketch per partition/day/shard and folds later.
  */
/** The ONE copy of the k-minimum buffer discipline: a hash set trimmed
  * LAZILY (sort once when it reaches 4k, not a tree insert per row) —
  * kryo round-trips HashSet where ordered collections lose their
  * comparator; the k-smallest semantics are restored at every trim and
  * at finish. Subclasses supply only how an input row enters the
  * buffer.
  */
abstract class KmvBufferAgg[IN](k: Int)
    extends Aggregator[IN, mutable.HashSet[Long], Array[Long]] {
  require(k >= 2, s"k must be >= 2: $k")

  protected final def trim(b: mutable.HashSet[Long]): mutable.HashSet[Long] =
    if (b.size <= k) b else {
      val kept = b.toArray.sorted.take(k)
      b.clear()
      b ++= kept
    }

  protected final def trimWatermark: Int = 4 * k

  override final def zero: mutable.HashSet[Long] =
    mutable.HashSet.empty[Long]

  override final def merge(x: mutable.HashSet[Long],
      y: mutable.HashSet[Long]): mutable.HashSet[Long] = {
    x ++= y
    trim(x)
  }

  /** The sketch: ascending (unsigned-order) hash minima, exact set below k. */
  override final def finish(b: mutable.HashSet[Long]): Array[Long] =
    b.toArray.sorted.take(k)

  override final def bufferEncoder: Encoder[mutable.HashSet[Long]] =
    Encoders.kryo[mutable.HashSet[Long]]
  override final def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

class KmvAgg(k: Int, md5: Boolean = false) extends KmvBufferAgg[String](k) {

  // order hashes as UNSIGNED 64-bit values (flip the sign bit): the
  // estimator needs the k smallest points of a uniform [0, 2^64) draw.
  // In md5 mode the draw is instead the md5-derived 60-bit uniform
  // (non-negative, natural order — no flip), which an independent
  // engine reproduces hash-for-hash; see [[Hashing.md5Uniform60]].
  private def ord(h: Long): Long = h ^ Long.MinValue

  private def hashOf(a: String): Long =
    if (md5) Hashing.md5Uniform60(a) else ord(Hashing.hash64(a))

  override def reduce(b: mutable.HashSet[Long], a: String): mutable.HashSet[Long] = {
    if (a != null) {
      b.add(hashOf(a))
      if (b.size > trimWatermark) trim(b)
    }
    b
  }
}

object KmvAgg {

  /** Column form: aggregate a string key column into one KMV sketch. */
  def sketch(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new KmvAgg(k), Encoders.STRING).apply(c)

  /** Merge a column of FINISHED sketches into one (k smallest of the
    * union — exact by the merge theorem). The bounded buffer makes this
    * the grouped-merge shape iterative sketch algorithms (HyperBall)
    * need: aggregating a node's d neighbor sketches holds O(k) state
    * and partial-aggregates map-side, where an explode + collect_set
    * formulation holds all d·k candidates per group before trimming.
    */
  def mergeSketches(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new KmvMergeAgg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
      .apply(c)

  /** md5-mode column form: minima of the cross-engine 60-bit uniform,
    * so a DuckDB oracle rebuilds the sketch with ORDER BY/LIMIT over
    * `('0x' || substring(md5(key), 1, 15))::BIGINT`.
    */
  def sketchMd5(c: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new KmvAgg(k, md5 = true),
      Encoders.STRING).apply(c)

  private def toUnit(orderedHash: Long): Double =
    // the stored key is (hash ^ MIN_VALUE) = unsigned value − 2^63, so
    // subtracting MIN_VALUE recovers the unsigned magnitude; scale to (0, 1)
    (orderedHash.toDouble - Long.MinValue.toDouble) / math.pow(2, 64)

  /** Distinct-count estimate: exact below k, (k−1)/v_k at capacity. */
  def estimateDistinct(sketch: Array[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble / toUnit(sketch.last)

  /** md5-mode distinct estimate: v_k scales over the 60-bit range. The
    * expression is written EXACTLY as the DuckDB oracle writes it
    * ((k−1) / (h_k / 2⁶⁰)) so the IEEE double result — and hence the
    * floored integer the query emits — is bit-identical cross-engine.
    */
  def estimateDistinctMd5(sketch: Array[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble / (sketch.last.toDouble / math.pow(2, 60))

  /** md5-mode intersection estimate — same shared-minima estimator as
    * [[estimateIntersection]], scaled for the 60-bit draw.
    */
  def estimateIntersectionMd5(a: Array[Long], b: Array[Long], k: Int): Double =
    intersectionWith(a, b, k, estimateDistinctMd5)

  /** Merge two finished sketches (k smallest of the union). */
  def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] =
    (a.toSet ++ b.toSet).toArray.sorted.take(k)

  /** |A ∩ B| estimate: of the union sketch's minima, the fraction
    * present in BOTH input sketches estimates Jaccard; scaled by the
    * union estimate it estimates the intersection size.
    */
  def estimateIntersection(a: Array[Long], b: Array[Long], k: Int): Double =
    intersectionWith(a, b, k, estimateDistinct)

  private def intersectionWith(a: Array[Long], b: Array[Long], k: Int,
      distinct: (Array[Long], Int) => Double): Double = {
    val u = union(a, b, k)
    if (u.isEmpty) return 0.0
    val (sa, sb) = (a.toSet, b.toSet)
    val shared = u.count(h => sa(h) && sb(h))
    val jaccard = shared.toDouble / u.length
    jaccard * distinct(u, k)
  }
}

/** Grouped MERGE of finished KMV sketches ([[KmvAgg.mergeSketches]]) —
  * the shared [[KmvBufferAgg]] buffer discipline, input already hashed.
  */
class KmvMergeAgg(k: Int) extends KmvBufferAgg[Array[Long]](k) {

  override def reduce(b: mutable.HashSet[Long],
      a: Array[Long]): mutable.HashSet[Long] = {
    if (a != null) {
      b ++= a
      if (b.size > trimWatermark) trim(b)
    }
    b
  }
}
