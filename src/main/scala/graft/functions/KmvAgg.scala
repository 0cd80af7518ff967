package graft.functions

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
/** The ONE copy of the k-minimum buffer discipline: the buffer IS the
  * finished sketch — an ascending distinct Long array capped at k —
  * kept canonical at every step, so `finish` is the identity and the
  * partial-aggregate shuffle ships exactly the k minima in tungsten
  * format. (The r1–r9 buffer was a lazily-trimmed HashSet behind a
  * KRYO encoder; at HyperBall scale — tens of thousands of partial
  * buffers per merge round — kryo object serialization was the round's
  * dominant cost, and the 4k-element lazy watermark shipped up to 4×
  * the state. The sorted-array buffer serializes as a primitive array,
  * inserts in O(log k) for the common below-current-max reject, and
  * merges in one O(k) walk. Measured: graph_effective_diameter
  * 6.5 s → see BASELINE.md r10.) Subclasses supply only how an input
  * row enters the buffer.
  */
abstract class KmvBufferAgg[IN](k: Int)
    extends Aggregator[IN, Array[Long], Array[Long]] {
  require(k >= 2, s"k must be >= 2: $k")

  /** Insert one hash, preserving the ascending-distinct-capped-at-k
    * invariant. After the buffer fills, anything ≥ the current k-th
    * minimum rejects in O(log k) with zero allocation — the steady
    * state for a uniform draw.
    */
  protected final def insert(b: Array[Long], h: Long): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(b, h)
    if (idx >= 0) return b // already a minimum
    val at = -idx - 1
    if (b.length < k) {
      val out = new Array[Long](b.length + 1)
      System.arraycopy(b, 0, out, 0, at)
      out(at) = h
      System.arraycopy(b, at, out, at + 1, b.length - at)
      out
    } else if (at >= k) b // not smaller than the current k-th minimum
    else {
      val out = new Array[Long](k)
      System.arraycopy(b, 0, out, 0, at)
      out(at) = h
      System.arraycopy(b, at, out, at + 1, k - at - 1)
      out
    }
  }

  /** k smallest distinct of two ascending distinct arrays — one walk. */
  protected final def mergeSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return if (b.length <= k) b else java.util.Arrays.copyOf(b, k)
    if (b.isEmpty) return if (a.length <= k) a else java.util.Arrays.copyOf(a, k)
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var m = 0
    while (m < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (m == 0 || out(m - 1) != v) { out(m) = v; m += 1 }
    }
    if (m == out.length) out else java.util.Arrays.copyOf(out, m)
  }

  override final def zero: Array[Long] = Array.emptyLongArray

  override final def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    mergeSorted(x, y)

  /** The sketch: ascending (unsigned-order) hash minima, exact set below
    * k — the buffer invariant makes this the identity.
    */
  override final def finish(b: Array[Long]): Array[Long] = b

  override final def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
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

  override def reduce(b: Array[Long], a: String): Array[Long] =
    if (a == null) b else insert(b, hashOf(a))
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

  /** Sketches produced by this module are ascending-distinct by
    * construction, but `mergeSketches` is a public Column API — a
    * hand-built or descending array would silently corrupt the merge
    * walk (the r1–r9 HashSet buffer was order-insensitive), so inputs
    * are canonicalized first: one O(n) ascending check on the fast
    * path, sort+dedupe only when violated.
    */
  private def canonical(a: Array[Long]): Array[Long] = {
    var i = 1
    while (i < a.length && a(i - 1) < a(i)) i += 1
    if (i >= a.length) a
    else {
      val c = a.clone()
      java.util.Arrays.sort(c)
      var m = 0
      var j = 0
      while (j < c.length) {
        if (m == 0 || c(m - 1) != c(j)) { c(m) = c(j); m += 1 }
        j += 1
      }
      java.util.Arrays.copyOf(c, m)
    }
  }

  // inputs are normally FINISHED sketches (ascending distinct ≤ k), so
  // one bounded walk per row — no per-element inserts
  override def reduce(b: Array[Long], a: Array[Long]): Array[Long] =
    if (a == null) b else mergeSorted(b, canonical(a))
}
