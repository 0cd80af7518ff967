package graft.llm

import scala.util.hashing.MurmurHash3

/** Deterministic JVM-side hashing for the signature UDFs.
  *
  * Why UDFs and not Catalyst higher-order functions: HOF expressions are
  * CodegenFallback (interpreted), and lambda-invariant subexpressions are
  * re-evaluated per element — a k-hash MinHash written as
  * `transform(0..k, i -> array_min(transform(shingles(text), ...)))`
  * recomputes the whole tokenize+shingle pipeline k times PER ROW
  * (O(tokens²·k), observed as a 1000× slowdown). A compiled UDF does one
  * pass per row; this is exactly the trade Spark MLlib's MinHashLSH makes.
  * Scalar hot-path cleaning stays expression-based (Cleaning.scala) where
  * codegen genuinely wins.
  */
object Hashing {

  /** splitmix64 — public-domain mixer; deterministic pseudo-randomness
    * for hyperplanes/permutations without any RNG state.
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit string hash from two murmur32 passes. */
  def hash64(s: String): Long = {
    val a = MurmurHash3.stringHash(s, 0x12345)
    val b = MurmurHash3.stringHash(s, 0x6789a)
    (a.toLong << 32) | (b.toLong & 0xffffffffL)
  }

  /** First 15 hex chars of md5(s) as a non-negative 60-bit Long — the
    * engine's cross-engine uniform (the `docs_shuffle_shards`
    * convention): an independent engine reproduces it as
    * `('0x' || substring(md5(s), 1, 15))::BIGINT`, which is what turns a
    * sketch built on it (CMS cells, KMV minima, SimHash votes, HLL
    * registers) from "trust the seeds" into a hash-for-hash auditable
    * structure. ~2× the cost of [[hash64]] per call — the documented
    * price of auditability; hash64 remains for hot paths whose outputs
    * are spec-pinned rather than oracle-compared.
    */
  // one digest instance per executor thread: MessageDigest.getInstance
  // walks the provider registry per call, which at one hash per ROW is
  // measurable; reset() + digest() on a cached instance is the same
  // arithmetic.
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def md5Uniform60(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val dig = md.digest(s.getBytes("UTF-8"))
    // first 15 hex chars = the top 60 bits of the big-endian first 8 bytes
    java.nio.ByteBuffer.wrap(dig).getLong >>> 4
  }

  private val MersennePrime = (1L << 31) - 1

  /** Whitespace tokenization shared by [[shingles]], [[winnow]], and
    * [[TextAnalysis.chunkByTokens]]: edge-strip whitespace, split on
    * whitespace runs, drop empties. This is the ONE convention the
    * shingle-family DuckDB oracles mirror
    * (list_filter(string_split_regex(regexp_replace(^\s+|\s+$), \s+))).
    * The class is written out explicitly as RE2's \s = [\t\n\f\r ]:
    * Java's \s additionally matches vertical tab U+000B, which would
    * silently diverge the oracles on such input; Java String.trim /
    * bare split diverge further (trim eats ≤U+0020, split drops only
    * trailing empties).
    *
    * Implemented as a single char scan collecting maximal non-ws runs —
    * provably the same result as strip-edges + split-on-runs +
    * drop-empties, without the regex machinery (the old
    * `replaceAll`+`split` pair re-COMPILED both patterns per call,
    * which at one call per document per text query is pure overhead).
    */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  def words(text: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(text.charAt(i))) i += 1
      if (i > start) out += text.substring(start, i)
    }
    out.toArray
  }

  /** Distinct word n-gram shingles. */
  def shingles(text: String, n: Int): Array[String] = {
    val w = words(text)
    if (w.length < n) Array.empty
    else {
      val out = new scala.collection.mutable.LinkedHashSet[String]
      var i = 0
      while (i + n <= w.length) {
        out += w.slice(i, i + n).mkString(" ")
        i += 1
      }
      out.toArray
    }
  }

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken's MOSS
    * scheme, SIGMOD'03): hash every positional word n-gram, slide a
    * window of `w` consecutive hashes, keep the minimum of each window;
    * the distinct selected hashes are the document's fingerprints.
    * Guarantees: any shared run of `w + n − 1` words between two
    * documents yields at least one shared fingerprint, while storing only
    * ~2/(w+1) of the hashes — the density/recall dial for corpus-scale
    * overlap detection.
    *
    * Hashes are the first 16 hex chars of md5 so an independent engine
    * (the DuckDB oracle) reproduces them exactly; the window minimum is a
    * plain lexicographic min over lowercase hex, which equals byte-order
    * min. O(m·w) scan — w is small (4); a monotonic deque would be O(m)
    * but adds no win at these window sizes.
    */
  /** Positional word n-gram hashes: the md5-prefix of every consecutive
    * n-gram, index-aligned with word position (hashes(i) covers words
    * i..i+n-1). The shared primitive under [[winnow]] and the
    * repeated-span (exact-substring) dedup family; the DuckDB twin is
    * the list comprehension in CorpusQueries' gram chains.
    */
  /** First 16 hex chars of md5(s) — the cross-engine fingerprint
    * convention (`substring(md5(x), 1, 16)` in the DuckDB twins).
    */
  def md5Hex16(s: String): String = {
    val md = md5Local.get()
    md.reset()
    hex16(md.digest(s.getBytes("UTF-8")))
  }

  /** Hex-encode the first 8 digest bytes — the single implementation
    * shared by [[md5Hex16]] and [[gramHashes]] (it was inlined in both,
    * a lockstep hazard).
    */
  private def hex16(dig: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(16)
    var bi = 0
    while (bi < 8) {
      sb.append(Character.forDigit((dig(bi) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(dig(bi) & 0xf, 16))
      bi += 1
    }
    sb.toString
  }

  def gramHashes(text: String, n: Int): Array[String] = {
    val ws = words(text)
    if (ws.length < n) return Array.empty
    val m = ws.length - n + 1
    val hashes = new Array[String](m)
    // cached per-thread digest (see md5Local): getInstance walks the
    // provider registry, measurable at one hash per gram; digest()
    // resets the instance, so no explicit reset() in the loop
    val md = md5Local.get()
    md.reset()
    var i = 0
    while (i < m) {
      val gram = ws.slice(i, i + n).mkString(" ")
      hashes(i) = hex16(md.digest(gram.getBytes("UTF-8")))
      i += 1
    }
    hashes
  }

  def winnow(text: String, n: Int, w: Int): Array[String] = {
    val hashes = gramHashes(text, n)
    if (hashes.isEmpty) return Array.empty
    val m = hashes.length
    val out = new scala.collection.mutable.LinkedHashSet[String]
    if (m <= w) out += hashes.min
    else {
      var s = 0
      while (s + w <= m) {
        var mn = hashes(s)
        var j = s + 1
        while (j < s + w) {
          if (hashes(j) < mn) mn = hashes(j)
          j += 1
        }
        out += mn
        s += 1
      }
    }
    out.toArray
  }

  /** Permutation constants for [[minhashSignature]]: the i-th affine
    * permutation is (a_i·h + b_i) mod p with splitmix-derived odd a_i
    * and p = 2³¹−1 (31-bit × 31-bit products stay within a long, so the
    * hot loop is allocation-free). Hoisted: deriving a_i/b_i inline
    * costs two mix64 rounds per (shingle × hash) — ~2/3 of the
    * signature loop's work. This is the single source of the
    * derivation; there is deliberately no per-call variant.
    */
  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]
  private def perms(k: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(k, { kk =>
      val a = new Array[Long](kk)
      val b = new Array[Long](kk)
      var i = 0
      while (i < kk) {
        a(i) = ((mix64(i.toLong * 2 + 1) >>> 33) % MersennePrime) | 1L
        b(i) = (mix64(i.toLong * 2 + 2) >>> 33) % MersennePrime
        i += 1
      }
      (a, b)
    })

  /** k-value MinHash signature over shingles. */
  def minhashSignature(sh: Array[String], k: Int): Array[Long] = {
    val (pa, pb) = perms(k)
    val sig = Array.fill(k)(Long.MaxValue)
    var si = 0
    while (si < sh.length) {
      val base = hash64(sh(si))
      val hm = ((base % MersennePrime) + MersennePrime) % MersennePrime
      var i = 0
      while (i < k) {
        val h = (pa(i) * hm + pb(i)) % MersennePrime
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      si += 1
    }
    sig
  }

  /** Banded bucket hashes of a signature: one 64-bit key per band. */
  def bandHashes(sig: Array[Long], rows: Int): Array[Long] = {
    val bands = sig.length / rows
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong * 0x9e3779b97f4a7c15L
      var r = 0
      while (r < rows) {
        acc = mix64(acc ^ sig(b * rows + r))
        r += 1
      }
      out(b) = acc
      b += 1
    }
    out
  }

  /** 60-bit SimHash over shingles: bit j = sign of Σ ±1 votes. Votes
    * come from the md5-derived 60-bit uniform ([[md5Uniform60]]) so an
    * independent engine rebuilds every fingerprint bit-for-bit — the
    * dedup_simhash_pairs oracle recomputes the votes, the signs, and
    * the hamming distances from raw text in DuckDB. 60 bits (not 64)
    * because that is the span the cross-engine hex-prefix convention
    * reproduces; the [[SimHash]] pigeonhole chunking is width-agnostic.
    */
  final val SimhashBits = 60

  def simhash(sh: Array[String]): Long = {
    val votes = new Array[Int](SimhashBits)
    var si = 0
    while (si < sh.length) {
      val h = md5Uniform60(sh(si))
      var j = 0
      while (j < SimhashBits) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      si += 1
    }
    var out = 0L
    var j = 0
    while (j < SimhashBits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Hyperplane component for (table, bit, dim) in [-0.5, 0.5).
    *
    * The three indices occupy DISJOINT bit fields of the mix64 input
    * (21 bits each) — the previous small-prime strides
    * (table·1000003 + bit·1009 + dim) collided across bits whenever
    * dim exceeded 1009: for a 1536-dim embedding, bit b's components
    * 1009..1535 equaled bit b+1's components 0..526, correlating
    * adjacent signature bits and silently degrading LSH bucket recall.
    * Field widths (2²¹ ≈ 2M tables/bits/dims) exceed any plausible
    * configuration.
    */
  def hyperplane(table: Int, bit: Int, dim: Int): Double =
    (mix64((table.toLong << 42) | (bit.toLong << 21) | dim.toLong) >>> 11)
      .toDouble / (1L << 53).toDouble - 0.5

  /** Sign-bit LSH signatures, one Long per table. */
  def rhpSignatures(vec: Array[Float], tables: Int, bits: Int): Array[Long] = {
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var d = 0
        while (d < vec.length) {
          dot += vec(d) * hyperplane(t, b, d)
          d += 1
        }
        if (dot >= 0) sig |= (1L << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    out
  }

  /** Cosine similarity in double precision, index order. */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    // min-length bound: on a ragged table (one malformed row longer
    // than its peers) the overlap scores instead of an AIOOBE killing
    // the stage; identical-length inputs — every pinned case — are
    // bit-unchanged. Must stay in lockstep with CosineSim.cosine.
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    // zero-norm guard: 0/0 = NaN, and Spark ORDERS NaN above every real
    // number, so an all-zeros embedding (failed embed call, padding row)
    // would rank as the TOP match for every query in bruteTopK/lshTopK
    // and pass every `>= threshold` near-dup test. A zero vector carries
    // no directional evidence — similarity 0.0. Lockstep with
    // CosineSim.cosine; the oracled corpora contain no zero vectors, so
    // compared outputs are unchanged.
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
