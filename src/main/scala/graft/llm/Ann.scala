package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Four paths:
  *
  *  - [[bruteTopK]]: exact cosine top-k — the correctness baseline. Cost
  *    O(|Q|·|N|): fine for a broadcast-able query set, the wrong shape
  *    for all-pairs at 100 TB.
  *  - [[lshTopK]]: random-hyperplane LSH — sign-bit signatures over
  *    deterministic pseudo-hyperplanes ([[Hashing.hyperplane]]),
  *    multi-table bucketing. Per query only bucket-colliding vectors are
  *    scored; recall tunes via tables × bits.
  *  - [[ivfTopK]]: coarse-quantization cells (IVF minus the k-means
  *    iterations) — each vector scored only against its own cell.
  *  - [[pqTopK]]: product quantization — vectors compressed to per-
  *    subspace codes (32× here); the scan reads codes, not floats.
  *
  * Dot products run in tight JVM loops (UDF): dense float math is where
  * a compiled loop beats interpreted higher-order functions outright.
  */
object Ann {

  /** Cosine via the native codegen expression ([[graft.functions.CosineSim]]
    * — bit-identical arithmetic to [[Hashing.cosine]], no UDF boundary,
    * stays inside whole-stage codegen).
    */
  def cosine(a: Column, b: Column): Column = graft.functions.CosineSim(a, b)

  /** Exact top-k neighbors for each query row (self excluded). Queries are
    * broadcast; ranking is a per-query window (k-row heaps, no global
    * sort).
    */
  def bruteTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // null embeddings (failed upstream embedding jobs) are non-rows for
    // every ANN path — the EdgeCaseSpec contract the signature/centroid
    // UDFs below would otherwise NPE on. Applied at every entry point.
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .filter(col("qv").isNotNull)
    val n = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("nv"))
      .filter(col("nv").isNotNull)
    val scored = broadcast(q).join(n, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("qv"), col("nv")).as("score"))
    // rank on the 6dp-rounded score: the engine accumulates in double
    // while independent reimplementations (e.g. the DuckDB oracle's
    // float cosine) differ in the 1e-7 tail — quantizing first makes
    // near-ties EXACT ties, which the vec_id key then breaks identically
    // in both engines
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("score"), 6).desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"))
  }

  /** LSH top-k: bucket on (table, signature); per query, rank only the
    * vectors sharing a bucket in ANY table. Approximate — recall measured
    * in AnnSpec against [[bruteTopK]].
    */
  def lshTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, tables: Int = 8, bits: Int = 12): DataFrame = {
    val sigUdf = udf((v: Array[Float]) => Hashing.rhpSignatures(v, tables, bits))
    // bucket keys carry IDS ONLY — the vectors would otherwise ride the
    // explode ×tables through the shuffle; they're joined back for just
    // the candidate pairs. Not cached: the re-scan for the join-back is
    // a plain column read, cheaper at scale than corpus-sized cached
    // blocks that nothing can unpersist (the returned frame is lazy).
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .filter(col("qv").isNotNull)
    val nBase = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("nv"))
      .filter(col("nv").isNotNull)
    def keyed(df: DataFrame, id: String, vec: String) =
      df.select(col(id), posexplode(sigUdf(col(vec))).as(Seq("t", "sig")))
    val qk = keyed(qBase, "query_id", "qv")
    val nk = keyed(nBase, "vec_id", "nv")
    val candidates = qk.as("q").join(nk.as("n"),
      col("q.t") === col("n.t") && col("q.sig") === col("n.sig") &&
        col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
      .join(qBase, "query_id")
      .join(nBase, "vec_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    candidates
      .withColumn("score", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("score"), 6).as("score"))
  }

  /** Portable sign-LSH recall@k with a FULL DuckDB oracle — the
    * [[ivfPortableRecall]] pattern applied to [[lshTopK]]. The
    * production [[lshTopK]] derives hyperplanes from splitmix64
    * (engine-internal: DuckDB BIGINT errors on wrapping multiplies);
    * this twin derives component c(t, b, d) = md5₆₀("hp:t:b:d") % 2001
    * − 1000 and takes each signature bit from the EXACT integer dot
    * product Σ_d ⌊x_d·10⁶⌋ · c(t, b, d) > 0 — no floating point
    * anywhere in the signature, so DuckDB rebuilds every bucket
    * bit-for-bit and recomputes recall against its own brute truth.
    * Scale shape is [[lshTopK]]'s: signature keys carry ids only,
    * candidates come from the (t, sig) bucket equi-join, vectors
    * re-join for candidates alone; the hyperplane matrix is
    * tables·bits·maxDims longs — a broadcast-sized constant built once
    * on the driver. |dot| ≤ maxDims·10⁶·10³ ≪ 2⁶³, no overflow.
    */
  def lshPortableRecall(vectors: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, tables: Int = 8,
      bits: Int = 12, maxDims: Int = 64): DataFrame = {
    val planes: Array[Array[Array[Long]]] =
      Array.tabulate(tables, bits, maxDims)((t, b, d) =>
        Hashing.md5Uniform60(s"hp:$t:$b:$d") % 2001L - 1000L)
    val sigUdf = udf { (v: Array[Float]) =>
      require(v.length <= maxDims,
        s"lshPortableRecall supports up to $maxDims dims, got ${v.length}")
      val xm = new Array[Long](v.length)
      var i = 0
      while (i < v.length) {
        xm(i) = math.floor(v(i).toDouble * 1e6).toLong
        i += 1
      }
      Array.tabulate(tables) { t =>
        var sig = 0L
        var b = 0
        while (b < bits) {
          var dot = 0L
          var d = 0
          while (d < xm.length) { dot += xm(d) * planes(t)(b)(d); d += 1 }
          if (dot > 0) sig |= (1L << b)
          b += 1
        }
        sig
      }
    }
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .filter(col("qv").isNotNull)
    val nBase = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("nv"))
      .filter(col("nv").isNotNull)
    val qk = qBase.select(col("query_id"),
      posexplode(sigUdf(col("qv"))).as(Seq("t", "sig")))
    val nk = nBase.select(col("vec_id"),
      posexplode(sigUdf(col("nv"))).as(Seq("t", "sig")))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("s6").desc, col("vec_id"))
    val lshTop = qk.as("q").join(nk.as("n"),
        col("q.t") === col("n.t") && col("q.sig") === col("n.sig") &&
          col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
      .join(qBase, "query_id")
      .join(nBase, "vec_id")
      .withColumn("s6", round(cosine(col("qv"), col("nv")), 6))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"))
    val truth = bruteTopK(vectors, queries, idCol, vecCol, k)
      .select(col("query_id"), col("vec_id"), lit(1L).as("hit"))
    qBase.select(col("query_id"))
      .join(lshTop.join(broadcast(truth), Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg(coalesce(sum(col("hit")), lit(0L)).as("h")),
        Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("h"), lit(0L)).as("n_hits"))
      .withColumn("recall_pct", expr(s"(n_hits * 100) div $k"))
      .orderBy(col("query_id"))
  }

  /** Embedding-cosine near-duplicate pairs (i < j, cosine ≥ threshold):
    * the dedup flavor of [[lshTopK]]. Sign-LSH buckets generate the
    * candidates (16 tables × 8 bits: P(collision) ≈ 1-(1-p⁸)¹⁶ with
    * p = 1-θ/π — ≥ 0.9998 for cos ≥ 0.9 pairs, ~6% for orthogonal
    * background), exact cosine verifies. Never all-pairs.
    */
  def cosineNearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, tables: Int = 16, bits: Int = 8): DataFrame = {
    val sigUdf = udf((v: Array[Float]) => Hashing.rhpSignatures(v, tables, bits))
    // not cached — same lifecycle rationale as lshTopK
    val base = vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
      .filter(col("v").isNotNull)
    val keyed = base.select(col("id"), posexplode(sigUdf(col("v"))).as(Seq("t", "sig")))
    val candidates = keyed.as("l").join(keyed.as("r"),
      col("l.t") === col("r.t") && col("l.sig") === col("r.sig") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("i"), col("r.id").as("j"))
      .distinct()
    candidates
      .join(base.select(col("id").as("i"), col("v").as("vi")), "i")
      .join(base.select(col("id").as("j"), col("v").as("vj")), "j")
      .withColumn("cos", cosine(col("vi"), col("vj")))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), round(col("cos"), 4).as("cos"))
  }

  /** IVF top-k: k-means coarse quantizer + multi-probe search.
    *
    *  - Seeds: the nCells vectors with the smallest xxhash64(id) — a
    *    deterministic uniform sample of the corpus (the r2 first-N-by-id
    *    seeds were correlated: adjacent ids cluster in ingest order).
    *  - Lloyd iterations refine the seeds distributedly: assignment is a
    *    broadcast nearest-centroid pass; the update averages vectors per
    *    cell via posexplode → (cell, dim) partial-agg — the only data
    *    collected to the driver is nCells × dim means, never vectors.
    *  - Queries probe their `nProbe` nearest cells (standard IVF
    *    recall/cost dial); database vectors live in exactly one cell, so
    *    per-query candidates ≈ nProbe/nCells of the corpus.
    *
    * Everything is deterministic: hash-spread seeds, fixed iteration
    * count, vec_id tiebreaks.
    */
  /** Nearest-centroid assignment — the cell a database vector lives in.
    * Package-visible so the spec can verify the exact IVF identity:
    * rank-1 recall == fraction of true NNs whose cell the query probes.
    */
  private[llm] def nearestCellIdx(cents: Array[Array[Float]], x: Array[Float]): Int = {
    var best = 0; var bestSim = Double.MinValue
    var c = 0
    while (c < cents.length) {
      val sim = Hashing.cosine(x, cents(c))
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  /** The `n` nearest cells a query probes (deterministic index tiebreak). */
  private[llm] def probeCellIdxs(cents: Array[Array[Float]], x: Array[Float],
      n: Int): Array[Int] =
    cents.indices.sortBy(c => (-Hashing.cosine(x, cents(c)), c)).take(n).toArray

  /** The coarse quantizer: hash-spread deterministic seeds + distributed
    * Lloyd iterations. Only nCells × dim means ever reach the driver —
    * the two collects below are centroid-sized by construction.
    */
  private[llm] def ivfCentroids(v: DataFrame, nCells: Int,
      iters: Int): Array[Array[Float]] = {
    def nearestUdf(cents: Array[Array[Float]]) =
      udf { (x: Array[Float]) => nearestCellIdx(cents, x) }

    // hash-spread deterministic seeds
    var centroids: Array[Array[Float]] = v
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(nCells)
      .select(col("nv")).collect().map(_.getSeq[Float](0).toArray)

    // Lloyd refinement; empty cells keep their previous centroid
    for (_ <- 1 to iters) {
      val means = v.select(nearestUdf(centroids)(col("nv")).as("cell"),
          posexplode(col("nv")).as(Seq("d", "x")))
        .groupBy(col("cell"), col("d")).agg(avg(col("x")).as("m"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach(r =>
        next(r.getAs[Int]("cell"))(r.getAs[Int]("d")) = r.getAs[Double]("m").toFloat)
      centroids = next
    }
    centroids
  }

  def ivfTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4,
      iters: Int = 2): DataFrame = {
    val v = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("nv"))
      .filter(col("nv").isNotNull)
    val centroids = ivfCentroids(v, nCells, iters)

    def nearestUdf(cents: Array[Array[Float]]) =
      udf { (x: Array[Float]) => nearestCellIdx(cents, x) }
    def probeUdf(cents: Array[Array[Float]], n: Int) =
      udf { (x: Array[Float]) => probeCellIdxs(cents, x, n) }
    val nAssigned = v.withColumn("cell_id", nearestUdf(centroids)(col("nv")))
    val qAssigned = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .filter(col("qv").isNotNull)
      .withColumn("cell_id", explode(probeUdf(centroids, nProbe)(col("qv"))))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    qAssigned.join(nAssigned, Seq("cell_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("score", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"))
  }

  // ---------------- Product quantization (PQ) ----------------
  //
  // The third ANN axis: LSH and IVF prune CANDIDATES; PQ compresses the
  // VECTORS — each is sliced into m subvectors, each subvector snapped to
  // one of ksub per-subspace k-means centroids, so a vector stores as m
  // small codes (m=16, ksub=16 ⇒ 16 four-bit codes = 8 B vs 64 floats =
  // 256 B: 32×).
  // At 100 TB that is the difference between an index that fits executor
  // memory and one that doesn't; scan cost is bandwidth-bound on the
  // 8-byte codes, and scoring reconstructs through codebooks that are a
  // driver-broadcast constant (m × ksub × subDim floats). Jégou et al.,
  // "Product Quantization for Nearest Neighbor Search", TPAMI'11.

  /** L2-nearest code in one subspace codebook (index tiebreak) — PQ
    * assigns by Euclidean distance per subspace; cosine is resolved at
    * query time against the reconstruction.
    */
  private[llm] def nearestSubCode(book: Array[Array[Float]], s: Array[Float]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < book.length) {
      val b = book(c)
      // min-length bound: ragged rows score their overlap (the cosine
      // convention) instead of throwing
      val n = math.min(s.length, b.length)
      var d = 0.0; var i = 0
      while (i < n) { val t = s(i) - b(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Subspace layout is owned by the BOOKS, not the row: every subspace
    * is `books(0)(0).length` wide except possibly the last (the ceil
    * remainder when dim % m != 0), so encode/decode agree with training
    * even on ragged rows.
    */
  private[llm] def pqEncode(books: Array[Array[Array[Float]]], x: Array[Float]): Array[Int] = {
    val m = books.length; val sub = books(0)(0).length
    Array.tabulate(m)(j =>
      nearestSubCode(books(j), java.util.Arrays.copyOfRange(x,
        math.min(j * sub, x.length), math.min((j + 1) * sub, x.length))))
  }

  private[llm] def pqDecode(books: Array[Array[Array[Float]]], codes: Seq[Int]): Array[Float] = {
    val m = books.length; val sub = books(0)(0).length
    val out = new Array[Float]((m - 1) * sub + books(m - 1)(0).length)
    var j = 0
    while (j < m) {
      val piece = books(j)(codes(j))
      System.arraycopy(piece, 0, out, j * sub, piece.length)
      j += 1
    }
    out
  }

  /** Per-subspace k-means codebooks: hash-spread deterministic seeds +
    * distributed Lloyd iterations, all m subspaces refined in ONE pass
    * per iteration (encode → posexplode dims → (subspace, code, dim)
    * partial means). Only m × ksub × subDim means ever reach the driver
    * — same codebook-sized-collect contract as [[ivfCentroids]].
    */
  private[llm] def pqCodebooks(v: DataFrame, m: Int, ksub: Int,
      iters: Int): Array[Array[Array[Float]]] = {
    val seeds = v.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(ksub)
      .select(col("nv")).collect().map(_.getSeq[Float](0).toArray)
    // empty (or zero-dim) input degrades to no codebooks — pqTopK turns
    // that into an empty result, the EdgeCaseSpec convention
    if (seeds.isEmpty || seeds(0).isEmpty) return Array.empty
    val dim = seeds(0).length
    // dim need not divide m: mEff caps at dim (one dim per subspace is
    // the finest split), sub is the ceil width and the LAST subspace
    // takes the (possibly shorter) remainder — no tail dim is dropped
    // and no code index ever reaches past mEff
    val mEff = math.min(m, dim)
    val sub = (dim + mEff - 1) / mEff
    // seeds pinned to the training dim (pad/truncate) so a ragged seed
    // can't produce a misshapen codebook
    val seedsFit = seeds.map(x => java.util.Arrays.copyOf(x, dim))
    var books = Array.tabulate(mEff)(j =>
      seedsFit.map(x => java.util.Arrays.copyOfRange(x, j * sub,
        math.min((j + 1) * sub, dim))))
    for (_ <- 1 to iters) {
      val b = books
      val codesUdf = udf((x: Array[Float]) => pqEncode(b, x))
      val j = (col("d") / sub).cast("int")
      val means = v.select(codesUdf(col("nv")).as("codes"),
          posexplode(col("nv")).as(Seq("d", "x")))
        .filter(col("d") < dim) // ragged long rows: tail dims have no subspace
        .select(j.as("j"), col("d"), element_at(col("codes"), j + 1).as("code"), col("x"))
        .groupBy(col("j"), col("code"), col("d")).agg(avg(col("x")).as("mn"))
        .collect()
      // empty codes keep their previous centroid, like IVF's empty cells
      val next = books.map(_.map(_.clone()))
      means.foreach { r =>
        val sj = r.getAs[Int]("j")
        next(sj)(r.getAs[Int]("code"))(r.getAs[Int]("d") - sj * sub) =
          r.getAs[Double]("mn").toFloat
      }
      books = next
    }
    books
  }

  /** PQ top-k: the scan side reads (id, codes) ONLY — the float vectors
    * exist solely inside codebook training and are dropped before the
    * query join. Scoring is cosine against the codebook reconstruction
    * (equivalent to an ADC table walk, kept as one reconstruct+dot loop
    * for clarity); ranking mirrors [[bruteTopK]]'s deterministic window.
    */
  def pqTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 16, ksub: Int = 16,
      iters: Int = 2): DataFrame = {
    val v = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("nv"))
      .filter(col("nv").isNotNull)
    val books = pqCodebooks(v, m, ksub, iters)
    if (books.isEmpty)
      // empty/degenerate corpus: empty result in the output schema
      return queries.select(col(idCol).as("query_id"), lit(1).as("rank"),
        col(idCol).as("vec_id")).limit(0)
    val encodeUdf = udf((x: Array[Float]) => pqEncode(books, x))
    val codes = v.select(col("vec_id"), encodeUdf(col("nv")).as("codes"))
    val adcUdf = udf((q: Array[Float], cs: Seq[Int]) =>
      Hashing.cosine(q, pqDecode(books, cs)))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .filter(col("qv").isNotNull)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    broadcast(q).join(codes, col("query_id") =!= col("vec_id"))
      .withColumn("score", adcUdf(col("qv"), col("codes")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"))
  }

  /** Cross-engine-PORTABLE IVF recall (the `a4_kmv_md5_portable` move
    * applied to ANN): the full IVF build — seeds, Lloyd iterations,
    * assignment, multi-probe search — expressed so an independent SQL
    * engine reproduces every intermediate bit-for-bit, which is what
    * lets recall@k against the oracled brute truth close as a DuckDB
    * hash compare (the plain [[ivfTopK]] stays spec-pinned: its
    * xxhash64 seed order is Spark-internal).
    *
    *  - Seeds: the nCells vectors with the smallest md5-60(vec_id) —
    *    the house cross-engine uniform; cell ids by that same order.
    *  - Centroids: INTEGER micro-units. Components floor to
    *    ⌊x·10⁶⌋ (exact in either engine); the Lloyd mean is
    *    (Σ micro + 10⁷·n) div n − 10⁷ — the +offset keeps the integer
    *    division on non-negative ground, where Spark's truncating
    *    `div` and DuckDB's flooring `//` agree, so the mean is
    *    floor(Σ/n) on both. Micro magnitudes stay < 2²⁴, so the
    *    float array the cosine reads is exact.
    *  - Every argmax/rank: the house round(cos, 6) + index tiebreak.
    *
    * Cosine is scale-invariant, so ranking against micro-unit
    * centroids equals ranking against the real means up to the shared
    * 6dp quantization. The whole build is ONE lazy plan — no driver
    * collect anywhere; the per-iteration centroid frames (nCells rows)
    * are stage-checkpointed because each carries a full corpus-pass
    * lineage and feeds the next iteration AND the final
    * assignment/probe.
    */
  private def assignCells(v: DataFrame, cents: DataFrame): DataFrame =
    // argmax as a partial-aggregating max(struct), not a rank window:
    // the corpus×nCells frame collapses map-side to one row per vector
    // before the shuffle (the latest-row-per-key house rule). Tiebreak
    // identical to ORDER BY c6 DESC, cell: max of (c6, −cell).
    v.crossJoin(broadcast(cents))
      .withColumn("c6", round(cosine(col("nv"), col("cv")), 6))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("c6"), (-col("cell")).as("negc"),
        col("nv"))).as("m"))
      .select(col("vec_id"), col("m.nv").as("nv"),
        (-col("m.negc")).as("cell"))

  private def lloydStep(v: DataFrame, cents: DataFrame): DataFrame = {
    import graft.ops.Checkpoints.StageCheckpoint
    val means = assignCells(v, cents)
      .select(col("cell"), posexplode(col("nv")).as(Seq("d", "x")))
      .groupBy(col("cell"), col("d"))
      .agg(sum(floor(col("x").cast("double") * 1e6).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .withColumn("mc", expr("(s + 10000000 * n) div n - 10000000"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("mc")))),
        e => e.getField("mc").cast("float")).as("ncv"))
    // empty cells keep their previous centroid
    cents.join(means, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("ncv"), col("cv")).as("cv"))
      .stageCheckpoint()
  }

  /** The portable k-means build shared by [[ivfPortableRecall]] and
    * [[semDedupPortable]]: md5-60 seed order, `iters` integer
    * micro-unit Lloyd steps → the final (cell, cv) centroid frame.
    */
  private[llm] def portableCells(v: DataFrame, nCells: Int,
      iters: Int): DataFrame = {
    import graft.ops.Checkpoints.StageCheckpoint
    val h = conv(substring(md5(col("vec_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val seedW = Window.orderBy(col("h"), col("vec_id"))
    val c0 = v.withColumn("h", h).orderBy(col("h"), col("vec_id"))
      .limit(nCells)
      .select((row_number().over(seedW) - 1).as("cell"),
        transform(col("nv"),
          x => floor(x.cast("double") * 1e6).cast("float")).as("cv"))
      .stageCheckpoint()
    (1 to iters).foldLeft(c0)((c, _) => lloydStep(v, c))
  }

  def ivfPortableRecall(vectors: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nCells: Int = 16,
      nProbe: Int = 4, iters: Int = 2): DataFrame = {
    import graft.ops.Checkpoints.StageCheckpoint
    val v = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("nv"))
      .filter(col("nv").isNotNull)
      .stageCheckpoint()
    val cFinal = portableCells(v, nCells, iters)
    val assigned = assignCells(v, cFinal)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .filter(col("qv").isNotNull)
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("p6").desc, col("cell"))
    val probes = q.crossJoin(broadcast(cFinal))
      .withColumn("p6", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("s6").desc, col("vec_id"))
    val ivfTop = probes.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("s6", round(cosine(col("qv"), col("nv")), 6))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"))
    val truth = bruteTopK(vectors, queries, idCol, vecCol, k)
      .select(col("query_id"), col("vec_id"), lit(1L).as("hit"))
    q.select(col("query_id"))
      .join(ivfTop.join(broadcast(truth), Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg(coalesce(sum(col("hit")), lit(0L)).as("h")),
        Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("h"), lit(0L)).as("n_hits"))
      .withColumn("recall_pct", expr(s"(n_hits * 100) div $k"))
      .orderBy(col("query_id"))
  }

  /** Cross-engine-PORTABLE PQ recall ([[ivfPortableRecall]]'s move
    * applied to product quantization, closing the last ANN family
    * member without an oracle-green twin — r11 verdict item 3): the
    * full PQ build — seeds, per-subspace Lloyd iterations, encoding,
    * ADC-style scoring — expressed so an independent SQL engine
    * reproduces every intermediate bit-for-bit. The production
    * [[pqTopK]] stays spec-pinned (its xxhash64 seed order and float
    * L2 are Spark-internal); this twin is the auditable flavor.
    *
    *  - Seeds: the ksub vectors with the smallest md5-60(vec_id); code
    *    ids by that order (the house cross-engine uniform).
    *  - Everything integer: components floor to ⌊x·10⁶⌋ micro-units;
    *    per-subspace assignment is argmin of the EXACT integer L2
    *    Σ(x−c)² (micro < 2²⁴ ⇒ squared diffs < 2⁴⁸, eight-dim sums
    *    < 2⁵¹ — no rounding convention needed at all, tighter than the
    *    6dp-cosine argmaxes elsewhere); Lloyd means use the shared
    *    (Σ + 10⁷·n) div n − 10⁷ offset-div so Spark `div` == DuckDB
    *    `//` on non-negative ground.
    *  - Scoring: cosine(query, reconstruction) at the house 6dp +
    *    vec_id tiebreak. The reconstruction concatenates micro-unit
    *    centroids — one uniform 10⁶ scale across all dims, so cosine
    *    against the RAW query equals cosine against the real-unit
    *    reconstruction exactly (scale invariance), and the micro floats
    *    are integer-exact below 2²⁴.
    *
    * `sub` is the fixed subspace width (the oracle hardcodes the same
    * split): dims [j·sub, (j+1)·sub) form subspace j — generality over
    * ragged/odd dims is [[pqTopK]]'s job, exact cross-engine arithmetic
    * is this one's. One lazy plan, no driver collects; the per-iteration
    * codebook frames (m·ksub·sub rows) are stage-checkpointed because
    * each carries a full corpus-pass lineage and feeds both the next
    * iteration and the final encode.
    */
  def pqPortableRecall(vectors: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, sub: Int = 8, ksub: Int = 8,
      iters: Int = 2): DataFrame = {
    import graft.ops.Checkpoints.StageCheckpoint
    val v = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("nv"))
      .filter(col("nv").isNotNull)
      .stageCheckpoint()
    // micro-unit dim stream keyed by (subspace j, within-subspace sd)
    val xs = v.select(col("vec_id"), posexplode(col("nv")).as(Seq("d", "x")))
      .select(col("vec_id"), (col("d") / sub).cast("int").as("j"),
        (col("d") % sub).as("sd"),
        floor(col("x").cast("double") * 1e6).cast("long").as("x"))
      .stageCheckpoint()
    val h = conv(substring(md5(col("vec_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val seedW = Window.orderBy(col("h"), col("vec_id"))
    val seedIds = v.withColumn("h", h).orderBy(col("h"), col("vec_id"))
      .limit(ksub)
      .select(col("vec_id"), (row_number().over(seedW) - 1).as("code"))
    val cb0 = xs.join(broadcast(seedIds), "vec_id")
      .select(col("j"), col("code"), col("sd"), col("x").as("c"))
      .stageCheckpoint()

    // per-subspace argmin of exact integer L2 — min(struct(dist, code))
    // collapses map-side to one row per (vector, subspace) pre-shuffle
    def assign(cb: DataFrame): DataFrame =
      xs.join(broadcast(cb), Seq("j", "sd"))
        .groupBy(col("vec_id"), col("j"), col("code"))
        .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("dist"))
        .groupBy(col("vec_id"), col("j"))
        .agg(min(struct(col("dist"), col("code"))).as("m"))
        .select(col("vec_id"), col("j"), col("m.code").as("code"))

    def lloyd(cb: DataFrame): DataFrame = {
      val means = xs.join(assign(cb), Seq("vec_id", "j"))
        .groupBy(col("j"), col("code"), col("sd"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .select(col("j"), col("code"), col("sd"),
          expr("(s + 10000000 * n) div n - 10000000").as("mc"))
      // empty codes keep their previous centroid, like IVF's empty cells
      cb.join(means, Seq("j", "code", "sd"), "left")
        .select(col("j"), col("code"), col("sd"),
          coalesce(col("mc"), col("c")).as("c"))
        .stageCheckpoint()
    }
    val cbF = (1 to iters).foldLeft(cb0)((cb, _) => lloyd(cb))

    // encode + reconstruct: (vec_id, d, c) → dim-ordered micro float array
    val recon = assign(cbF).join(broadcast(cbF), Seq("j", "code"))
      .select(col("vec_id"), (col("j") * sub + col("sd")).as("d"), col("c"))
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("c")))),
        e => e.getField("c").cast("float")).as("rv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .filter(col("qv").isNotNull)
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("s6").desc, col("vec_id"))
    val pqTop = broadcast(q).join(recon, col("query_id") =!= col("vec_id"))
      .withColumn("s6", round(cosine(col("qv"), col("rv")), 6))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"))
    val truth = bruteTopK(vectors, queries, idCol, vecCol, k)
      .select(col("query_id"), col("vec_id"), lit(1L).as("hit"))
    q.select(col("query_id"))
      .join(pqTop.join(broadcast(truth), Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg(coalesce(sum(col("hit")), lit(0L)).as("h")),
        Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("h"), lit(0L)).as("n_hits"))
      .withColumn("recall_pct", expr(s"(n_hits * 100) div $k"))
      .orderBy(col("query_id"))
  }

  /** Cross-engine-PORTABLE SemDeDup ([[semDedup]]'s auditable twin —
    * r11 verdict item 4, the last dedup-family member without an
    * oracle row): cells come from the shared [[portableCells]] build
    * (md5-60 seeds, integer micro-unit Lloyd, 6dp-cosine argmax
    * assignment — every intermediate reproducible in independent SQL),
    * then the in-cell pair sweep marks the higher id of every pair
    * with round(cos, 6) ≥ threshold as removed. Output (vec_id, cell,
    * removed) — one row per input vector; BOTH the cell partition and
    * the removal verdicts hash-compare against a DuckDB rebuild. The
    * production [[semDedup]] stays spec-pinned (xxhash64 seeds, float
    * Lloyd).
    */
  def semDedupPortable(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCells: Int = 16, iters: Int = 2): DataFrame = {
    import graft.ops.Checkpoints.StageCheckpoint
    val v = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("nv"))
      .filter(col("nv").isNotNull)
      .stageCheckpoint()
    // (vec_id, nv, cell) — checkpointed: feeds both pair-sweep sides
    // and the output spine
    val cells = assignCells(v, portableCells(v, nCells, iters))
      .stageCheckpoint()
    val pairs = cells.select(col("cell"), col("vec_id").as("i"), col("nv").as("vi"))
      .join(cells.select(col("cell"), col("vec_id").as("j"), col("nv").as("vj")),
        "cell")
      .filter(col("i") < col("j"))
      .filter(round(cosine(col("vi"), col("vj")), 6) >= threshold)
    val removed = pairs.select(col("j").as("vec_id")).distinct()
      .withColumn("removed", lit(true))
    cells.select(col("vec_id"), col("cell"))
      .join(removed, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell"),
        coalesce(col("removed"), lit(false)).as("removed"))
      .orderBy(col("vec_id"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al., arXiv:2303.09540):
    * k-means the embeddings into cells, then near-dup ONLY within each
    * cell — the candidate set shrinks from O(n²) to Σ|cell|², and the
    * cells shuffle-partition the work evenly (pick nCells ∝ n/√budget
    * at scale; the paper runs ~10⁵ cells for 10⁸ docs). Keep-lowest-id
    * inside each near-dup pair, matching [[cosineNearDupPairs]]'s dedup
    * convention. Exact duplicates can never escape: identical vectors
    * assign to the same deterministic nearest cell. Returns (vec_id,
    * cell, removed) — one row per input vector.
    */
  def semDedup(vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCells: Int = 16, iters: Int = 2): DataFrame = {
    val v = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("nv"))
      .filter(col("nv").isNotNull)
    val centroids = ivfCentroids(v, nCells, iters)
    val cellUdf = udf((x: Array[Float]) => nearestCellIdx(centroids, x))
    val cells = v.select(col("vec_id"), col("nv"), cellUdf(col("nv")).as("cell"))
    val pairs = cells.select(col("cell"), col("vec_id").as("i"), col("nv").as("vi"))
      .join(cells.select(col("cell"), col("vec_id").as("j"), col("nv").as("vj")),
        "cell")
      .filter(col("i") < col("j"))
      .filter(cosine(col("vi"), col("vj")) >= threshold)
    val removed = pairs.select(col("j").as("vec_id")).distinct()
      .withColumn("removed", lit(true))
    cells.select(col("vec_id"), col("cell"))
      .join(removed, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell"),
        coalesce(col("removed"), lit(false)).as("removed"))
  }

  /** Top principal direction of the embedding cloud (dominant eigenvector
    * of the UNCENTERED second-moment matrix XᵀX) via the distributed
    * power method — the one piece of iterative linear algebra a vector
    * pipeline leans on (whitening checks, anisotropy audits, fast 1-D
    * projections).
    *
    * Per iteration: project every row onto w (tight JVM dot loop), then
    * w′_d = Σ_rows p·x_d — a posexplode → groupBy(dim) partial-agg, the
    * IVF-centroid movement: only `dim` doubles ever reach the driver.
    * Never materializes XᵀX (d² entries) — at 100 TB both X and XᵀX-free
    * iteration matter. Deterministic by construction: fixed uniform
    * start, fixed iteration count; the sign is canonicalized so the
    * largest-|weight| coordinate (lowest dim on ties at 6dp) is
    * positive. Float-sum ordering perturbs last ulps only (power
    * iterations contract perturbations toward the dominant direction),
    * so consumers compare at the house 6dp-rank convention.
    */
  def topComponent(vectors: DataFrame, vecCol: String,
      iters: Int = 3): Array[Double] = {
    val v = vectors.select(col(vecCol).as("x")).filter(size(col("x")) > 0)
    // dim = max row length, matching the oracle's max(len(embedding)):
    // first() would throw on an empty input and under-size the
    // accumulator on ragged tables where a later row is longer
    val dim = v.agg(coalesce(max(size(col("x"))), lit(0)))
      .first().getInt(0)
    if (dim == 0) return Array.empty[Double]
    var w = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val wNow = w
      val projUdf = udf { (x: Array[Float]) =>
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i) * wNow(i); i += 1 }
        s
      }
      val sums = v
        .select(projUdf(col("x")).as("p"), posexplode(col("x")).as(Seq("d", "xi")))
        .groupBy(col("d")).agg(sum(col("p") * col("xi")).as("s"))
        .collect()
      val next = new Array[Double](dim)
      sums.foreach(r => next(r.getAs[Int]("d")) = r.getAs[Double]("s"))
      val norm = math.sqrt(next.map(a => a * a).sum)
      w = next.map(_ / norm)
    }
    // canonical sign: the coordinate that ranks first by (|w| desc at
    // 6dp, dim asc) is positive. math.round == SQL round for the
    // positive |w|·1e6 (both half-away-from-zero there).
    val lead = w.indices.minBy(i =>
      (-math.round(math.abs(w(i)) * 1e6), i))
    if (w(lead) < 0) w.map(-_) else w
  }
}
