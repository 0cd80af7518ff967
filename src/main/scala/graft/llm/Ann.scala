package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Three paths:
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
  *
  * Dot products run in tight JVM loops (UDF): dense float math is where
  * a compiled loop beats interpreted higher-order functions outright.
  */
object Ann {

  private val cosUdf = udf((a: Array[Float], b: Array[Float]) => Hashing.cosine(a, b))

  def cosine(a: Column, b: Column): Column = cosUdf(a, b)

  /** Exact top-k neighbors for each query row (self excluded). Queries are
    * broadcast; ranking is a per-query window (k-row heaps, no global
    * sort).
    */
  def bruteTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val n = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("nv"))
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
    val nBase = vectors.select(col(idCol).as("vec_id"), col(vecCol).as("nv"))
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
    val centroids = ivfCentroids(v, nCells, iters)

    def nearestUdf(cents: Array[Array[Float]]) =
      udf { (x: Array[Float]) => nearestCellIdx(cents, x) }
    def probeUdf(cents: Array[Array[Float]], n: Int) =
      udf { (x: Array[Float]) => probeCellIdxs(cents, x, n) }
    val nAssigned = v.withColumn("cell_id", nearestUdf(centroids)(col("nv")))
    val qAssigned = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
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
}
