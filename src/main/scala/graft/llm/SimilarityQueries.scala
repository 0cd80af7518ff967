package graft.llm

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table plus the multimodal
  * binary-column plumbing. Brute-force cosine top-k is the oracle-checked
  * baseline; LSH and IVF are the approximate scale paths (recall measured
  * in AnnSpec — their outputs are engine-defined, so rows-only here).
  */
object SimilarityQueries extends QueryPack {

  private val brute = Q(
    "ann_cosine_topk_brute",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.bruteTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy(col("query_id"), col("rank"))
    },
    // scores are excluded from the compared output (only the ranking),
    // and BOTH engines rank on the 6dp-rounded score (see bruteTopK):
    // double-vs-float accumulation tails then can't flip near-tied
    // ranks — quantized ties break on vec_id identically.
    Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           |  WHERE vec_id < 10),
           |sc AS (SELECT qid, e.vec_id AS vid,
           |  round(CAST(list_cosine_similarity(qe, e.embedding) AS DOUBLE), 6) AS c
           | FROM q, embeddings e WHERE e.vec_id <> qid),
           |r AS (SELECT qid, vid,
           |  row_number() OVER (PARTITION BY qid ORDER BY c DESC, vid) AS rnk
           | FROM sc)
           |SELECT qid AS query_id, rnk AS rank, vid AS vec_id
           |FROM r WHERE rnk <= 5 ORDER BY 1, 2""".stripMargin),
    headline = true)

  /** Recall@k audit channel for the approximate paths: join the ANN
    * result against the exact brute-force top-k for the SAME query set
    * and append per-query recall as an integer percent column — ANN
    * quality then shows up in the dumped output itself (the driver's
    * rows-only check pins it across rounds), not only in specs. This is
    * the production monitoring shape too: ground truth comes from a
    * SAMPLED query set (here: the 10 queries) whose exact top-k is
    * refreshed offline, so the truth frame is Q×k rows — broadcast-sized
    * at any corpus scale; the index serving path stays approximate.
    */
  private def withRecall(ann: org.apache.spark.sql.DataFrame,
      truth: org.apache.spark.sql.DataFrame, k: Int) = {
    val hits = ann.join(broadcast(truth.select(col("query_id"), col("vec_id"))),
        Seq("query_id", "vec_id"), "leftsemi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("_hits"))
    ann.join(broadcast(hits), Seq("query_id"), "left")
      // integer div end-to-end (the matryoshka recall_pct rule): the
      // float-divide-then-cast form truncates identically today but
      // silently diverges from an integer-sharing oracle if k changes
      .withColumn("_h100", coalesce(col("_hits"), lit(0L)) * 100)
      .withColumn("recall_pct", expr(s"_h100 div $k"))
      .drop("_hits", "_h100")
  }

  // NOTE on the pinned recall values: this synthetic corpus is random
  // vectors, so a query's true top-5 sits at cosine ≈ 0.3-0.6 (≈60°) —
  // below sign-LSH's collision S-curve, so ann_lsh_topk's recall_pct is
  // honestly ~0 here (collision coverage ≡ recall; the identity is
  // asserted in LlmSpecs, and recall on PLANTED near-dups is proven
  // there too). IVF recall tracks probe coverage (nProbe/nCells) and PQ
  // tracks code resolution — both visibly nonzero below.
  private val lsh = Q(
    "ann_lsh_topk",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 10)
      val truth = Ann.bruteTopK(e, q, "vec_id", "embedding", k = 5)
      withRecall(Ann.lshTopK(e, q, "vec_id", "embedding", k = 5), truth, 5)
        .orderBy(col("query_id"), col("rank"))
    },
    None)

  private val ivf = Q(
    "ann_ivf_topk",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 10)
      val truth = Ann.bruteTopK(e, q, "vec_id", "embedding", k = 5)
      withRecall(Ann.ivfTopK(e, q, "vec_id", "embedding", k = 5), truth, 5)
        .orderBy(col("query_id"), col("rank"))
    },
    None)

  private val pq = Q(
    "ann_pq_topk",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 10)
      val truth = Ann.bruteTopK(e, q, "vec_id", "embedding", k = 5)
      withRecall(Ann.pqTopK(e, q, "vec_id", "embedding", k = 5), truth, 5)
        .orderBy(col("query_id"), col("rank"))
    },
    None)

  /** Portable IVF recall@5 with a FULL DuckDB oracle — the ANN family's
    * oracled recall anchor ([[Ann.ivfPortableRecall]]): md5-60 seed
    * order, integer micro-unit Lloyd means (offset-div keeps Spark
    * `div` == DuckDB `//`), 6dp-rounded cosine at every argmax — so the
    * oracle below rebuilds the ENTIRE index (both unrolled iterations),
    * reruns the multi-probe search, recomputes recall against its own
    * brute truth, and the hash compare closes. The spec-pinned
    * `ann_ivf_topk` keeps Spark-internal xxhash64 seeds; this twin is
    * the auditable flavor (the `a4_kmv_md5_portable` pattern).
    */
  private def ivfIterCte(prev: String, an: String, mn: String, out: String) =
    s"""$an AS (SELECT vec_id, embedding, cell FROM (
       |  SELECT e.vec_id, e.embedding, p.cell, row_number() OVER (
       |    PARTITION BY e.vec_id ORDER BY round(CAST(
       |      list_cosine_similarity(e.embedding, p.cv) AS DOUBLE), 6) DESC,
       |      p.cell) AS rn
       |  FROM e CROSS JOIN $prev p) WHERE rn = 1),
       |$mn AS (SELECT cell, CAST(gs - 1 AS INT) AS d,
       |   (CAST(sum(CAST(floor(CAST(embedding[CAST(gs AS INT)] AS DOUBLE)
       |      * 1e6) AS BIGINT)) AS BIGINT)
       |    + 10000000 * count(*)) // count(*) - 10000000 AS mc
       |  FROM (SELECT cell, embedding,
       |     generate_subscripts(embedding, 1) AS gs FROM $an)
       |  GROUP BY 1, 2),
       |${out}n AS (SELECT cell, list(CAST(mc AS DOUBLE) ORDER BY d) AS ncv
       |  FROM $mn GROUP BY 1),
       |$out AS (SELECT p.cell, COALESCE(n.ncv, p.cv) AS cv
       |  FROM $prev p LEFT JOIN ${out}n n USING (cell))""".stripMargin

  private val ivfPortable = Q(
    "ann_ivf_recall_portable",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.ivfPortableRecall(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
            |  WHERE embedding IS NOT NULL),
            |sd AS (SELECT vec_id, embedding,
            |   row_number() OVER (ORDER BY
            |     ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))
            |       ::BIGINT, vec_id) - 1 AS cell
            |  FROM e ORDER BY
            |   ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))
            |     ::BIGINT, vec_id LIMIT 16),
            |c0 AS (SELECT cell,
            |   [CAST(floor(CAST(x AS DOUBLE) * 1e6) AS DOUBLE)
            |    for x in embedding] AS cv FROM sd),
            |${ivfIterCte("c0", "a1", "m1", "c1")},
            |${ivfIterCte("c1", "a2", "m2", "c2")},
            |af AS (SELECT vec_id, cell FROM (
            |  SELECT e.vec_id, p.cell, row_number() OVER (
            |    PARTITION BY e.vec_id ORDER BY round(CAST(
            |      list_cosine_similarity(e.embedding, p.cv) AS DOUBLE), 6)
            |      DESC, p.cell) AS rn
            |  FROM e CROSS JOIN c2 p) WHERE rn = 1),
            |q AS (SELECT vec_id AS qid, embedding AS qe FROM e
            |  WHERE vec_id < 10),
            |pr AS (SELECT qid, qe, cell FROM (
            |  SELECT q.qid, q.qe, p.cell, row_number() OVER (
            |    PARTITION BY q.qid ORDER BY round(CAST(
            |      list_cosine_similarity(q.qe, p.cv) AS DOUBLE), 6) DESC,
            |      p.cell) AS rn
            |  FROM q CROSS JOIN c2 p) WHERE rn <= 4),
            |iv AS (SELECT qid, vid FROM (
            |  SELECT pr.qid, e.vec_id AS vid, row_number() OVER (
            |    PARTITION BY pr.qid ORDER BY round(CAST(
            |      list_cosine_similarity(pr.qe, e.embedding) AS DOUBLE), 6)
            |      DESC, e.vec_id) AS rnk
            |  FROM pr JOIN af ON af.cell = pr.cell
            |  JOIN e ON e.vec_id = af.vec_id AND e.vec_id <> pr.qid)
            |  WHERE rnk <= 5),
            |ft AS (SELECT qid, e.vec_id AS vid, row_number() OVER (
            |   PARTITION BY qid ORDER BY round(CAST(
            |     list_cosine_similarity(qe, e.embedding) AS DOUBLE), 6)
            |     DESC, e.vec_id) AS rnk
            |  FROM q, e WHERE e.vec_id <> qid),
            |truth AS (SELECT qid, vid FROM ft WHERE rnk <= 5),
            |hits AS (SELECT iv.qid,
            |   CAST(count(truth.vid) AS BIGINT) AS n_hits
            |  FROM iv LEFT JOIN truth
            |   ON iv.qid = truth.qid AND iv.vid = truth.vid
            |  GROUP BY 1)
            |SELECT q.qid AS query_id,
            | COALESCE(n_hits, 0) AS n_hits,
            | COALESCE(n_hits, 0) * 100 // 5 AS recall_pct
            |FROM q LEFT JOIN hits ON hits.qid = q.qid
            |ORDER BY 1""".stripMargin))

  /** Portable sign-LSH recall@5 with a FULL DuckDB oracle
    * ([[Ann.lshPortableRecall]]) — the `ann_ivf_recall_portable`
    * pattern closing the sign-LSH family: hyperplane components are
    * md5-60-derived centered integers and every signature bit is an
    * exact integer dot-product sign, so the oracle rebuilds all
    * tables·bits buckets bit-for-bit, reruns the bucket join, and
    * recomputes recall against its own brute truth. `ann_lsh_topk`
    * stays spec-pinned as the production splitmix64 variant. (Recall
    * on this random corpus is honestly ~0 — true top-5 neighbors sit
    * at ≈60°, below the sign-LSH collision S-curve; the VALUE of the
    * compare is that both engines agree on the buckets, candidates,
    * and the resulting zeros. Planted near-dup recall is AnnSpec's.)
    */
  private val lshPortable = Q(
    "ann_lsh_recall_portable",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.lshPortableRecall(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
    },
    Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings
           |  WHERE embedding IS NOT NULL),
           |hp AS (SELECT t.t, b.b, d.d,
           |   ('0x' || substring(md5('hp:' || t.t || ':' || b.b || ':' ||
           |     d.d), 1, 15))::BIGINT % 2001 - 1000 AS c
           |  FROM range(8) t(t), range(12) b(b), range(64) d(d)),
           |xm AS (SELECT vec_id, CAST(gs - 1 AS INT) AS d,
           |   CAST(floor(CAST(embedding[CAST(gs AS INT)] AS DOUBLE) * 1e6)
           |     AS BIGINT) AS x
           |  FROM (SELECT vec_id, embedding,
           |     generate_subscripts(embedding, 1) AS gs FROM e)),
           |dots AS (SELECT vec_id, t, b, CAST(sum(x * c) AS BIGINT) AS dot
           |  FROM xm JOIN hp ON hp.d = xm.d GROUP BY 1, 2, 3),
           |sig AS (SELECT vec_id, t, CAST(sum(CASE WHEN dot > 0
           |    THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sg
           |  FROM dots GROUP BY 1, 2),
           |q AS (SELECT vec_id AS qid, embedding AS qe FROM e
           |  WHERE vec_id < 10),
           |cand AS (SELECT DISTINCT qs.vec_id AS qid, ns.vec_id AS vid
           |  FROM sig qs JOIN sig ns ON qs.t = ns.t AND qs.sg = ns.sg
           |   AND qs.vec_id <> ns.vec_id
           |  WHERE qs.vec_id < 10),
           |top AS (SELECT qid, vid FROM (
           |  SELECT c.qid, c.vid, row_number() OVER (PARTITION BY c.qid
           |    ORDER BY round(CAST(list_cosine_similarity(q.qe,
           |      e.embedding) AS DOUBLE), 6) DESC, c.vid) AS rnk
           |  FROM cand c JOIN q ON q.qid = c.qid
           |  JOIN e ON e.vec_id = c.vid) WHERE rnk <= 5),
           |ft AS (SELECT qid, e.vec_id AS vid, row_number() OVER (
           |   PARTITION BY qid ORDER BY round(CAST(
           |     list_cosine_similarity(qe, e.embedding) AS DOUBLE), 6)
           |     DESC, e.vec_id) AS rnk
           |  FROM q, e WHERE e.vec_id <> qid),
           |truth AS (SELECT qid, vid FROM ft WHERE rnk <= 5),
           |hits AS (SELECT top.qid,
           |   CAST(count(truth.vid) AS BIGINT) AS n_hits
           |  FROM top LEFT JOIN truth
           |   ON top.qid = truth.qid AND top.vid = truth.vid
           |  GROUP BY 1)
           |SELECT q.qid AS query_id,
           | COALESCE(n_hits, 0) AS n_hits,
           | COALESCE(n_hits, 0) * 100 // 5 AS recall_pct
           |FROM q LEFT JOIN hits ON hits.qid = q.qid
           |ORDER BY 1""".stripMargin))

  /** Portable PQ recall@5 with a FULL DuckDB oracle
    * ([[Ann.pqPortableRecall]]) — closes the last ANN family member
    * without an oracle-green twin (r11 verdict item 3). The oracle
    * rebuilds the ENTIRE product-quantization index: md5-60 seed
    * order, both per-subspace Lloyd iterations in EXACT integer
    * micro-unit arithmetic (assignment argmin is integer L2 — no
    * rounding convention needed), the final encode, the micro-unit
    * reconstruction, the 6dp-cosine ADC ranking, and recall against
    * its own brute truth. `ann_pq_topk` stays spec-pinned as the
    * production splitmix/float variant.
    */
  private def pqIterCte(prev: String, an: String, mn: String, out: String) =
    s"""$an AS (SELECT vec_id, j, code FROM (
       |  SELECT vec_id, j, code,
       |    row_number() OVER (PARTITION BY vec_id, j
       |      ORDER BY dist, code) AS rn
       |  FROM (SELECT xs.vec_id, cb.j, cb.code,
       |     CAST(sum((xs.x - cb.c) * (xs.x - cb.c)) AS BIGINT) AS dist
       |    FROM xs JOIN $prev cb ON cb.j = xs.j AND cb.sd = xs.sd
       |    GROUP BY 1, 2, 3)) WHERE rn = 1),
       |$mn AS (SELECT a.j, a.code, xs.sd,
       |   (CAST(sum(xs.x) AS BIGINT) + 10000000 * count(*)) // count(*)
       |     - 10000000 AS mc
       |  FROM xs JOIN $an a ON a.vec_id = xs.vec_id AND a.j = xs.j
       |  GROUP BY 1, 2, 3),
       |$out AS (SELECT cb.j, cb.code, cb.sd, COALESCE(m.mc, cb.c) AS c
       |  FROM $prev cb LEFT JOIN $mn m ON m.j = cb.j
       |    AND m.code = cb.code AND m.sd = cb.sd)""".stripMargin

  private val pqPortable = Q(
    "ann_pq_recall_portable",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.pqPortableRecall(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
            |  WHERE embedding IS NOT NULL),
            |xm AS (SELECT vec_id, CAST(gs - 1 AS INT) AS d,
            |   CAST(floor(CAST(embedding[CAST(gs AS INT)] AS DOUBLE)
            |     * 1e6) AS BIGINT) AS x
            |  FROM (SELECT vec_id, embedding,
            |     generate_subscripts(embedding, 1) AS gs FROM e)),
            |xs AS (SELECT vec_id, d // 8 AS j, d % 8 AS sd, x FROM xm),
            |sd0 AS (SELECT vec_id, row_number() OVER (ORDER BY
            |     ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))
            |       ::BIGINT, vec_id) - 1 AS code
            |  FROM e ORDER BY
            |   ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))
            |     ::BIGINT, vec_id LIMIT 8),
            |cb0 AS (SELECT s.code, xs.j, xs.sd, xs.x AS c
            |  FROM sd0 s JOIN xs ON xs.vec_id = s.vec_id),
            |${pqIterCte("cb0", "a1", "m1", "cb1")},
            |${pqIterCte("cb1", "a2", "m2", "cb2")},
            |af AS (SELECT vec_id, j, code FROM (
            |  SELECT vec_id, j, code, row_number() OVER (
            |    PARTITION BY vec_id, j ORDER BY dist, code) AS rn
            |  FROM (SELECT xs.vec_id, cb.j, cb.code,
            |     CAST(sum((xs.x - cb.c) * (xs.x - cb.c)) AS BIGINT) AS dist
            |    FROM xs JOIN cb2 cb ON cb.j = xs.j AND cb.sd = xs.sd
            |    GROUP BY 1, 2, 3)) WHERE rn = 1),
            |rl AS (SELECT af.vec_id,
            |   list(CAST(cb.c AS DOUBLE) ORDER BY cb.j * 8 + cb.sd) AS rv
            |  FROM af JOIN cb2 cb ON cb.j = af.j AND cb.code = af.code
            |  GROUP BY 1),
            |q AS (SELECT vec_id AS qid, embedding AS qe FROM e
            |  WHERE vec_id < 10),
            |top AS (SELECT qid, vid FROM (
            |  SELECT q.qid, r.vec_id AS vid, row_number() OVER (
            |    PARTITION BY q.qid ORDER BY round(CAST(
            |      list_cosine_similarity(q.qe, r.rv) AS DOUBLE), 6) DESC,
            |      r.vec_id) AS rnk
            |  FROM q CROSS JOIN rl r WHERE r.vec_id <> q.qid)
            |  WHERE rnk <= 5),
            |ft AS (SELECT qid, e.vec_id AS vid, row_number() OVER (
            |   PARTITION BY qid ORDER BY round(CAST(
            |     list_cosine_similarity(qe, e.embedding) AS DOUBLE), 6)
            |     DESC, e.vec_id) AS rnk
            |  FROM q, e WHERE e.vec_id <> qid),
            |truth AS (SELECT qid, vid FROM ft WHERE rnk <= 5),
            |hits AS (SELECT top.qid,
            |   CAST(count(truth.vid) AS BIGINT) AS n_hits
            |  FROM top LEFT JOIN truth
            |   ON top.qid = truth.qid AND top.vid = truth.vid
            |  GROUP BY 1)
            |SELECT q.qid AS query_id,
            | COALESCE(n_hits, 0) AS n_hits,
            | COALESCE(n_hits, 0) * 100 // 5 AS recall_pct
            |FROM q LEFT JOIN hits ON hits.qid = q.qid
            |ORDER BY 1""".stripMargin))

  /** Portable SemDeDup with a FULL DuckDB oracle
    * ([[Ann.semDedupPortable]]) — the last dedup-family member gets its
    * hash pin (r11 verdict item 4): the oracle rebuilds the md5-seeded
    * integer Lloyd cells (the `ann_ivf_recall_portable` CTEs), reruns
    * the in-cell pair sweep at round(cos, 6) ≥ 0.5, and compares ALL
    * 500 (vec_id, cell, removed) rows — the full cell partition AND
    * every removal verdict. Threshold 0.5 (not the production 0.9)
    * because this corpus plants no near-identical vectors (max pairwise
    * cosine ≈ 0.6): at 0.9 the removed column would be all-false; at
    * 0.5 real in-cell pairs cross it, so the sweep's verdict logic is
    * exercised, not just the cells. Planted-dup recall stays AnnSpec's.
    */
  private val semdedupPortable = Q(
    "dedup_semdedup_portable",
    (s, d) => Ann.semDedupPortable(Tables.embeddings(s, d),
      "vec_id", "embedding", threshold = 0.5),
    Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
            |  WHERE embedding IS NOT NULL),
            |sd AS (SELECT vec_id, embedding,
            |   row_number() OVER (ORDER BY
            |     ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))
            |       ::BIGINT, vec_id) - 1 AS cell
            |  FROM e ORDER BY
            |   ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))
            |     ::BIGINT, vec_id LIMIT 16),
            |c0 AS (SELECT cell,
            |   [CAST(floor(CAST(x AS DOUBLE) * 1e6) AS DOUBLE)
            |    for x in embedding] AS cv FROM sd),
            |${ivfIterCte("c0", "ia1", "im1", "c1")},
            |${ivfIterCte("c1", "ia2", "im2", "c2")},
            |af AS (SELECT vec_id, cell FROM (
            |  SELECT e.vec_id, p.cell, row_number() OVER (
            |    PARTITION BY e.vec_id ORDER BY round(CAST(
            |      list_cosine_similarity(e.embedding, p.cv) AS DOUBLE), 6)
            |      DESC, p.cell) AS rn
            |  FROM e CROSS JOIN c2 p) WHERE rn = 1),
            |pairs AS (SELECT ai.vec_id AS i, aj.vec_id AS j
            |  FROM af ai JOIN af aj ON ai.cell = aj.cell
            |    AND ai.vec_id < aj.vec_id
            |  JOIN e ei ON ei.vec_id = ai.vec_id
            |  JOIN e ej ON ej.vec_id = aj.vec_id
            |  WHERE round(CAST(list_cosine_similarity(ei.embedding,
            |    ej.embedding) AS DOUBLE), 6) >= 0.5),
            |rm AS (SELECT DISTINCT j AS vec_id FROM pairs)
            |SELECT af.vec_id, CAST(af.cell AS INT) AS cell,
            | (rm.vec_id IS NOT NULL) AS removed
            |FROM af LEFT JOIN rm ON rm.vec_id = af.vec_id
            |ORDER BY af.vec_id""".stripMargin))

  /** Embedding-cosine near-dup dedup: LSH-bucketed candidates, exact
    * verify, FULL brute-force oracle. This corpus plants no near-identical
    * vectors (max pairwise cosine ≈ 0.6 — measured), so the verified
    * result is the correct empty set in both engines; the operator's
    * find-the-pair behavior is proven on planted dups in AnnSpec.
    */
  private val embDedup = Q(
    "dedup_embedding_cosine",
    (s, d) => Ann.cosineNearDupPairs(
      Tables.embeddings(s, d), "vec_id", "embedding", threshold = 0.9)
      .orderBy(col("i"), col("j")),
    Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings),
           |p AS (SELECT a.vec_id AS i, b.vec_id AS j,
           |  list_cosine_similarity(a.embedding, b.embedding) AS c
           | FROM e a JOIN e b ON a.vec_id < b.vec_id)
           |SELECT i, j, round(c, 4) AS cos FROM p WHERE c >= 0.9
           |ORDER BY i, j""".stripMargin))

  private val mmFeatures = Q(
    "mm_binary_features",
    (s, d) => {
      val media = Multimodal.synthesize(Tables.documents(s, d), "doc_id", "text")
      media.groupBy(col("format"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("media"))).as("sum_bytes"),
          count_distinct(col("media")).as("n_distinct_payloads"),
          min(col("width")).as("min_w"), max(col("height")).as("max_h"))
        .orderBy(col("format"))
    },
    Some("""WITH m AS (SELECT
           |  from_hex(md5(text)) AS media,
           |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
           |  doc_id % 64 + 1 AS width, doc_id % 48 + 1 AS height
           | FROM documents)
           |SELECT format, count(*) AS n,
           | CAST(sum(octet_length(media)) AS BIGINT) AS sum_bytes,
           | count(DISTINCT media) AS n_distinct_payloads,
           | CAST(min(width) AS INT) AS min_w, CAST(max(height) AS INT) AS max_h
           |FROM m GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Per-label histogram of the argmax dimension — an embedding-space
    * sanity profile (collapsed representations skew the histogram to few
    * dims). Pure expression over the float array; first-match tie
    * handling is identical in both engines (ties are measure-zero on
    * this data anyway).
    */
  /** Pairwise distances between per-LABEL embedding centroids — the
    * cluster-geometry monitor (are the classes separating? is one
    * collapsing into another?) that embedding-quality dashboards track
    * per training run. Exact path: each float component quantizes to
    * integer micro-units by FLOOR (floor of a double has no .5-tie
    * hazard, unlike round), per-(label, dim) sums are exact BIGINTs,
    * and the squared centroid distance publishes as the exact DECIMAL
    * integral Σ_dim (s_a·n_b − s_b·n_a)² — the common-denominator form
    * that never divides, with the whole integrand (products AND the
    * difference, not just the squares) through DECIMAL per the house
    * rule so nothing can wrap silently in Long. The cell publishes as
    * its canonical decimal STRING (int128-wide decimals format
    * differently per reader; the digit string is the portable compare
    * convention). One posexplode pass (rows × dims),
    * one keyed aggregation to |labels|·dims, then everything is
    * label-pair-sized.
    */
  private val centroidDist = Q(
    "emb_label_centroid_dist",
    (s, d) => {
      val comp = Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("label"), col("dim"),
          floor(col("x").cast("double") * 1e6).cast("long").as("xm"))
      val sums = comp.groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("xm")).as("sm"))
      val a = sums.select(col("label").as("la"), col("dim"),
        col("n").as("na"), col("sm").as("sa"))
      val b = sums.select(col("label").as("lb"), col("dim"),
        col("n").as("nb"), col("sm").as("sb"))
      val diff = (col("sa").cast("decimal(19,0)") *
        col("nb").cast("decimal(10,0)") -
        col("sb").cast("decimal(19,0)") *
          col("na").cast("decimal(10,0)")).cast("decimal(19,0)")
      a.join(b, Seq("dim")).filter(col("la") < col("lb"))
        .select(col("la"), col("lb"), col("na"), col("nb"),
          (diff * diff).as("sq"))
        .groupBy(col("la"), col("lb"))
        .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
          sum(col("sq")).cast("decimal(38,0)").cast("string")
            .as("dist2_q"))
        .orderBy(col("la"), col("lb"))
    },
    Some("""WITH comp AS (SELECT label, gs - 1 AS dim,
           |   CAST(floor(CAST(embedding[CAST(gs AS INT)] AS DOUBLE) * 1e6)
           |     AS BIGINT) AS xm
           |  FROM (SELECT label, embedding,
           |    generate_subscripts(embedding, 1) AS gs FROM embeddings)),
           |sums AS (SELECT label, dim, count(*) AS n,
           |   CAST(sum(xm) AS BIGINT) AS sm
           |  FROM comp GROUP BY 1, 2),
           |p AS (SELECT a.label AS la, b.label AS lb, a.dim,
           |   a.n AS na, b.n AS nb,
           |   CAST(CAST(a.sm AS DECIMAL(19,0)) * CAST(b.n AS DECIMAL(10,0))
           |     - CAST(b.sm AS DECIMAL(19,0)) * CAST(a.n AS DECIMAL(10,0))
           |    AS DECIMAL(19,0)) AS df
           |  FROM sums a JOIN sums b ON a.dim = b.dim AND a.label < b.label)
           |SELECT la, lb, max(na) AS n_a, max(nb) AS n_b,
           | CAST(CAST(sum(df * df) AS DECIMAL(38,0)) AS VARCHAR) AS dist2_q
           |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  private val argmaxHist = Q(
    "emb_argmax_dim_hist",
    (s, d) => Tables.embeddings(s, d)
      .select(col("label"),
        array_position(col("embedding"), array_max(col("embedding"))).as("dim"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"), col("dim")),
    Some("""SELECT label,
           | CAST(list_position(embedding, list_aggregate(embedding, 'max'))
           |   AS BIGINT) AS dim,
           | count(*) AS n
           |FROM embeddings GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Frame sampling over variable-length binary payloads (md5 repeated
    * doc_id%5+1 times → 16–80 bytes standing in for frame streams),
    * every 4th "frame" kept via the batched mapPartitions decode
    * boundary. The oracle reproduces the sampled counts arithmetically:
    * ceil(len/4) per payload.
    */
  private val mmFrames = Q(
    "mm_frame_sampling",
    (s, d) => {
      implicit val sp = s
      val media = Multimodal.synthesize(
        Tables.documents(s, d), "doc_id", "text",
        repeatTimesSql = "doc_id % 5 + 1")
      Multimodal.sampleFrameCounts(media, everyN = 4)
        .groupBy(col("format"))
        .agg(count(lit(1)).as("n"), sum(col("n_sampled")).as("sum_sampled"),
          max(col("n_sampled")).as("max_sampled"))
        .orderBy(col("format"))
    },
    Some("""WITH m AS (SELECT
           |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END
           |    AS format,
           |  16 * (doc_id % 5 + 1) AS len
           | FROM documents)
           |SELECT format, count(*) AS n,
           | CAST(sum(CAST(ceil(len / 4.0) AS BIGINT)) AS BIGINT) AS sum_sampled,
           | CAST(max(CAST(ceil(len / 4.0) AS BIGINT)) AS INT) AS max_sampled
           |FROM m GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Perceptual-hash media dedup: aHash signatures through the batched
    * decode boundary, then the shared pigeonhole hamming search. Fully
    * oracled: the synthesized payload is unhex(md5(text)) (16 bytes), so
    * DuckDB rebuilds every feature bin (hex pair → CAST(b/255.0 AS
    * FLOAT) — verified free of double-rounding for all 256 byte values),
    * the mean (EXACT in double: 16 addends of ≤24-bit mantissas, so
    * summation order cannot matter), the per-bit thresholds, and the
    * brute-force hamming pairs — independently validating the stub
    * decode, the aHash construction, AND the pigeonhole search's
    * exactness. Planted-duplicate behavior stays in MultimodalSpec.
    */
  private val mmPhash = Q(
    "mm_phash_neardup",
    (s, d) => {
      val media = Multimodal.synthesize(Tables.documents(s, d), "doc_id", "text")
      Multimodal.phashNearDup(media, maxDist = 2)
        .orderBy(col("i"), col("j"))
    },
    Some("""WITH m AS (SELECT doc_id AS media_id, md5(text) AS hx
           |  FROM documents WHERE text IS NOT NULL),
           |b AS (SELECT media_id, i,
           |   CAST(('0x' || substring(hx, 2*i+1, 2))::INT / 255.0 AS FLOAT)
           |     AS f
           |  FROM m, range(16) r(i)),
           |mn AS (SELECT media_id, sum(CAST(f AS DOUBLE)) / 64 AS mean
           |  FROM b GROUP BY 1),
           |sig AS (SELECT b.media_id, CAST(sum(CASE WHEN f > mean
           |    THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS h
           |  FROM b JOIN mn USING (media_id) GROUP BY 1),
           |p AS (SELECT a.media_id AS i, c.media_id AS j,
           |   bit_count(xor(a.h, c.h)) AS dist
           |  FROM sig a JOIN sig c ON a.media_id < c.media_id)
           |SELECT i, j, CAST(dist AS INT) AS dist FROM p
           |WHERE dist <= 2 ORDER BY i, j""".stripMargin))

  /** REAL-codec aHash, fully oracled — the query that proves
    * `javax.imageio` end-to-end: deterministic grayscale pixels derive
    * from repeat(md5(text)) (the [[Multimodal.synthesize]] convention,
    * w·h ≤ 23·19 bytes), the engine encodes them as an actual PNG with
    * the JDK encoder, decodes it back through
    * [[Multimodal.ImageCodec.aHash]]'s real decode path, and publishes
    * the 8×8 integer block-luma hash. The DuckDB oracle rebuilds the
    * hash from the hex pairs DIRECTLY — it never sees a PNG — so a
    * hash match certifies the PNG encode→decode round trip is the
    * identity on the pixels (gray PNG is lossless) AND the block/mean
    * arithmetic is the documented integer convention. The hash ships
    * as two 32-bit halves (bit 63 would wrap a BIGINT sum in the
    * oracle's 2^b reconstruction). w, h ≥ 8 so all 64 blocks are
    * non-empty in both engines.
    */
  private val mmAhashReal = Q(
    "mm_ahash_real_png",
    (s, d) => {
      import s.implicits._
      val src = Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id").cast("long").as("media_id"),
          (col("doc_id") % 16 + 8).cast("int").as("w"),
          (col("doc_id") % 12 + 8).cast("int").as("h"),
          unhex(expr("repeat(md5(text), 28)")).as("pix"))
      val hashed = src.as[(Long, Int, Int, Array[Byte])]
        .mapPartitions { rows =>
          rows.map { case (id, w, h, pix) =>
            val png = Multimodal.ImageCodec.encodeGrayPng(pix, w, h)
            val hsh = Multimodal.ImageCodec.aHash(png)
            if (hsh == null) throw new IllegalStateException(
              s"media_id=$id: JDK-encoded PNG failed to decode")
            (id, w, h, hsh.longValue)
          }
        }.toDF("media_id", "w", "h", "ahash")
      hashed.select(col("media_id"), col("w"), col("h"),
        col("ahash").bitwiseAND(lit(0xffffffffL)).as("hash_lo"),
        shiftrightunsigned(col("ahash"), 32).as("hash_hi"),
        bit_count(col("ahash")).cast("int").as("n_bits"))
        .orderBy(col("media_id"))
    },
    Some("""WITH m AS (SELECT doc_id AS media_id,
           |   CAST(doc_id % 16 + 8 AS INT) AS w,
           |   CAST(doc_id % 12 + 8 AS INT) AS h,
           |   repeat(md5(text), 28) AS hx
           |  FROM documents WHERE text IS NOT NULL),
           |px AS (SELECT media_id, w, h,
           |   ('0x' || substring(hx, 2*i+1, 2))::INT AS v,
           |   CAST(i % w AS INT) AS x, CAST(i // w AS INT) AS y
           |  FROM m, range(437) r(i) WHERE i < w*h),
           |blk AS (SELECT media_id, ((y*8) // h)*8 + (x*8) // w AS b,
           |   CAST(sum(v) AS BIGINT) AS s, count(*) AS c
           |  FROM px GROUP BY 1, 2),
           |bm AS (SELECT media_id, b, (s * 1000) // c AS bv FROM blk),
           |mn AS (SELECT media_id,
           |   CAST(sum(bv) AS BIGINT) // 64 AS mean FROM bm GROUP BY 1),
           |sig AS (SELECT bm.media_id,
           |   CAST(sum(CASE WHEN bv > mean AND b < 32
           |     THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS hash_lo,
           |   CAST(sum(CASE WHEN bv > mean AND b >= 32
           |     THEN (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END) AS BIGINT)
           |     AS hash_hi,
           |   CAST(sum(CASE WHEN bv > mean THEN 1 ELSE 0 END) AS INT) AS n_bits
           |  FROM bm JOIN mn USING (media_id) GROUP BY 1)
           |SELECT m.media_id, w, h, hash_lo, hash_hi, n_bits
           |FROM sig JOIN m ON sig.media_id = m.media_id
           |ORDER BY 1""".stripMargin))

  /** SemDeDup semantic dedup ([[Ann.semDedup]]): k-means cells bound the
    * candidate pairs, near-dups removed keep-lowest-id within each cell.
    * Cell assignments are engine-defined (k-means over engine seeds), so
    * no SQL oracle; SemDedupSpec pins the identities that hold regardless
    * of clustering — planted exact dups always removed, removals ⊆ the
    * brute-force global removal set, determinism across runs.
    */
  private val semdedup = Q(
    "dedup_semdedup_cells",
    (s, d) => Ann.semDedup(Tables.embeddings(s, d), "vec_id", "embedding",
        threshold = 0.9)
      .join(Tables.embeddings(s, d).select(col("vec_id"), col("label")), "vec_id")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("removed"), 1L).otherwise(0L)).as("n_removed"),
        count_distinct(col("cell")).as("n_cells"))
      .orderBy(col("label")),
    None)

  /** One power-method step as DuckDB CTEs: project every vector onto
    * wₖ₋₁ (explicit dim-join dot product), accumulate w′_d = Σ p·x_d,
    * normalize. Mirrors [[Ann.topComponent]]'s iteration exactly; float
    * sums differ across engines in last ulps only, which the iteration
    * contracts and the 6dp rank quantization absorbs (the PageRank
    * convention).
    */
  private def pcaStep(k: Int): String =
    s"""p$k AS (SELECT vec_id, sum(embedding[d+1] * w) AS p
       | FROM e, w${k - 1} GROUP BY 1),
       |s$k AS (SELECT d, sum(p * embedding[d+1]) AS s
       | FROM e, p$k, dims WHERE e.vec_id = p$k.vec_id GROUP BY 1),
       |n$k AS (SELECT sqrt(sum(s*s)) AS nn FROM s$k),
       |w$k AS (SELECT d, s / (SELECT nn FROM n$k) AS w FROM s$k)""".stripMargin

  /** Top principal direction via 3 distributed power iterations
    * ([[Ann.topComponent]]); output is the top-8 dimensions ranked by
    * 6dp-quantized |weight| with the canonical-sign convention — pure
    * integers, the safest cross-engine payload. The oracle unrolls the
    * same three iterations as chained CTEs (the PageRank pattern).
    */
  private val topComponent = Q(
    "emb_top_component",
    (s, d) => {
      val w = Ann.topComponent(Tables.embeddings(s, d), "embedding", iters = 3)
      val ranked = w.zipWithIndex
        .sortBy { case (x, i) => (-math.round(math.abs(x) * 1e6), i) }
        .take(8).zipWithIndex
        .map { case ((x, dimIdx), r) =>
          (r + 1, dimIdx, if (x >= 0) 1 else -1) }
        .toSeq
      import s.implicits._
      ranked.toDF("rank", "dim", "sign")
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
            |  WHERE len(embedding) > 0),
            |dims AS (SELECT CAST(unnest(generate_series(0,
            |  (SELECT max(len(embedding)) FROM e) - 1)) AS INT) AS d),
            |w0 AS (SELECT d, 1.0 / sqrt((SELECT count(*) FROM dims)) AS w
            | FROM dims),
            |${pcaStep(1)},
            |${pcaStep(2)},
            |${pcaStep(3)},
            |lead AS (SELECT CASE WHEN w < 0 THEN -1 ELSE 1 END AS sgn FROM w3
            | ORDER BY round(abs(w)*1000000) DESC, d LIMIT 1)
            |SELECT CAST(row_number() OVER
            |   (ORDER BY round(abs(w)*1000000) DESC, d) AS INT) AS rank,
            | d AS dim,
            | CAST(CASE WHEN w * (SELECT sgn FROM lead) >= 0
            |   THEN 1 ELSE -1 END AS INT) AS sign
            |FROM w3 ORDER BY 1 LIMIT 8""".stripMargin),
    headline = true)

  /** Aspect-preserving resize planning + size-bucket batching
    * ([[Multimodal.resizePlan]]): the relational half of vision
    * preprocessing — each image's integer target dims in a 224-px box
    * and its 32-px batch bucket, aggregated per (format, bucket). The
    * bucket IS the shuffle key a decode stage batches by at 100 TB
    * (same-shaped tensors per task); the byte-level path through the
    * stub codec is [[Multimodal.resizeTo]], pinned in MultimodalSpec.
    * All arithmetic is integer `div`, replayed exactly by the oracle.
    */
  private val mmResizePlan = Q(
    "mm_resize_batch_plan",
    (s, d) => {
      val media = Multimodal.synthesize(Tables.documents(s, d), "doc_id", "text")
      Multimodal.resizePlan(media)
        .groupBy(col("format"), col("bw"), col("bh"))
        .agg(count(lit(1)).as("n_images"),
          min(col("tw")).as("min_tw"), max(col("th")).as("max_th"),
          sum(col("media_id")).as("sum_ids"))
        .orderBy(col("format"), col("bw"), col("bh"))
    },
    Some("""WITH m AS (SELECT doc_id,
           |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
           |  doc_id % 64 + 1 AS width, doc_id % 48 + 1 AS height
           | FROM documents),
           |i AS (SELECT doc_id, format, width, height,
           |  greatest(width, height) AS ls FROM m
           | WHERE format IN ('png', 'jpeg')),
           |t AS (SELECT doc_id, format,
           |  (width * 224) // ls AS tw, (height * 224) // ls AS th FROM i)
           |SELECT format, CAST(tw // 32 AS INT) AS bw,
           | CAST(th // 32 AS INT) AS bh, count(*) AS n_images,
           | CAST(min(tw) AS INT) AS min_tw, CAST(max(th) AS INT) AS max_th,
           | CAST(sum(doc_id) AS BIGINT) AS sum_ids
           |FROM t GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin))

  /** Exact MEDIA dedup by payload digest — the first pass every
    * multimodal corpus runs (identical bytes are identical media
    * regardless of metadata): digest the binary column, keep-first by
    * media id within (format, digest), report the per-format
    * duplication profile incl. reclaimable bytes. The digest group-by
    * is the whole plan — one scan, one map-side-combined aggregation,
    * payloads never pairwise-compared (the [[Multimodal.phashNearDup]]
    * contract's exact sibling). The oracle rebuilds the synthesized
    * payload's identity from its CONSTRUCTION ((md5(text), repeat k) —
    * [[Multimodal.synthesize]]'s one convention) rather than digesting
    * the blob, so the compare holds on any engine whose md5-over-binary
    * support differs; payload length is 16·k bytes by construction.
    */
  private val mmPayloadDedup = Q(
    "mm_payload_exact_dedup",
    (s, d) => {
      // NULL text yields a NULL payload — "no media", excluded on both
      // sides (engine-side a NULL digest would collapse all such rows
      // into one cross-k group and drop their lengths from the reclaim
      // sum, silently diverging from the oracle's (hx, k) grouping)
      val media = Multimodal.synthesize(
        Tables.documents(s, d).filter(col("text").isNotNull),
        "doc_id", "text", "doc_id % 5 + 1")
      media
        .groupBy(col("format"), md5(col("media")).as("dg"))
        .agg(count(lit(1)).as("cnt"),
          max(length(col("media"))).as("len"),
          min(col("media_id")).as("keeper"))
        .groupBy(col("format"))
        .agg(sum(col("cnt")).as("n_media"),
          count(lit(1)).as("n_distinct"),
          sum(col("cnt") - 1).as("n_dupes"),
          sum((col("cnt") - 1) * col("len")).as("reclaim_bytes"),
          sum(col("keeper")).as("sum_keeper_ids"))
        .orderBy(col("format"))
    },
    Some("""WITH m AS (SELECT doc_id AS media_id, md5(text) AS hx,
           |  doc_id % 5 + 1 AS k,
           |  ['png', 'jpeg', 'wav'][CAST(doc_id % 3 + 1 AS INT)] AS format
           | FROM documents WHERE text IS NOT NULL),
           |g AS (SELECT format, hx, k, count(*) AS cnt,
           |  min(media_id) AS keeper
           | FROM m GROUP BY 1, 2, 3)
           |SELECT format, CAST(sum(cnt) AS BIGINT) AS n_media,
           | count(*) AS n_distinct,
           | CAST(sum(cnt - 1) AS BIGINT) AS n_dupes,
           | CAST(sum((cnt - 1) * k * 16) AS BIGINT) AS reclaim_bytes,
           | CAST(sum(keeper) AS BIGINT) AS sum_keeper_ids
           |FROM g GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Embedding-space eval-set decontamination, attribution form: every
    * corpus vector finds its nearest BENCHMARK vector (the eval set,
    * vec_id < 50 — broadcast-sized by definition, so the corpus-wide
    * pass is one broadcast join however large the corpus). Reported as
    * per-benchmark attraction counts — the "which eval items does my
    * training data crowd around" audit that embedding decontamination
    * (cf. SemDeDup's cosine gate applied corpus-vs-eval) acts on; a
    * deployment drops or downweights the attracted docs above a cosine
    * threshold. Ranking uses the house 6dp-round + id tiebreak, so the
    * float-vs-double accumulation tails can't flip the compare.
    */
  private val decontamNearest = Q(
    "emb_decontam_nearest_eval",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val bench = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("bench_id"), col("embedding").as("bv"))
      val corpus = e.filter(col("vec_id") >= 50)
        .select(col("vec_id").as("corpus_id"), col("embedding").as("cv"))
      val scored = corpus.crossJoin(broadcast(bench))
        .select(col("corpus_id"), col("bench_id"),
          round(Ann.cosine(col("cv"), col("bv")), 6).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("corpus_id"))
        .orderBy(col("c").desc, col("bench_id"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy(col("bench_id"))
        .agg(count(lit(1)).as("n_attracted"),
          sum(col("corpus_id")).as("sum_corpus_ids"))
        .orderBy(col("bench_id"))
    },
    Some("""WITH b AS (SELECT vec_id AS bench_id, embedding AS bv
           |  FROM embeddings WHERE vec_id < 50),
           |c AS (SELECT vec_id AS corpus_id, embedding AS cv
           |  FROM embeddings WHERE vec_id >= 50),
           |sc AS (SELECT corpus_id, bench_id,
           |  round(CAST(list_cosine_similarity(cv, bv) AS DOUBLE), 6) AS c
           | FROM c, b),
           |r AS (SELECT corpus_id, bench_id, row_number() OVER (
           |   PARTITION BY corpus_id ORDER BY c DESC, bench_id) AS rn
           |  FROM sc)
           |SELECT bench_id, count(*) AS n_attracted,
           | CAST(sum(corpus_id) AS BIGINT) AS sum_corpus_ids
           |FROM r WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Matryoshka-style prefix-dimension recall (Kusupati et al.,
    * NeurIPS'22 — truncate the embedding to its first d dimensions and
    * measure how much of the full-dimension top-k survives): the eval
    * that prices the "shorter vectors = cheaper ANN index" tradeoff
    * before committing an index build. Exact brute top-5 at d = 8 and
    * d = 16 joins against the full-64-d truth per query; both rankings
    * use the house 6dp-quantize + id-tiebreak convention, so the
    * compare is deterministic. Truth is Q×k = 50 rows — broadcast-sized
    * at any corpus scale (the `withRecall` monitoring shape); each
    * prefix pass is one broadcast-queries scan of the corpus, and the
    * slice happens BEFORE the cosine so the scan ships d floats, not 64.
    */
  private val matryoshka = Q(
    "emb_matryoshka_prefix_recall",
    (s, d) => {
      val k = 5 // also pinned in the oracle text below
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 10)
      def pre(df: org.apache.spark.sql.DataFrame, dim: Int) =
        df.select(col("vec_id"), slice(col("embedding"), 1, dim).as("embedding"))
      val truth = Ann.bruteTopK(e, q, "vec_id", "embedding", k)
        .select(col("query_id"), col("vec_id"), lit(1L).as("hit"))
      Seq(8, 16)
        .map { dim =>
          Ann.bruteTopK(pre(e, dim), pre(q, dim), "vec_id", "embedding", k)
            .withColumn("prefix_dim", lit(dim))
        }
        .reduce(_ unionByName _)
        .join(broadcast(truth), Seq("query_id", "vec_id"), "left_outer")
        .groupBy(col("prefix_dim"), col("query_id"))
        .agg(coalesce(sum(col("hit")), lit(0L)).as("n_hits"))
        // one integer-division expression (n·100 div k), the same formula
        // the oracle's literal arithmetic reduces to — a Scala-side
        // `lit(100L / k)` would silently TRUNCATE the multiplier for any
        // k that doesn't divide 100 and desync the published percentages
        .withColumn("recall_pct", expr(s"(n_hits * 100) div $k"))
        .orderBy(col("prefix_dim"), col("query_id"))
    },
    Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           |  WHERE vec_id < 10),
           |ft AS (SELECT qid, e.vec_id AS vid, row_number() OVER (
           |   PARTITION BY qid ORDER BY
           |    round(CAST(list_cosine_similarity(qe, e.embedding) AS DOUBLE),
           |     6) DESC, e.vec_id) AS rnk
           |  FROM q, embeddings e WHERE e.vec_id <> qid),
           |truth AS (SELECT qid, vid FROM ft WHERE rnk <= 5),
           |dims AS (SELECT unnest([8, 16]) AS prefix_dim),
           |pt AS (SELECT prefix_dim, qid, e.vec_id AS vid, row_number() OVER (
           |   PARTITION BY prefix_dim, qid ORDER BY
           |    round(CAST(list_cosine_similarity(
           |      qe[1:CAST(prefix_dim AS INT)],
           |      e.embedding[1:CAST(prefix_dim AS INT)]) AS DOUBLE), 6)
           |     DESC, e.vec_id) AS rnk
           |  FROM dims, q, embeddings e WHERE e.vec_id <> qid),
           |top AS (SELECT prefix_dim, qid, vid FROM pt WHERE rnk <= 5)
           |SELECT prefix_dim, top.qid AS query_id,
           | CAST(count(truth.vid) AS BIGINT) AS n_hits,
           | CAST(count(truth.vid) AS BIGINT) * 20 AS recall_pct
           |FROM top LEFT JOIN truth
           | ON top.qid = truth.qid AND top.vid = truth.vid
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  val qs: Seq[Q] = Seq(brute, lsh, ivf, pq, ivfPortable, lshPortable,
    pqPortable, semdedupPortable,
    embDedup, mmFeatures, mmPayloadDedup, argmaxHist,
    centroidDist, mmFrames, mmPhash, mmAhashReal, semdedup, topComponent,
    mmResizePlan, decontamNearest, matryoshka)
}
