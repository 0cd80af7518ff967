package graft.llm

import graft.{Q, QueryPack, Tables}
import graft.ops.{ConnectedComponents, Dedup}
import org.apache.spark.sql.functions._
import graft.ops.Checkpoints.StageCheckpoint

/** Deduplication queries over `documents`: exact (fingerprint), MinHash-
  * LSH near-dup (bucketed, never all-pairs), SimHash, and raw n-gram
  * Jaccard. The LSH pairs carry a FULL brute-force DuckDB oracle — at
  * verify scale the oracle can afford O(n²), the engine must not.
  */
object DedupQueries extends QueryPack {

  /** Pipeline stage boundary: the quality→exact-dedup frame feeds 3-5
    * downstream consumers (LSH band pass, candidate text fetch,
    * decontamination corpus pass, final anti-join + stats). Catalyst
    * re-evaluates the whole subplan per consumer — column pruning
    * specializes each branch, so ReuseExchange never fires (measured on
    * v2: FIVE corpus scans and TWELVE window sorts in one physical plan,
    * zero reuse). [[graft.ops.Checkpoints.stage]] pins the stage output
    * exactly once (executor-local by default; durable-FS under
    * `spark.graft.checkpoint.mode=reliable`) — the lifecycle a 100 TB
    * pipeline gets by staging each phase to storage between passes, and
    * the same tool [[graft.ops.ConnectedComponents]] uses per round.
    * Unlike `cache()` there is no unbounded corpus-sized residue: blocks
    * belong to the checkpointed RDD and are dropped when it is GC'd.
    * Callers prune to the columns downstream stages read before staging —
    * a checkpoint is a physical materialization, so Catalyst cannot prune
    * through it afterwards (measured ~10% off the v1 pipeline).
    */
  private def stage(df: org.apache.spark.sql.DataFrame) = df.stageCheckpoint()

  private val exact = Q(
    "dedup_exact_fingerprint",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      val (kept, dropped) = Dedup.keepFirst(docs, Seq(col("fp")), col("doc_id"))
      kept.agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_kept"))
        .crossJoin(dropped.agg(count(lit(1)).as("n_dropped")))
    },
    Some(s"""WITH d AS (SELECT doc_id,
            |  ${CorpusQueries.fingerprintExpr("text")} AS fp
            | FROM documents),
            |m AS (SELECT doc_id, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
            | FROM d)
            |SELECT
            | (SELECT count(*) FROM m WHERE rn = 1) AS n_kept,
            | (SELECT CAST(sum(doc_id) AS BIGINT) FROM m WHERE rn = 1) AS sum_kept,
            | (SELECT count(*) FROM m WHERE rn > 1) AS n_dropped""".stripMargin))

  private val minhash = Q(
    "dedup_minhash_lsh",
    (s, d) => MinHashLsh.nearDupPairs(
      Tables.documents(s, d), "doc_id", "text", threshold = 0.8)
      .orderBy(col("i"), col("j")),
    // ground truth: brute-force 3-shingle Jaccard over ALL pairs. The
    // engine's banded LSH (r=4, b=32) has miss probability ≈1e-15 at the
    // J≥0.8 range this data contains, so the verified outputs coincide.
    Some(s"""WITH d AS (SELECT doc_id,
            |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
            |    for i in range(1, len(w)-1)]) AS sh
            | FROM (SELECT doc_id, ${CorpusQueries.WordsExpr} AS w
            |       FROM documents)
            | WHERE len(w) >= 3),
            |p AS (SELECT a.doc_id AS i, b.doc_id AS j,
            |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jac
            | FROM d a JOIN d b ON a.doc_id < b.doc_id)
            |SELECT i, j, round(jac, 3) AS jaccard FROM p
            |WHERE jac >= 0.8 ORDER BY i, j""".stripMargin),
    headline = true)

  private val simhash = Q(
    "dedup_simhash_pairs",
    // The fingerprint is the md5-voted 60-bit SimHash
    // (Hashing.simhash), so the oracle rebuilds EVERYTHING from raw
    // text: distinct 3-gram shingles, per-bit ±1 votes over the
    // md5-60 uniform, sign → signature, brute-force hamming ≤ 3 —
    // independently validating both the fingerprints and the
    // pigeonhole bucket search's exactness. Hamming properties stay
    // pinned in NearDedupSpec.
    (s, d) => SimHash.nearPairs(Tables.documents(s, d), "doc_id", "text",
      maxDist = 3).orderBy(col("i"), col("j")),
    Some(s"""WITH d AS (SELECT doc_id,
            |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
            |    for i in range(1, len(w)-1)]) AS sh
            | FROM (SELECT doc_id, ${CorpusQueries.WordsExpr} AS w
            |       FROM documents)
            | WHERE len(w) >= 3),
            |t AS (SELECT doc_id, ('0x' || substring(md5(g), 1, 15))::BIGINT AS h
            |  FROM d, unnest(sh) u(g)),
            |bits AS (SELECT doc_id, b.j,
            |   sum(CASE WHEN ((h >> b.j) & 1) = 1 THEN 1 ELSE -1 END) AS v
            |  FROM t, range(60) b(j) GROUP BY 1, 2),
            |sig AS (SELECT doc_id, CAST(sum(CASE WHEN v > 0
            |    THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS sig
            |  FROM bits GROUP BY 1),
            |p AS (SELECT a.doc_id AS i, b.doc_id AS j,
            |   bit_count(xor(a.sig, b.sig)) AS dist
            |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
            |SELECT i, j, CAST(dist AS INT) AS dist FROM p
            |WHERE dist <= 3 ORDER BY i, j""".stripMargin))

  private val ngramJaccard = Q(
    "dedup_ngram_jaccard_adjacent",
    (s, d) => {
      val sh = Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.shingles(col("text")).as("sh"))
      sh.as("a").join(sh.as("b"), col("a.doc_id") + 1 === col("b.doc_id"))
        .select(floor(TextAnalysis.jaccard(col("a.sh"), col("b.sh")) * 20).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    },
    Some(s"""WITH d AS (SELECT doc_id,
            |  CASE WHEN len(w) < 3 THEN CAST([] AS VARCHAR[])
            |   ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
            |    for i in range(1, len(w)-1)]) END AS sh
            | FROM (SELECT doc_id, ${CorpusQueries.WordsExpr} AS w
            |       FROM documents)),
            |p AS (SELECT floor(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0
            |    THEN 0.0 ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            |    / len(list_distinct(list_concat(a.sh, b.sh))) END * 20) AS bucket
            | FROM d a JOIN d b ON a.doc_id + 1 = b.doc_id)
            |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n
            |FROM p GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Brute-force (i,j) near-dup pairs + min-reachable-label transitive
    * closure as DuckDB CTEs: the independent ground truth for the
    * connected-components queries. `WITH RECURSIVE` + UNION (set
    * semantics) terminates because the reachable-label set is finite.
    */
  private[llm] def clusterChain(from: String = "documents",
      textCol: String = "text"): String =
    s"""d AS (SELECT doc_id,
       |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |    for i in range(1, len(w)-1)]) AS sh
       | FROM (SELECT doc_id, ${CorpusQueries.wordsExpr(textCol)} AS w
       |       FROM $from)
       | WHERE len(w) >= 3),
       |p AS (SELECT a.doc_id AS i, b.doc_id AS j
       | FROM d a JOIN d b ON a.doc_id < b.doc_id
       |  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
       |sym AS (SELECT i AS u, j AS v FROM p UNION SELECT j AS u, i AS v FROM p),
       |reach(node, lbl) AS (
       | SELECT u, u FROM (SELECT DISTINCT u FROM sym) t
       | UNION
       | SELECT s.u, r.lbl FROM sym s JOIN reach r ON s.v = r.node),
       |comp AS (SELECT node, min(lbl) AS cluster FROM reach GROUP BY node)""".stripMargin

  /** Transitive near-dup CLUSTER formation: verified LSH pairs →
    * connected components → per-cluster stats. Pairs alone under-dedup
    * ((a,b),(b,c) must collapse to one cluster even when (a,c) misses the
    * 0.8 bar); this is the step that turns pair detection into an actual
    * dedup decision. Oracle: brute-force pairs + recursive-CTE transitive
    * closure — the engine's iterative min-label propagation must land on
    * identical components.
    */
  private val lshClusters = Q(
    "dedup_lsh_clusters",
    (s, d) => {
      val pairs = MinHashLsh.nearDupPairs(
        Tables.documents(s, d), "doc_id", "text", threshold = 0.8)
      ConnectedComponents.components(pairs, "i", "j")
        .groupBy(col("comp").as("cluster"))
        .agg(count(lit(1)).as("n_members"), sum(col("node")).as("sum_members"))
        .orderBy(col("cluster"))
    },
    Some(s"""WITH RECURSIVE ${clusterChain()}
            |SELECT cluster, count(*) AS n_members,
            | CAST(sum(node) AS BIGINT) AS sum_members
            |FROM comp GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** Incremental LSH index maintenance
    * ([[MinHashLsh.nearDupPairsIncremental]]): an 80% "existing corpus"
    * with its already-verified pairs absorbs the 20% "daily crawl"
    * batch — new docs' band keys join the full band index, only
    * new-member candidates verify, and the union must equal the
    * full-corpus recompute. The oracle IS that recompute (the same
    * brute-force ground truth `dedup_minhash_lsh` carries), so the
    * hash compare proves the incremental path loses nothing — the
    * `inc_agg_merge` contract applied to the dedup surface.
    */
  private val lshIncremental = Q(
    "dedup_lsh_incremental",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val old = docs.filter(col("doc_id") % 5 =!= 0)
      val fresh = docs.filter(col("doc_id") % 5 === 0)
      val oldPairs = MinHashLsh.nearDupPairs(old, "doc_id", "text", 0.8)
      MinHashLsh.nearDupPairsIncremental(old, oldPairs, fresh,
        "doc_id", "text", threshold = 0.8)
        .orderBy(col("i"), col("j"))
    },
    Some(s"""WITH d AS (SELECT doc_id,
            |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
            |    for i in range(1, len(w)-1)]) AS sh
            | FROM (SELECT doc_id, ${CorpusQueries.WordsExpr} AS w
            |       FROM documents)
            | WHERE len(w) >= 3),
            |p AS (SELECT a.doc_id AS i, b.doc_id AS j,
            |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jac
            | FROM d a JOIN d b ON a.doc_id < b.doc_id)
            |SELECT i, j, round(jac, 3) AS jaccard FROM p
            |WHERE jac >= 0.8 ORDER BY i, j""".stripMargin),
    headline = true)

  /** INCREMENTAL connected-components maintenance — the cluster-state
    * lifecycle step after [[lshIncremental]]'s pair maintenance: the
    * existing corpus's components absorb a new batch WITHOUT re-running
    * CC on the full pair set. New pairs contract onto the old component
    * labels (endpoint → its old label, or itself if previously
    * unclustered), min-label CC runs on that contracted graph — sized
    * by touched components, not by the corpus — and only touched
    * components relabel. Because old labels are component-minimum doc
    * ids and the contraction preserves connectivity, the merged labels
    * are exactly the full recompute's labels; the oracle IS the full
    * recompute (same recursive-CTE closure as `dedup_lsh_clusters`).
    * At 100 TB this is the difference between a daily CC over the
    * whole corpus and one over the day's delta.
    */
  private val ccIncremental = Q(
    "dedup_cc_incremental",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val old = docs.filter(col("doc_id") % 5 =!= 0)
      val fresh = docs.filter(col("doc_id") % 5 === 0)
      val oldPairs = MinHashLsh.nearDupPairs(old, "doc_id", "text", 0.8)
        .stageCheckpoint()
      val oldComp = ConnectedComponents.components(oldPairs, "i", "j")
        .stageCheckpoint()
      val newPairs = MinHashLsh.nearDupPairsIncremental(old, oldPairs,
          fresh, "doc_id", "text", threshold = 0.8)
        .select(col("i"), col("j")).stageCheckpoint()
      val contracted = newPairs
        .join(oldComp.select(col("node").as("i"), col("comp").as("ci")),
          Seq("i"), "left")
        .join(oldComp.select(col("node").as("j"), col("comp").as("cj")),
          Seq("j"), "left")
        .select(coalesce(col("ci"), col("i")).as("a"),
          coalesce(col("cj"), col("j")).as("b"))
        .filter(col("a") =!= col("b"))
      val merged = ConnectedComponents.components(contracted, "a", "b")
      val newNodes = newPairs
        .select(explode(array(col("i"), col("j"))).as("node")).distinct()
        .join(oldComp.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), col("node").as("base"))
      val base = oldComp.select(col("node"), col("comp").as("base"))
        .unionByName(newNodes)
      base
        .join(merged.select(col("node").as("base"), col("comp").as("fin")),
          Seq("base"), "left")
        .select(col("node"), coalesce(col("fin"), col("base")).as("cluster"))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_members"), sum(col("node")).as("sum_members"))
        .orderBy(col("cluster"))
    },
    Some(s"""WITH RECURSIVE ${clusterChain()}
            |SELECT cluster, count(*) AS n_members,
            | CAST(sum(node) AS BIGINT) AS sum_members
            |FROM comp GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** Cluster-SIZE distribution — the duplication-profile report a
    * corpus audit publishes (how much of the duplication is pairs vs
    * deep piles; the pile tail is what decides whether near-dedup pays
    * for itself). One extra |clusters|-sized aggregation over the same
    * CC output; dedup savings = Σ (size−1) members drop.
    */
  private val clusterSizeHist = Q(
    "dedup_cluster_size_hist",
    (s, d) => {
      val pairs = MinHashLsh.nearDupPairs(
        Tables.documents(s, d), "doc_id", "text", threshold = 0.8)
      ConnectedComponents.components(pairs, "i", "j")
        .groupBy(col("comp"))
        .agg(count(lit(1)).as("size"))
        .groupBy(col("size"))
        .agg(count(lit(1)).as("n_clusters"),
          (sum(col("size")) - count(lit(1))).as("n_droppable"))
        .orderBy(col("size"))
    },
    Some(s"""WITH RECURSIVE ${clusterChain()},
            |cs AS (SELECT cluster, count(*) AS size FROM comp GROUP BY 1)
            |SELECT size, count(*) AS n_clusters,
            | CAST(sum(size) - count(*) AS BIGINT) AS n_droppable
            |FROM cs GROUP BY 1 ORDER BY 1""".stripMargin))

  /** The dedup decision the clusters exist for: keep each cluster's
    * min-id representative, drop the rest, count the surviving corpus.
    * Cluster members beyond the representative are the ONLY rows dropped
    * — singleton docs never enter the edge list and survive untouched.
    */
  private val clusterSurvivors = Q(
    "dedup_cluster_survivors",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = MinHashLsh.nearDupPairs(docs, "doc_id", "text", threshold = 0.8)
      val drops = ConnectedComponents.components(pairs, "i", "j")
        .filter(col("node") =!= col("comp"))
        .select(col("node").as("doc_id"))
      docs.join(drops, Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_kept"))
    },
    Some(s"""WITH RECURSIVE ${clusterChain()}
            |SELECT count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS sum_kept
            |FROM documents
            |WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> cluster)""".stripMargin))

  /** Quality-aware cluster survivor selection: instead of the min-id
    * representative, each near-dup cluster keeps its argmax-quality
    * member (token count desc, doc_id tiebreak) — the curation policy
    * real pipelines use, since the longest variant usually carries the
    * least truncation. The argmax is one `max(struct)` per component
    * (partial-aggregates map-side; no window over members), and the
    * integral token count keeps the cross-engine compare exact.
    * sum_kept pins the surviving SET — a different survivor choice than
    * the oracle's cannot slip through as a matching count.
    */
  private val clusterBestSurvivors = Q(
    "dedup_cluster_best_survivors",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("tc", TextAnalysis.tokenCount(col("text")).cast("long"))
      val pairs = MinHashLsh.nearDupPairs(docs, "doc_id", "text", threshold = 0.8)
      val members = ConnectedComponents.components(pairs, "i", "j")
        .join(docs.select(col("doc_id").as("node"), col("tc")), Seq("node"))
      val drops = members
        .groupBy(col("comp"))
        .agg(max(struct(col("tc"), (-col("node")).as("neg"))).as("b"))
        .select(col("comp"), (-col("b.neg")).as("keep_id"))
        .join(members, Seq("comp"))
        .filter(col("node") =!= col("keep_id"))
        .select(col("node").as("doc_id"))
      docs.join(drops, Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_kept"),
          sum(col("tc")).as("sum_tc_kept"))
    },
    Some(s"""WITH RECURSIVE ${clusterChain()},
            |t AS (SELECT doc_id,
            |  CASE WHEN length(regexp_replace(text, '\\s', '', 'g')) = 0 THEN 0
            |   ELSE len(string_split_regex(trim(text), '\\s+')) END AS tc
            | FROM documents),
            |m AS (SELECT c.node, c.cluster, t.tc FROM comp c
            | JOIN t ON t.doc_id = c.node),
            |k AS (SELECT node, row_number() OVER (PARTITION BY cluster
            |   ORDER BY tc DESC, node) AS rn FROM m),
            |drops AS (SELECT node FROM k WHERE rn > 1)
            |SELECT count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS sum_kept,
            | CAST(sum(tc) AS BIGINT) AS sum_tc_kept
            |FROM t WHERE doc_id NOT IN (SELECT node FROM drops)""".stripMargin))

  /** The round-4 flagship: the curation pipeline with TRANSITIVE dedup —
    * quality gate → exact-fingerprint keep-first → MinHash-LSH pairs →
    * connected components → keep each cluster's min-id representative →
    * sequence-packing geometry of the surviving corpus per language.
    * Upgrades the pairwise drop-the-j rule of `docs_training_pipeline`:
    * (a,b),(b,c) chains now collapse to ONE representative even when
    * (a,c) misses the 0.8 bar. The oracle rebuilds every stage
    * independently (brute-force pairs + recursive-CTE closure where the
    * engine is banded + iterative); sum_ids pins the exact surviving
    * document SET, not just its size.
    */
  private val trainingV3 = Q(
    "docs_training_pipeline_v3",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // the token count feeds the quality gate AND the final stats:
      // computed once, carried through the checkpoint, never re-tokenized
      val quality = docs
        .withColumn("tc", TextAnalysis.tokenCount(col("text")))
        .filter(col("tc") >= 20 &&
          TextAnalysis.alphaRatio(col("text")) >= 0.5)
      val (exactDedup, _) = Dedup.keepFirst(
        quality.withColumn("fp", TextAnalysis.fingerprint(col("text"))),
        Seq(col("fp")), col("doc_id"))
      val exactKept = stage(
        exactDedup.select(col("doc_id"), col("lang"), col("text"), col("tc")))
      val pairs = MinHashLsh.nearDupPairs(exactKept, "doc_id", "text", 0.8)
      val drops = ConnectedComponents.components(pairs, "i", "j")
        .filter(col("node") =!= col("comp"))
        .select(col("node").as("doc_id"))
      val deduped = exactKept.join(drops, Seq("doc_id"), "left_anti")
      deduped
        .select(col("doc_id"), col("lang"), col("tc").cast("long").as("tok"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_ids"),
          sum(col("tok")).as("total_tokens"),
          floor((sum(col("tok")) + lit(511)) / lit(512)).as("n_windows"))
        .orderBy(col("lang"))
    },
    Some(s"""WITH RECURSIVE q AS (SELECT * FROM documents
            | WHERE ${CorpusQueries.qualityPredSql("text", 20, 0.5)}),
            |e AS (SELECT * FROM (SELECT *, row_number() OVER (
            |   PARTITION BY ${CorpusQueries.fingerprintExpr("text")}
            |   ORDER BY doc_id) AS rn FROM q) WHERE rn = 1),
            |${clusterChain(from = "e")},
            |dd AS (SELECT * FROM e WHERE doc_id NOT IN
            |  (SELECT node FROM comp WHERE node <> cluster)),
            |t AS (SELECT doc_id, lang,
            |  CASE WHEN length(regexp_replace(text, '\\s', '', 'g')) = 0 THEN 0
            |   ELSE len(string_split_regex(trim(text), '\\s+')) END AS tok
            | FROM dd)
            |SELECT lang, count(*) AS n_docs,
            | CAST(sum(doc_id) AS BIGINT) AS sum_ids,
            | CAST(sum(tok) AS BIGINT) AS total_tokens,
            | CAST(floor((sum(tok) + 511) / 512.0) AS BIGINT) AS n_windows
            |FROM t GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** The composite a training-data team actually runs, end-to-end with a
    * FULL independent oracle: quality filter → exact-fingerprint dedup
    * (keep-first) → near-dup removal (drop the j of every verified
    * MinHash-LSH pair) → per-language corpus stats. Every stage is
    * deterministic, so the DuckDB reimplementation (brute-force where the
    * engine is bucketed) must agree bit-for-bit.
    */
  private val trainingPipeline = Q(
    "docs_training_pipeline",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // the token count feeds the quality gate AND the final stats:
      // computed once, carried through the checkpoint, never re-tokenized
      val quality = docs
        .withColumn("tc", TextAnalysis.tokenCount(col("text")))
        .filter(col("tc") >= 20 &&
          TextAnalysis.alphaRatio(col("text")) >= 0.5)
      val (exactDedup, _) = Dedup.keepFirst(
        quality.withColumn("fp", TextAnalysis.fingerprint(col("text"))),
        Seq(col("fp")), col("doc_id"))
      val exactKept = stage(
        exactDedup.select(col("doc_id"), col("lang"), col("text"), col("tc")))
      val pairs = MinHashLsh.nearDupPairs(exactKept, "doc_id", "text", 0.8)
      val survivors = exactKept.join(
        pairs.select(col("j").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      survivors.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("tc")).as("sum_tokens"))
        .orderBy(col("lang"))
    },
    Some(s"""WITH q AS (SELECT * FROM documents
            | WHERE ${CorpusQueries.qualityPredSql("text", 20, 0.5)}),
            |e AS (SELECT * FROM (SELECT *, row_number() OVER (
            |   PARTITION BY ${CorpusQueries.fingerprintExpr("text")}
            |   ORDER BY doc_id) AS rn FROM q) WHERE rn = 1),
            |${CorpusQueries.shinglePairsChain("e", "text", 0.8)},
            |s AS (SELECT * FROM e WHERE doc_id NOT IN (SELECT j FROM prs))
            |SELECT lang, count(*) AS n,
            | CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS sum_tokens
            |FROM s GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** The round-3 flagship: the full curation pipeline a training-data
    * team runs, composing EVERY corpus operator class — PII scrub →
    * quality gate (length, alpha ratio, repetition) → exact-fingerprint
    * dedup → MinHash-LSH near-dup removal → winnowing decontamination
    * against a benchmark set (doc_id < 50 stands in for the eval set and
    * is excluded from the corpus) → per-language stats. Deterministic at
    * every stage, so the independent DuckDB rebuild (brute-force where
    * the engine is bucketed/broadcast) must agree bit-for-bit.
    */
  private val trainingV2 = Q(
    "docs_training_pipeline_v2",
    (s, d) => {
      val docs = Tables.documents(s, d)
      def scrub(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"), col("lang"),
          TextAnalysis.scrubPii(col("text")).as("text2"))
      val corpus = scrub(docs.filter(col("doc_id") >= 50))
      val bench = scrub(docs.filter(col("doc_id") < 50))
      // token count computed once for gate + stats (the v1 convention)
      val quality = corpus
        .withColumn("tc", TextAnalysis.tokenCount(col("text2")))
        .filter(col("tc") >= 20 &&
          TextAnalysis.alphaRatio(col("text2")) >= 0.5 &&
          TextAnalysis.repetitionRatio(col("text2")) <= 0.5)
      val (exactDedup, _) = Dedup.keepFirst(
        quality.withColumn("fp", TextAnalysis.fingerprint(col("text2"))),
        Seq(col("fp")), col("doc_id"))
      val exactKept = stage(
        exactDedup.select(col("doc_id"), col("lang"), col("text2"), col("tc")))
      val pairs = MinHashLsh.nearDupPairs(exactKept, "doc_id", "text2", 0.8)
      // decontamination is a per-doc predicate (doc vs the broadcast
      // benchmark fingerprint set), so running it on exactKept instead of
      // the near-dup-survivor frame changes nothing semantically
      // (contaminated(deduped) = contaminated(exactKept) ∩ deduped) but
      // lets ONE anti-join against a unioned drop-list finish the
      // pipeline — the chained anti-join formulation re-evaluated the
      // entire LSH stage once per downstream consumer
      val contaminated = Winnowing.contaminated(
        exactKept, bench, "doc_id", "text2", minShared = 2)
      val dropIds = pairs.select(col("j").as("doc_id"))
        .union(contaminated.select(col("id").as("doc_id")))
        .distinct()
      val clean = exactKept.join(dropIds, Seq("doc_id"), "left_anti")
      clean.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("tc")).as("sum_tokens"))
        .orderBy(col("lang"))
    },
    Some(s"""WITH sc AS (SELECT doc_id, lang,
            |   ${CorpusQueries.scrubExpr("text")} AS text2 FROM documents),
            |q0 AS (SELECT sc.*, ${CorpusQueries.wordsExpr("text2")} AS w2
            |  FROM sc WHERE doc_id >= 50),
            |q AS (SELECT doc_id, lang, text2 FROM q0
            |  WHERE ${CorpusQueries.qualityPredSql("text2", 20, 0.5)}
            |    AND (CASE WHEN greatest(len(w2) - 1, 0) <= 0 THEN 0.0
            |     ELSE 1.0 - CAST(CASE WHEN len(w2) < 2 THEN 0
            |       ELSE len(list_distinct([w2[i] || ' ' || w2[i+1]
            |         for i in range(1, len(w2))])) END AS DOUBLE)
            |       / greatest(len(w2) - 1, 0) END) <= 0.5),
            |e AS (SELECT * FROM (SELECT q.*, row_number() OVER (
            |   PARTITION BY ${CorpusQueries.fingerprintExpr("text2")}
            |   ORDER BY doc_id) AS rn FROM q) WHERE rn = 1),
            |${CorpusQueries.shinglePairsChain("e", "text2", 0.8)},
            |dd AS (SELECT * FROM e WHERE doc_id NOT IN (SELECT j FROM prs)),
            |${CorpusQueries.winnowChain("doc_id", "dd", "text2", "c")},
            |${CorpusQueries.winnowChain("doc_id",
                 "(SELECT * FROM sc WHERE doc_id < 50)", "text2", "b")},
            |bfp AS (SELECT DISTINCT fp FROM bu),
            |cont AS (SELECT cu.doc_id FROM cu JOIN bfp USING (fp)
            |  GROUP BY 1 HAVING count(*) >= 2),
            |fin AS (SELECT * FROM dd
            |  WHERE doc_id NOT IN (SELECT doc_id FROM cont))
            |SELECT lang, count(*) AS n,
            | CAST(sum(len(string_split_regex(trim(text2), '\\s+'))) AS BIGINT)
            |   AS sum_tokens
            |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** EXACT set-similarity self-join via prefix filtering (AllPairs /
    * PPJoin family, Bayardo et al. WWW'07) — the deterministic
    * complement to MinHash-LSH: zero false negatives by construction,
    * no hash functions, fully relational. The filter lemma: sort every
    * doc's shingles by one global total order (ascending document
    * frequency, md5 tiebreak — rare-first minimizes collisions and md5
    * sidesteps cross-engine string collation); if J(A,B) ≥ θ the two
    * prefixes of length |X| − ceil(θ·|X|) + 1 must share a shingle, so
    * only prefix-colliding pairs are verified. Verification is integer-
    * exact: 10·|A∩B| ≥ 8·|A∪B| — no FP thresholds anywhere. Same θ=0.8
    * ground truth as `dedup_minhash_lsh`, computed by a disjoint
    * algorithm — the two queries cross-validate (PrefixJoinSpec pins
    * pair-set equality). Scale shape: DF is one map-side-combined agg,
    * prefixes shuffle by shingle (rare shingles → tiny buckets), the
    * quadratic step only ever sees prefix-bucket collisions.
    */
  /** Prefix-filter candidate generation at Jaccard threshold tau10/10
    * — the full AllPairs/PPJoin candidate machinery (Bayardo WWW'07,
    * Xiao WWW'08), shared by [[prefixJoin]] (τ = 0.8) and
    * [[thresholdSweep]] (τ = 0.5) so the prefix-length arithmetic
    * lives once:
    *
    *  - Global token order: df-ascending, md5 tiebreak (rare-first
    *    minimizes collisions; md5 sidesteps cross-engine collation).
    *  - ASYMMETRIC prefixes (r10): each unordered pair joins with its
    *    SMALLER-set member (ties: smaller id) as the probe. J ≥ τ with
    *    n_b ≥ n_a forces I ≥ ⌈2τ/(1+τ)·n_a⌉ =: α_a (from
    *    I ≥ τ/(1+τ)·(n_a+n_b)) AND I ≥ ⌈τ·n_b⌉ =: α_b (from U ≥ n_b),
    *    and the globally-first shared token must sit within BOTH the
    *    probe prefix (first n_a − α_a + 1) and the index prefix (first
    *    n_b − α_b + 1) — were it deeper, fewer than α shared tokens
    *    could remain. At τ = 0.8 the probe keeps ~n/9 + 1 instead of
    *    the symmetric ~n/5 + 1; at τ = 0.5, ~n/3 + 1 instead of
    *    ~n/2 + 1 — the collision workload drops proportionally.
    *  - Size-compatibility filter in the join: I ≤ n_a and I ≥ τ·n_b
    *    force n_a·10 ≥ n_b·tau10 — size-incompatible pairs never
    *    reach the distinct.
    *
    * Zero false negatives end-to-end (every step above is an exact
    * implication of J ≥ τ); PrefixJoinSpec pins pair-set equality with
    * the MinHash path and the all-pairs oracles would surface any miss.
    *
    * `smj` ([[graft.ops.JoinGate.textDedupSmj]], decided by the caller
    * from the docs scan's on-disk bytes): above the decade gate the
    * df/size side tables carry `shuffle_merge` hints — the measured
    * 4×-cheaper plan there — while bench-SF plans keep AQE's broadcasts.
    */
  private def prefixCandidates(sh: org.apache.spark.sql.DataFrame,
      n: org.apache.spark.sql.DataFrame,
      tau10: Int,
      smj: Boolean): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dfreq = graft.ops.JoinGate.sideTable(
      sh.groupBy(col("token")).agg(count(lit(1)).as("df")), smj)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), md5(col("token")))
    val ranked = sh.join(dfreq, "token")
      .join(graft.ops.JoinGate.sideTable(n, smj), "doc_id")
      .withColumn("rn", row_number().over(w))
    val index = ranked
      .filter(col("rn") <= col("n") - expr(s"(n * $tau10 + 9) div 10") + 1)
      .select(col("doc_id"), col("token"), col("n"))
    val probe = ranked
      .filter(col("rn") <= col("n") -
        expr(s"(n * ${2 * tau10} + ${10 + tau10} - 1) div ${10 + tau10}") + 1)
      .select(col("doc_id"), col("token"), col("n"))
    probe.as("a")
      .join(index.as("b"),
        col("a.token") === col("b.token") &&
          (col("a.n") < col("b.n") ||
            (col("a.n") === col("b.n") && col("a.doc_id") < col("b.doc_id"))) &&
          col("a.n") * 10 >= col("b.n") * tau10)
      .select(least(col("a.doc_id"), col("b.doc_id")).as("i"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("j"))
      .distinct()
  }

  private val prefixJoin = Q(
    "dedup_prefix_filter_join",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // decade-scale gate, decided from the docs scan's on-disk bytes
      // at plan-build time (JoinGate: the r13 4× AQE-broadcast
      // pessimization, now structural instead of a session knob)
      val smj = graft.ops.JoinGate.textDedupSmj(docs)
      val sh = docs.select(col("doc_id"),
          explode(TextAnalysis.shingles(col("text"))).as("token"))
      val n = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val cand = prefixCandidates(sh, n, tau10 = 8, smj = smj)
      val inter = cand
        .join(sh.select(col("doc_id").as("i"), col("token")), "i")
        .join(sh.select(col("doc_id").as("j"), col("token")), Seq("j", "token"))
        .groupBy(col("i"), col("j")).agg(count(lit(1)).as("inter"))
      inter
        .join(graft.ops.JoinGate.sideTable(
          n.select(col("doc_id").as("i"), col("n").as("n_i")), smj), "i")
        .join(graft.ops.JoinGate.sideTable(
          n.select(col("doc_id").as("j"), col("n").as("n_j")), smj), "j")
        .withColumn("un", col("n_i") + col("n_j") - col("inter"))
        .filter(col("inter") * 10 >= col("un") * 8)
        .select(col("i"), col("j"), col("inter"), col("un"))
        .orderBy(col("i"), col("j"))
    },
    // the oracle needs no prefix filter — at verify scale it can afford
    // the all-pairs intersection; same integer-exact threshold
    Some(s"""WITH d AS (SELECT doc_id,
            |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
            |    for i in range(1, len(w)-1)]) AS sh
            | FROM (SELECT doc_id, ${CorpusQueries.WordsExpr} AS w
            |       FROM documents)
            | WHERE len(w) >= 3),
            |p AS (SELECT a.doc_id AS i, b.doc_id AS j,
            |  len(list_intersect(a.sh, b.sh)) AS inter,
            |  len(list_distinct(list_concat(a.sh, b.sh))) AS un
            | FROM d a JOIN d b ON a.doc_id < b.doc_id)
            |SELECT i, j, CAST(inter AS BIGINT) AS inter, CAST(un AS BIGINT) AS un
            |FROM p WHERE inter * 10 >= un * 8 ORDER BY i, j""".stripMargin),
    headline = true)

  /** The round-5 flagship: paragraph-granular curation. Quality gate →
    * paragraph-level global keep-first dedup (docs keep a strict
    * majority of their 10-token chunks or drop — the C4-style
    * boilerplate filter) → transitive near-dup clusters keeping each
    * cluster's argmax-quality member → deterministic md5 shard layout
    * with per-shard token budgets. Composes the round's new operators
    * into the end-to-end shape a training-data run actually ships:
    * every stage boundary is a `localCheckpoint` (band/chunk fan-outs
    * never re-plan), and the oracle rebuilds all four stages
    * independently — chunk comprehension, brute-force pairwise Jaccard,
    * recursive-CTE closure, argmax window — sharing no engine code.
    * sum_ids per shard pins the exact surviving document set AND its
    * placement.
    */
  private val trainingV4 = Q(
    "docs_training_pipeline_v4",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val quality = Tables.documents(s, d)
        .withColumn("tc", TextAnalysis.tokenCount(col("text")).cast("long"))
        .filter(col("tc") >= 20 && TextAnalysis.alphaRatio(col("text")) >= 0.5)
      val paras = quality
        .select(col("doc_id"),
          posexplode(TextAnalysis.chunkByTokens(col("text"), 10))
            .as(Seq("idx", "chunk")))
        .withColumn("fp", md5(col("chunk")))
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"), col("idx"))
      val majorityKept = paras
        .withColumn("rn", row_number().over(w))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"))
        .filter(col("n_kept") * 2 > col("n_chunks"))
        .select(col("doc_id"))
      val survivors = stage(quality.join(majorityKept, Seq("doc_id"))
        .select(col("doc_id"), col("text"), col("tc")))
      val pairs = MinHashLsh.nearDupPairs(survivors, "doc_id", "text", 0.8)
      val members = ConnectedComponents.components(pairs, "i", "j")
        .join(survivors.select(col("doc_id").as("node"), col("tc")), Seq("node"))
      val drops = members
        .groupBy(col("comp"))
        .agg(max(struct(col("tc"), (-col("node")).as("neg"))).as("b"))
        .select(col("comp"), (-col("b.neg")).as("keep_id"))
        .join(members, Seq("comp"))
        .filter(col("node") =!= col("keep_id"))
        .select(col("node").as("doc_id"))
      survivors.join(drops, Seq("doc_id"), "left_anti")
        .withColumn("shard",
          conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("long") % 4)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tc")).as("sum_tokens"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("shard"))
    },
    Some(s"""WITH RECURSIVE q AS (SELECT doc_id, text,
            |  CASE WHEN length(regexp_replace(text, '\\s', '', 'g')) = 0 THEN 0
            |   ELSE len(string_split_regex(trim(text), '\\s+')) END AS tc
            | FROM documents
            | WHERE ${CorpusQueries.qualityPredSql("text", 20, 0.5)}),
            |t AS (SELECT doc_id, ${CorpusQueries.WordsExpr} AS w FROM q),
            |c AS (SELECT doc_id, i AS idx,
            |  array_to_string(w[(i-1)*10+1 : least(i*10, len(w))], ' ') AS chunk
            | FROM t, UNNEST(range(1, CAST(ceil(len(w)/10.0) AS BIGINT)+1)) AS u(i)),
            |k AS (SELECT doc_id, row_number() OVER (PARTITION BY md5(chunk)
            |   ORDER BY doc_id, idx) AS rn FROM c),
            |pd AS (SELECT doc_id, count(*) AS n_chunks,
            |   sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_kept
            |  FROM k GROUP BY 1),
            |s1 AS (SELECT q.doc_id, q.text, q.tc FROM q
            |  JOIN pd ON q.doc_id = pd.doc_id WHERE pd.n_kept * 2 > pd.n_chunks),
            |${clusterChain(from = "s1")},
            |m AS (SELECT cc.node, cc.cluster, s.tc FROM comp cc
            |  JOIN s1 s ON s.doc_id = cc.node),
            |kk AS (SELECT node, row_number() OVER (PARTITION BY cluster
            |   ORDER BY tc DESC, node) AS rn FROM m),
            |drops AS (SELECT node FROM kk WHERE rn > 1),
            |cur AS (SELECT * FROM s1
            |  WHERE doc_id NOT IN (SELECT node FROM drops))
            |SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            |   % 4 AS shard,
            | count(*) AS n_docs, CAST(sum(tc) AS BIGINT) AS sum_tokens,
            | CAST(sum(doc_id) AS BIGINT) AS sum_ids
            |FROM cur GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** Exact repeated-span coverage ([[NearDedup.RepeatedSpans]], the
    * Lee et al. ACL'22 exact-substring dedup family): per document, the
    * 8-gram windows that occur more than once corpus-wide and the word
    * positions they cover. The oracle rebuilds positional gram hashes
    * with the shared words/md5 convention ([[CorpusQueries.wordsExpr]] +
    * zipped unnest), flags fps with count>1, and unions covered
    * positions per doc — an independent derivation of the same spans.
    */
  private val repeatedSpans = Q(
    "dedup_repeated_spans",
    (s, d) => RepeatedSpans.coverage(
        Tables.documents(s, d), "doc_id", "text", n = 8)
      .orderBy(col("doc_id")),
    Some(s"""WITH t AS (SELECT doc_id, ${CorpusQueries.WordsExpr} AS w
            |  FROM documents),
            |g AS (SELECT doc_id, len(w) AS n_tokens,
            |  CASE WHEN len(w) < 8 THEN CAST([] AS VARCHAR[])
            |   ELSE [substring(md5(array_to_string(w[i:i+7], ' ')), 1, 16)
            |         for i in range(1, len(w) - 6)] END AS h
            |  FROM t),
            |u AS (SELECT doc_id, unnest(h) AS fp,
            |  unnest(range(1, len(h) + 1)) AS pos FROM g),
            |r AS (SELECT fp FROM u GROUP BY fp HAVING count(*) > 1),
            |f AS (SELECT u.doc_id, u.pos FROM u JOIN r USING (fp)),
            |c AS (SELECT doc_id, pos, unnest(range(pos, pos + 8)) AS cv
            |  FROM f)
            |SELECT c.doc_id, CAST(max(g.n_tokens) AS BIGINT) AS n_tokens,
            | count(DISTINCT c.pos) AS n_rep_windows,
            | count(DISTINCT c.cv) AS n_rep_tokens
            |FROM c JOIN g ON c.doc_id = g.doc_id
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** The round-6 flagship: MODEL-quality curation. Quality gate →
    * 5-gram contamination-FRACTION gate against the benchmark (the
    * GPT-3/PaLM metric, ≥10% overlap drops) → bigram-LM perplexity gate
    * (fit on the decontaminated corpus itself, the 10 most-surprising
    * docs drop — the CCNet shape) → exact-fingerprint dedup → per-lang
    * rollup with `sum_ids` pinning the exact surviving set. Composes
    * the round's contamination + perplexity operators into the
    * end-to-end curation run; stage boundaries checkpoint (the corpus
    * feeds the gram pass, the LM fit, the bigram scoring, and the
    * final rollup — without staging each consumer re-plans the whole
    * upstream). The LM gate's top-10 plans as TakeOrderedAndProject
    * over integer scores — no global sort, no FP ordering. The oracle
    * rebuilds every stage independently in DuckDB (list-comprehension
    * 5-grams, its own LM fit over the surviving corpus, window-rank
    * top-10, fingerprint keep-first).
    */
  private val trainingV5 = Q(
    "docs_training_pipeline_v5",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val q = docs
        .withColumn("tc", TextAnalysis.tokenCount(col("text")).cast("long"))
        .filter(col("tc") >= 10 && TextAnalysis.alphaRatio(col("text")) >= 0.5)
      val corpus0 = stage(q.filter(col("doc_id") >= 50)
        .select(col("doc_id"), col("text"), col("lang"), col("tc")))
      def gramFps(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"),
          explode(TextAnalysis.shingles(col("text"), 5)).as("g"))
        .select(col("doc_id"), substring(md5(col("g")), 1, 16).as("fp"))
      val benchFps = gramFps(docs.filter(col("doc_id") < 50))
        .select(col("fp")).distinct().withColumn("hit", lit(1))
      val flagged = gramFps(corpus0)
        .join(broadcast(benchFps), Seq("fp"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
        .filter(expr("n_hit * 10000 div n_grams") >= 1000)
        .select(col("doc_id"))
      val corpus1 = stage(corpus0.join(flagged, Seq("doc_id"), "left_anti"))
      val worst = CorpusQueries.bigramNllScores(corpus1)
        .orderBy(col("avg_nll_micro").desc, col("doc_id"))
        .limit(10).select(col("doc_id"))
      val corpus2 = corpus1.join(worst, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("tc"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      corpus2.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tc")).as("sum_tokens"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("lang"))
    },
    Some(s"""WITH q AS (SELECT doc_id, text, lang,
            |  CASE WHEN length(regexp_replace(text, '\\s', '', 'g')) = 0 THEN 0
            |   ELSE len(string_split_regex(trim(text), '\\s+')) END AS tc
            | FROM documents
            | WHERE ${CorpusQueries.qualityPredSql("text", 10, 0.5)}),
            |c0 AS (SELECT doc_id, text, lang, tc FROM q WHERE doc_id >= 50),
            |bt AS (SELECT doc_id, ${CorpusQueries.WordsExpr} AS w
            |  FROM documents WHERE doc_id < 50),
            |bg5 AS (SELECT unnest(list_distinct(
            |   [w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
            |    for i in range(1, len(w)-3)])) AS gram
            |  FROM bt WHERE len(w) >= 5),
            |bf AS (SELECT DISTINCT substring(md5(gram), 1, 16) AS fp FROM bg5),
            |ct AS (SELECT doc_id, ${CorpusQueries.WordsExpr} AS w FROM c0),
            |cg AS (SELECT doc_id, unnest(list_distinct(
            |   [w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
            |    for i in range(1, len(w)-3)])) AS gram
            |  FROM ct WHERE len(w) >= 5),
            |cf AS (SELECT doc_id, substring(md5(gram), 1, 16) AS fp FROM cg),
            |flag AS (SELECT cf.doc_id FROM cf LEFT JOIN bf ON cf.fp = bf.fp
            |  GROUP BY 1 HAVING (count(bf.fp) * 10000) // count(*) >= 1000),
            |c1 AS (SELECT * FROM c0
            |  WHERE doc_id NOT IN (SELECT doc_id FROM flag)),
            |t1 AS (SELECT doc_id, ${CorpusQueries.WordsExpr} AS w FROM c1),
            |tok AS (SELECT unnest(w) AS tok FROM t1),
            |c1c AS (SELECT tok AS w1, count(*) AS c1 FROM tok GROUP BY 1),
            |vv AS (SELECT count(DISTINCT tok) AS v FROM tok),
            |bgs AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
            |    for i in range(1, len(w))]) AS bg
            |  FROM t1 WHERE len(w) >= 2),
            |c2c AS (SELECT bg, count(*) AS n2 FROM bgs GROUP BY 1),
            |nll AS (SELECT c2c.bg, CAST(round((ln(c1c.c1 + vv.v)
            |    - ln(c2c.n2 + 1.0)) * 1e6) AS BIGINT) AS nm
            |  FROM c2c JOIN c1c ON c1c.w1 = string_split(c2c.bg, ' ')[1]
            |  CROSS JOIN vv),
            |dbg AS (SELECT doc_id, bg, count(*) AS k FROM bgs GROUP BY 1, 2),
            |scs AS (SELECT doc_id, sum(k) AS nb, sum(k * nm) AS sm
            |  FROM dbg JOIN nll USING (bg) GROUP BY 1),
            |worst AS (SELECT doc_id FROM (SELECT doc_id, row_number() OVER (
            |   ORDER BY CAST(sm AS BIGINT) // CAST(nb AS BIGINT) DESC, doc_id)
            |     AS rn FROM scs) WHERE rn <= 10),
            |c2 AS (SELECT doc_id, lang, tc,
            |   ${CorpusQueries.fingerprintExpr("text")} AS fp
            |  FROM c1 WHERE doc_id NOT IN (SELECT doc_id FROM worst)),
            |kept AS (SELECT doc_id, lang, tc FROM (SELECT doc_id, lang, tc,
            |   row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
            |  FROM c2) WHERE rn = 1)
            |SELECT lang, count(*) AS n_docs,
            | CAST(sum(tc) AS BIGINT) AS sum_tokens,
            | CAST(sum(doc_id) AS BIGINT) AS sum_ids
            |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** Directional CONTAINMENT-similarity self-join: report (i, j) where
    * at least 80% of doc i's shingle set appears in doc j —
    * C(A,B) = |A∩B| / |A| ≥ 0.8. Jaccard misses these when |B| ≫ |A|
    * (a paragraph quoted inside a long page scores near-zero Jaccard
    * but full containment), and quotation/subset extraction is exactly
    * the near-dup mode web corpora are full of. Candidate generation
    * adapts the prefix-filter lemma to the asymmetric threshold: the
    * probe side keeps only each doc's |A| − ceil(0.8·|A|) + 1 rarest
    * shingles (df-ascending, md5 tiebreak — the `dedup_prefix_filter_
    * join` total order), but the INDEX side must stay complete (the
    * containing doc is unconstrained, so every shingle of every
    * potential container is indexed). Zero false negatives: if no
    * probe-prefix shingle hits B, then |A∩B| < ceil(0.8|A|). Join
    * fan-out stays bounded because every candidate pair is generated
    * through a probe-PREFIX shingle — df-ascending prefixes make those
    * the rare ones. Verification is integer-exact (10·∩ ≥ 8·|A|).
    */
  private[llm] def containmentJoin(docs: org.apache.spark.sql.DataFrame,
      theta10: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.Checkpoints.StageCheckpoint
    // decade-scale gate read off the raw docs scan BEFORE staging (a
    // checkpointed frame no longer reports its input files)
    val smj = graft.ops.JoinGate.textDedupSmj(docs)
    // shingle SETS staged once as arrays (strings for the exact verify,
    // 64-bit hashes for the shuffle-bound prefilter): the UDF shingling
    // runs one pass, the exploded (doc, token) view derives cheaply
    // from the staged frame, and verification intersects compact arrays
    // per candidate pair instead of re-shuffling exploded token rows
    // (measured min 9.7s → 3.4s at sf0.1 vs the explode-join verify)
    val sets = docs.select(col("doc_id"),
        TextAnalysis.shingles(col("text")).as("sh"))
      .withColumn("hs", array_sort(array_distinct(
        transform(col("sh"), t => xxhash64(t)))))
      .stageCheckpoint()
    val sh = sets.select(col("doc_id"), explode(col("sh")).as("token"))
    val n = sets.select(col("doc_id"), size(col("sh")).cast("long").as("n"))
    val dfreq = graft.ops.JoinGate.sideTable(
      sh.groupBy(col("token")).agg(count(lit(1)).as("df")), smj)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), md5(col("token")))
    val pref = sh.join(dfreq, "token")
      .join(graft.ops.JoinGate.sideTable(n, smj), "doc_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("n") - expr(s"(n * $theta10 + 9) div 10") + 1)
      .select(col("doc_id"), col("token"))
    // candidates verified as UNORDERED pairs (near-dups are candidates
    // in both directions — verifying once halves the array-carrying
    // join) through a hash-array prefilter: hashed intersections can
    // only GROW (cross-doc collisions) and hashed set sizes only
    // SHRINK (in-doc collisions), so every true containment passes the
    // prefilter (up to the ~2⁻⁶⁴ chance of a collision between two
    // SHARED shingles merging them — negligible, not zero); the few
    // prefilter survivors re-verify on the exact string arrays. The
    // hash arrays cut the wide shuffle's payload ~3× vs string
    // arrays, which is what kept the single-JVM 3×-scale run out of
    // spill territory.
    val cand = pref.as("a")
      .join(sh.select(col("doc_id").as("j"), col("token")).as("b"), "token")
      .filter(col("doc_id") =!= col("j"))
      .select(least(col("doc_id"), col("j")).as("i"),
        greatest(col("doc_id"), col("j")).as("j"))
      .distinct()
    val hsI = sets.select(col("doc_id").as("i"), col("hs").as("hs_i"))
    val hsJ = sets.select(col("doc_id").as("j"), col("hs").as("hs_j"))
    val survivors = cand.join(hsI, "i").join(hsJ, "j")
      .withColumn("hinter",
        size(array_intersect(col("hs_i"), col("hs_j"))).cast("long"))
      .filter(col("hinter") * 10 >=
        least(size(col("hs_i")), size(col("hs_j"))).cast("long") * theta10)
      .select(col("i"), col("j"))
    val exact = survivors
      .join(sets.select(col("doc_id").as("i"), col("sh").as("sh_i")), "i")
      .join(sets.select(col("doc_id").as("j"), col("sh").as("sh_j")), "j")
      .select(col("i"), col("j"),
        size(array_intersect(col("sh_i"), col("sh_j"))).cast("long").as("inter"),
        size(col("sh_i")).cast("long").as("n_i"),
        size(col("sh_j")).cast("long").as("n_j"))
    // re-emit directional rows: i⊆j and/or j⊆i as each threshold holds
    exact.filter(col("inter") * 10 >= col("n_i") * theta10)
      .select(col("i"), col("j"), col("inter"), col("n_i"))
      .unionByName(exact.filter(col("inter") * 10 >= col("n_j") * theta10)
        .select(col("j").as("i"), col("i").as("j"), col("inter"),
          col("n_j").as("n_i")))
      .orderBy(col("i"), col("j"))
  }

  private val containment = Q(
    "dedup_containment_join",
    (s, d) => containmentJoin(Tables.documents(s, d), theta10 = 8),
    // all-pairs directional containment — affordable at oracle scale
    Some(s"""WITH d AS (SELECT doc_id,
            |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
            |    for i in range(1, len(w)-1)]) AS sh
            | FROM (SELECT doc_id, ${CorpusQueries.WordsExpr} AS w
            |       FROM documents)
            | WHERE len(w) >= 3),
            |p AS (SELECT a.doc_id AS i, b.doc_id AS j,
            |  len(list_intersect(a.sh, b.sh)) AS inter,
            |  len(a.sh) AS n_i
            | FROM d a JOIN d b ON a.doc_id <> b.doc_id)
            |SELECT i, j, CAST(inter AS BIGINT) AS inter,
            |  CAST(n_i AS BIGINT) AS n_i
            |FROM p WHERE inter * 10 >= n_i * 8 ORDER BY i, j""".stripMargin),
    headline = true)

  /** The round-7 flagship composite, v6: quality gate → CONTAINMENT
    * dedup (drop every doc ≥80% contained in a LARGER doc — the
    * quotation/subset near-dup mode Jaccard pipelines miss; ties drop
    * the higher id) → temperature-scaled (α=0.5) source rebalancing →
    * curriculum shard layout (token-count deciles × md5 shards). The
    * corpus-selection lifecycle a multilingual training run ships:
    * dedup for content, temperature for source balance, curriculum for
    * ordering. Every stage boundary is a stage checkpoint; the oracle
    * rebuilds all four stages independently (all-pairs containment,
    * sqrt shares, window ntile) and the decile×shard id-sums pin the
    * exact surviving set AND its placement.
    */
  private val trainingV6 = Q(
    "docs_training_pipeline_v6",
    (s, d) => {
      val quality = stage(Tables.documents(s, d)
        .withColumn("tc", TextAnalysis.tokenCount(col("text")).cast("long"))
        .filter(col("tc") >= 20 &&
          TextAnalysis.alphaRatio(col("text")) >= 0.5)
        .select(col("doc_id"), col("source"), col("text"), col("tc")))
      val pairs = containmentJoin(quality, theta10 = 8)
      val sizes = quality.select(col("doc_id"),
        size(TextAnalysis.shingles(col("text"))).cast("long").as("nsh"))
      val dropIds = pairs
        .join(sizes.select(col("doc_id").as("j"), col("nsh").as("n_j")), "j")
        .filter(col("n_j") > col("n_i") ||
          (col("n_j") === col("n_i") && col("j") < col("i")))
        .select(col("i").as("doc_id")).distinct()
      val dd = stage(quality.join(dropIds, Seq("doc_id"), "left_anti"))
      // sqrt(n_s) micro-floors to a BIGINT before the sum — the
      // text_neyman_allocation convention; a raw sum(sqrt(double)) is
      // accumulation-order-dependent and rate feeds a `u < rate` gate
      val counts = dd.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
        .withColumn("sq",
          floor(sqrt(col("n_s").cast("double")) * 1e6).cast("long"))
      val stats = counts.agg(sum(col("n_s")).as("n_total"),
        sum(col("sq")).as("sum_sq"))
      val rates = counts.crossJoin(broadcast(stats))
        .select(col("source").as("src"), least(lit(1.0),
          col("n_total").cast("double") * 0.5
            * (col("sq").cast("double") / col("sum_sq").cast("double"))
            / col("n_s")).as("rate"))
      val v = conv(substring(md5(col("doc_id").cast("string")), 1, 15),
        16, 10).cast("double")
      val u = (v + lit(1.0)) / lit(math.pow(16.0, 15) + 1.0)
      val kept = stage(dd.withColumn("u", u)
        .join(broadcast(rates), col("source") === col("src"))
        .filter(col("u") < col("rate"))
        .select(col("doc_id"), col("tc")))
      graft.ops.GlobalOrder.ntileBy(kept, "tc", "doc_id", 10, "decile")
        .withColumn("shard",
          conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("long") % 4)
        .groupBy(col("decile"), col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tc")).as("sum_tokens"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("decile"), col("shard"))
    },
    Some(s"""WITH q AS (SELECT doc_id, source, text,
            |  CASE WHEN length(regexp_replace(text, '\\s', '', 'g')) = 0
            |   THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END
            |   AS tc
            | FROM documents
            | WHERE ${CorpusQueries.qualityPredSql("text", 20, 0.5)}),
            |sh AS (SELECT doc_id,
            |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
            |    for i in range(1, len(w)-1)]) AS sh
            | FROM (SELECT doc_id, ${CorpusQueries.WordsExpr} AS w FROM q)
            | WHERE len(w) >= 3),
            |drp AS (SELECT DISTINCT a.doc_id AS doc_id
            | FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
            |  AND len(list_intersect(a.sh, b.sh)) * 10 >= len(a.sh) * 8
            |  AND (len(b.sh) > len(a.sh)
            |    OR (len(b.sh) = len(a.sh) AND b.doc_id < a.doc_id))),
            |dd AS (SELECT * FROM q
            | WHERE doc_id NOT IN (SELECT doc_id FROM drp)),
            |c AS (SELECT source, count(*) AS n_s,
            |  CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1e6) AS BIGINT)
            |    AS sq
            | FROM dd GROUP BY 1),
            |st AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_total,
            |  CAST(sum(sq) AS BIGINT) AS sum_sq FROM c),
            |r AS (SELECT source AS src,
            |  least(1.0, CAST(n_total AS DOUBLE) * 0.5
            |    * (CAST(sq AS DOUBLE) / CAST(sum_sq AS DOUBLE)) / n_s)
            |    AS rate
            | FROM c CROSS JOIN st),
            |kept AS (SELECT dd.doc_id, dd.tc FROM dd
            | JOIN r ON dd.source = src
            | WHERE (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
            |     1, 15)) AS BIGINT) + 1.0)
            |   / (1152921504606846976.0 + 1.0) < rate),
            |n AS (SELECT doc_id, tc,
            |  ntile(10) OVER (ORDER BY tc, doc_id) AS decile,
            |  ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            |    % 4 AS shard
            | FROM kept)
            |SELECT decile, shard, count(*) AS n_docs,
            | CAST(sum(tc) AS BIGINT) AS sum_tokens,
            | CAST(sum(doc_id) AS BIGINT) AS sum_ids
            |FROM n GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    headline = true)

  /** v7 — model-gated curation ending in a LEAKAGE-FREE train/valid
    * split (the supervised-training handoff the earlier pipelines stop
    * short of): (1) hashed-feature logistic quality gate (the
    * `text_quality_logistic` model, composed via
    * [[RetrievalQueries.logitPerDoc]] — same weights, same bias);
    * (2) exact-fingerprint keep-first dedup; (3) deterministic 90/10
    * md5 split assigned ONLY to surviving docs — splitting after dedup
    * is the discipline that keeps near-identical pairs from straddling
    * train/valid (`dq_split_leakage` audits the event-table analog);
    * (4) per (split, source) rollup with logit mass and id-sum pins.
    * One corpus token pass (the gate), one dedup shuffle, no window
    * wider than the fingerprint group.
    */
  private val trainingV7 = Q(
    "docs_training_pipeline_v7",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val gated = stage(docs
        .join(RetrievalQueries.logitPerDoc(docs), Seq("doc_id"))
        .filter(col("logit") > 0)
        .select(col("doc_id"), col("source"), col("logit"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("tc"),
          TextAnalysis.fingerprint(col("text")).as("fp")))
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      val kept = gated.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      kept
        .withColumn("split",
          when(conv(substring(md5(col("doc_id").cast("string")), 1, 15),
            16, 10).cast("long") % 10 < 9, lit("train"))
            .otherwise(lit("valid")))
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tc")).as("sum_tokens"),
          sum(col("logit")).as("sum_logit"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("split"), col("source"))
    },
    Some(s"""WITH ${RetrievalQueries.LogitCte},
            |g AS (SELECT d.doc_id, d.source, lg.logit,
            |  CASE WHEN length(regexp_replace(d.text, '\\s', '', 'g')) = 0
            |   THEN 0
            |   ELSE len(string_split_regex(trim(d.text), '\\s+')) END AS tc,
            |  ${CorpusQueries.fingerprintExpr("d.text")} AS fp
            | FROM documents d JOIN lg ON d.doc_id = lg.doc_id
            | WHERE lg.logit > 0),
            |kept AS (SELECT doc_id, source, logit, tc FROM
            |  (SELECT g.*, row_number() OVER (PARTITION BY fp
            |     ORDER BY doc_id) AS rn FROM g) WHERE rn = 1),
            |sp AS (SELECT *, CASE WHEN ('0x' ||
            |   substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            |   % 10 < 9 THEN 'train' ELSE 'valid' END AS split
            | FROM kept)
            |SELECT split, source, count(*) AS n_docs,
            | CAST(sum(tc) AS BIGINT) AS sum_tokens,
            | CAST(sum(logit) AS BIGINT) AS sum_logit,
            | CAST(sum(doc_id) AS BIGINT) AS sum_ids
            |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    headline = true)

  /** Crawl-fragment stitch detection: documents whose LAST 3-word gram
    * equals another document's FIRST 3-word gram — the reassembly
    * signal for content split across page boundaries/snapshots (the
    * dedup family's directional cousin: containment finds quotes,
    * stitching finds continuations). One scan derives both edge grams;
    * candidates come from an equi-join on the GRAM (never doc×doc),
    * whose buckets are bounded by gram frequency exactly like the
    * prefix-filter joins. Docs need ≥ 6 words so head and tail cannot
    * overlap. Pairs ordered by ids only (the gram is payload — never
    * an ORDER BY key, the unicode-collation rule).
    */
  private val fragmentStitch = Q(
    "dedup_fragment_stitch_pairs",
    (s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), graft.functions.Tokenize(col("text")).as("w"))
        .filter(size(col("w")) >= 6)
      val edges = base.select(col("doc_id"),
        concat_ws(" ", slice(col("w"), 1, 3)).as("head_gram"),
        concat_ws(" ", slice(col("w"), -3, 3)).as("tail_gram"))
      edges.select(col("doc_id").as("left_doc"), col("tail_gram").as("gram"))
        .join(edges.select(col("doc_id").as("right_doc"),
          col("head_gram").as("gram")), "gram")
        .filter(col("left_doc") =!= col("right_doc"))
        .select(col("left_doc"), col("right_doc"), col("gram"))
        .orderBy(col("left_doc"), col("right_doc"))
    },
    Some(s"""WITH w AS (SELECT doc_id, ${CorpusQueries.WordsExpr} AS w
            |  FROM documents),
            |e AS (SELECT doc_id,
            |   array_to_string(w[1:3], ' ') AS head_gram,
            |   array_to_string(w[len(w)-2:len(w)], ' ') AS tail_gram
            |  FROM w WHERE len(w) >= 6)
            |SELECT a.doc_id AS left_doc, b.doc_id AS right_doc,
            | a.tail_gram AS gram
            |FROM e a JOIN e b ON a.tail_gram = b.head_gram
            | AND a.doc_id <> b.doc_id
            |ORDER BY 1, 2""".stripMargin))

  /** Cross-source near-duplication matrix — WHERE the duplication
    * lives: the verified LSH pair set rolled up by unordered source
    * pair ("which snapshots copy from which", the provenance question
    * a multi-crawl corpus answers before deciding what to drop). Rides
    * the banded-LSH machinery end-to-end (candidates + exact verify,
    * never all-pairs); id-sums pin the exact pair set per cell. Source
    * names are ASCII, so the least/greatest canonicalization and the
    * ordering are collation-safe cross-engine.
    */
  private val crossSourceMatrix = Q(
    "dedup_cross_source_matrix",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = MinHashLsh.nearDupPairs(docs, "doc_id", "text",
        threshold = 0.8)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("i"), col("source").as("s_i")), "i")
        .join(src.select(col("doc_id").as("j"), col("source").as("s_j")), "j")
        .select(least(col("s_i"), col("s_j")).as("source_a"),
          greatest(col("s_i"), col("s_j")).as("source_b"),
          col("i"), col("j"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("i") + col("j")).as("sum_pair_ids"))
        .orderBy(col("source_a"), col("source_b"))
    },
    // ground truth: the brute-force pairwise-Jaccard pair set (the
    // dedup_minhash_lsh oracle contract) grouped by source pair
    Some(s"""WITH dd AS (SELECT doc_id, source,
            |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
            |    for i in range(1, len(w)-1)]) AS sh
            | FROM (SELECT doc_id, source, ${CorpusQueries.WordsExpr} AS w
            |       FROM documents)
            | WHERE len(w) >= 3),
            |p AS (SELECT a.doc_id AS i, b.doc_id AS j,
            |  least(a.source, b.source) AS source_a,
            |  greatest(a.source, b.source) AS source_b
            | FROM dd a JOIN dd b ON a.doc_id < b.doc_id
            | WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            |   / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8)
            |SELECT source_a, source_b, count(*) AS n_pairs,
            | CAST(sum(i + j) AS BIGINT) AS sum_pair_ids
            |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Near-dup threshold sweep — the tuning table you read BEFORE fixing
    * a dedup threshold: exact shingle-Jaccard pair counts and affected-
    * document counts at τ ∈ {0.5 … 0.9}, from ONE prefix-filtered
    * candidate generation at the loosest τ = 0.5 (the candidate set at
    * 0.5 is a superset of every tighter threshold's pairs, so a single
    * verify pass buckets all five rows — no per-threshold re-join). The
    * prefix filter keeps the quadratic step bounded exactly as in
    * [[prefixJoin]]; the sweep output is 5 rows at any corpus size.
    * Integer-exact threshold tests (inter·10 ≥ un·τ₁₀) throughout.
    */
  private val thresholdSweep = Q(
    "dedup_threshold_sweep",
    (s, d) => {
      import graft.ops.Checkpoints.StageCheckpoint
      // shingle SETS staged once as arrays, hash arrays for the
      // prefilter — the containmentJoin verify shape (measured ~3×
      // cheaper than the explode-join verify); the exploded (doc,
      // token) view for the prefix filter derives from the staged frame
      val docs = Tables.documents(s, d)
      val smj = graft.ops.JoinGate.textDedupSmj(docs)
      val sets = docs.select(col("doc_id"),
          TextAnalysis.shingles(col("text")).as("sh"))
        .withColumn("hs", array_sort(array_distinct(
          transform(col("sh"), t => xxhash64(t)))))
        .stageCheckpoint()
      val sh = sets.select(col("doc_id"), explode(col("sh")).as("token"))
      val n = sets.select(col("doc_id"), size(col("sh")).cast("long").as("n"))
      val cand = prefixCandidates(sh, n, tau10 = 5, smj = smj)
      // hash prefilter at the loosest τ: hashed intersections only GROW
      // and hashed set sizes only SHRINK, so hashed Jaccard ≥ true
      // Jaccard — every true pair passes, survivors re-verify exactly.
      // (One caveat: an xxhash64 collision between two SHARED shingles
      // merges them and can lower hashed Jaccard below true Jaccard —
      // P ≈ 2⁻⁶⁴ per shingle pair, negligible but not zero.)
      // sets projections broadcast EXPLICITLY: a measured 1.6× win at
      // the bench SFs (9.0 → 5.7 s at sf0.3 — post-checkpoint stats are
      // opaque to AQE there, and the flip to sort-merge re-sorts the
      // candidate frame twice). The frame is PER-DOCUMENT, so the same
      // JoinGate that governs the df/size tables degrades these hints
      // to sort-merge above the gate (broadcastUnless = the Triangles
      // broadcastEdgeLimit pattern, now code on this path too); at
      // every bench SF it is single-digit MBs.
      val prefiltered = cand
        .join(graft.ops.JoinGate.broadcastUnless(
          sets.select(col("doc_id").as("i"), col("hs").as("hs_i")), smj), "i")
        .join(graft.ops.JoinGate.broadcastUnless(
          sets.select(col("doc_id").as("j"), col("hs").as("hs_j")), smj), "j")
        .withColumn("hinter",
          size(array_intersect(col("hs_i"), col("hs_j"))).cast("long"))
        .withColumn("hun",
          (size(col("hs_i")) + size(col("hs_j"))).cast("long") - col("hinter"))
        .filter(col("hinter") * 10 >= col("hun") * 5)
        .select(col("i"), col("j"))
      // STAGED: the verified pair frame fans out to BOTH the pair-count
      // and the docs-involved aggregations — unstaged, each consumer
      // re-planned the entire candidate pipeline (the r9 plan carried
      // two full copies of the prefix join; staging alone halved the
      // sweep)
      val verified = prefiltered
        .join(graft.ops.JoinGate.broadcastUnless(
          sets.select(col("doc_id").as("i"), col("sh").as("sh_i")), smj), "i")
        .join(graft.ops.JoinGate.broadcastUnless(
          sets.select(col("doc_id").as("j"), col("sh").as("sh_j")), smj), "j")
        .select(col("i"), col("j"),
          size(array_intersect(col("sh_i"), col("sh_j"))).cast("long")
            .as("inter"),
          (size(col("sh_i")) + size(col("sh_j"))).cast("long").as("szsum"))
        .withColumn("un", col("szsum") - col("inter"))
        .filter(col("inter") * 10 >= col("un") * 5)
        .stageCheckpoint()
      val taus = s.range(1).select(explode(
        array(lit(5), lit(6), lit(7), lit(8), lit(9))).as("tau10"))
      val atTau = verified.crossJoin(broadcast(taus))
        .filter(col("inter") * 10 >= col("un") * col("tau10"))
      val pairsAt = atTau.groupBy(col("tau10"))
        .agg(count(lit(1)).as("n_pairs"))
      val docsAt = atTau
        .select(col("tau10"), explode(array(col("i"), col("j"))).as("doc"))
        .groupBy(col("tau10"))
        .agg(countDistinct(col("doc")).as("n_docs_involved"))
      // zero-fill from the τ frame: a threshold no pair reaches still
      // publishes its row (n_pairs = 0), it does not vanish
      taus.join(pairsAt, Seq("tau10"), "left_outer")
        .join(docsAt, Seq("tau10"), "left_outer")
        .select(col("tau10"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_docs_involved"), lit(0L)).as("n_docs_involved"))
        .orderBy(col("tau10"))
    },
    // the oracle affords the all-pairs verify at compare scale — no
    // prefix filter, same integer threshold buckets
    Some(s"""WITH d AS (SELECT doc_id,
            |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
            |    for i in range(1, len(w)-1)]) AS sh
            | FROM (SELECT doc_id, ${CorpusQueries.WordsExpr} AS w
            |       FROM documents)
            | WHERE len(w) >= 3),
            |p AS (SELECT a.doc_id AS i, b.doc_id AS j,
            |  len(list_intersect(a.sh, b.sh)) AS inter,
            |  len(list_distinct(list_concat(a.sh, b.sh))) AS un
            | FROM d a JOIN d b ON a.doc_id < b.doc_id),
            |t AS (SELECT unnest([5, 6, 7, 8, 9]) AS tau10),
            |at AS (SELECT tau10, i, j FROM p CROSS JOIN t
            | WHERE inter * 10 >= un * tau10),
            |pc AS (SELECT tau10, count(*) AS n_pairs FROM at GROUP BY 1),
            |dc AS (SELECT tau10, count(DISTINCT doc) AS n_docs_involved
            | FROM (SELECT tau10, unnest([i, j]) AS doc FROM at)
            | GROUP BY 1)
            |SELECT t.tau10, COALESCE(n_pairs, 0) AS n_pairs,
            | COALESCE(n_docs_involved, 0) AS n_docs_involved
            |FROM t LEFT JOIN pc ON t.tau10 = pc.tau10
            | LEFT JOIN dc ON t.tau10 = dc.tau10
            |ORDER BY 1""".stripMargin))

  val qs: Seq[Q] = Seq(exact, minhash, simhash, ngramJaccard,
    lshClusters, lshIncremental, ccIncremental, clusterSizeHist,
    clusterSurvivors, clusterBestSurvivors,
    trainingPipeline,
    trainingV2, trainingV3, trainingV4, trainingV5, prefixJoin,
    repeatedSpans, containment, trainingV6, trainingV7, thresholdSweep,
    crossSourceMatrix, fragmentStitch)
}
