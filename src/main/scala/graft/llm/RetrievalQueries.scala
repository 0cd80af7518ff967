package graft.llm

import org.apache.spark.sql.functions._

import graft.{Q, QueryPack, Tables}

/** Retrieval / featurization extensions beyond the round-6 registry:
  * hybrid rank fusion, hashing-trick featurization, and
  * temperature-scaled mixture sampling — the corpus-selection shapes a
  * training-data pipeline runs between curation and training.
  *
  * Everything here follows the repo's determinism spine: rankings are
  * quantized (6-dp scores / integer micro-units) before comparison,
  * hash-derived randomness is md5-uniform (portable to the DuckDB
  * oracle by construction), and all compared arithmetic is either
  * integer or an expression mirrored operand-for-operand in the oracle
  * SQL.
  */
object RetrievalQueries extends QueryPack {

  /** Reciprocal Rank Fusion of two bounded rank lists — inputs carry
    * (doc_id, bm25_rank) / (doc_id, ann_rank); both must already be
    * top-k-bounded (the fusion full-outer join re-evaluates nothing and
    * BoundedRank broadcasts). RRF credits are floor(1e6/(rrfK+rank)) —
    * integer micro-units from integer ranks, so the fused ordering is
    * an exact BIGINT comparison in both engines; absent-from-list
    * contributes 0 (rank 0 sentinel in the output).
    */
  private[llm] def rrfFuse(bm0: org.apache.spark.sql.DataFrame,
      ann0: org.apache.spark.sql.DataFrame, k: Int,
      rrfK: Int = 60): org.apache.spark.sql.DataFrame = {
    import graft.ops.Checkpoints.StageCheckpoint
    // both rank lists are top-k-bounded but their LINEAGE is a full
    // retrieval (BM25 corpus pass / brute scoring); staged here so the
    // fusion join + BoundedRank self-join read ≤k materialized rows
    // instead of re-planning the retrieval per consumer (the plan held
    // 24 corpus scans unstaged)
    val bm = bm0.stageCheckpoint()
    val ann = ann0.stageCheckpoint()
    val fused = bm.join(ann, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("bm25_rank"), lit(0L)).as("bm25_rank"),
        coalesce(col("ann_rank"), lit(0L)).as("ann_rank"))
      // 1e6/(rrfK+r) is IEEE-exact double division of small integers in
      // both engines; floor then yields identical BIGINTs
      .withColumn("rrf_micro",
        (when(col("bm25_rank") > 0,
            floor(lit(1000000) / (lit(rrfK) + col("bm25_rank"))))
          .otherwise(0L) +
        when(col("ann_rank") > 0,
            floor(lit(1000000) / (lit(rrfK) + col("ann_rank"))))
          .otherwise(0L)).cast("long"))
    val top = fused.orderBy(col("rrf_micro").desc, col("doc_id")).limit(k)
    graft.ops.BoundedRank.attach(top, "rank",
        Seq("rrf_micro" -> true, "doc_id" -> false))
      .select(col("rank"), col("doc_id"), col("rrf_micro"),
        col("bm25_rank"), col("ann_rank"))
      .orderBy(col("rank"))
  }

  /** Reciprocal Rank Fusion (Cormack/Clarke/Buettcher SIGIR'09) of a
    * lexical BM25 ranking and a dense embedding-cosine ranking — the
    * standard hybrid-retrieval combiner (score = Σ 1/(60+rank) over the
    * lists a document appears in). Both input rankings are top-50 lists
    * already pinned elsewhere in the registry ([[Retrieval.bm25TopK]],
    * [[Ann.bruteTopK]]); fusion happens on the two bounded (≤50-row)
    * rank frames, so the combine step is broadcast-sized at ANY corpus
    * scale — the expensive work stays in the two underlying retrievals,
    * each of which keeps its own scale shape (term-filtered aggregation;
    * broadcast query vector).
    */
  private val rrf = Q(
    "retrieval_rrf_fusion",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      val bm = Retrieval.bm25TopK(docs, "doc_id", "text",
          terms = Seq("vector", "stream", "hash"), k = 50)
        .select(col("doc_id"), col("rank").cast("long").as("bm25_rank"))
      val ann = Ann.bruteTopK(emb, emb.filter(col("vec_id") === 0),
          "vec_id", "embedding", k = 50)
        .select(col("vec_id").as("doc_id"), col("rank").cast("long").as("ann_rank"))
      rrfFuse(bm, ann, k = 10)
    },
    Some(s"""WITH d AS (SELECT doc_id, ${CorpusQueries.WordsExpr} AS w
            |  FROM documents),
            |dd AS (SELECT doc_id, w, len(w) AS dl FROM d),
            |stats AS (SELECT count(*) AS n_docs,
            |   CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dd),
            |t(term) AS (VALUES ('vector'), ('stream'), ('hash')),
            |tf AS (SELECT doc_id, term, dl,
            |   len(list_filter(w, x -> x = term)) AS tf
            |  FROM dd, t WHERE len(list_filter(w, x -> x = term)) > 0),
            |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            |sc AS (SELECT doc_id, CAST(sum(CAST(round(
            |    ln(1 + (n_docs - df + 0.5) / (df + 0.5))
            |      * (tf * 2.2) / (tf + (dl / avgdl * 0.75 + 0.25) * 1.2)
            |      * 1e6) AS BIGINT)) AS BIGINT) AS score_micro
            |  FROM tf JOIN df USING (term), stats GROUP BY 1),
            |bm AS (SELECT doc_id, row_number() OVER (
            |    ORDER BY score_micro DESC, doc_id) AS bm25_rank FROM sc),
            |bmk AS (SELECT doc_id, bm25_rank FROM bm WHERE bm25_rank <= 50),
            |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
            |scv AS (SELECT e.vec_id AS doc_id,
            |   round(CAST(list_cosine_similarity(qe, e.embedding) AS DOUBLE), 6) AS c
            |  FROM q, embeddings e WHERE e.vec_id <> 0),
            |annr AS (SELECT doc_id, row_number() OVER (
            |    ORDER BY c DESC, doc_id) AS ann_rank FROM scv),
            |annk AS (SELECT doc_id, ann_rank FROM annr WHERE ann_rank <= 50),
            |f AS (SELECT COALESCE(bmk.doc_id, annk.doc_id) AS doc_id,
            |   CAST(COALESCE(bm25_rank, 0) AS BIGINT) AS bm25_rank,
            |   CAST(COALESCE(ann_rank, 0) AS BIGINT) AS ann_rank
            |  FROM bmk FULL OUTER JOIN annk ON bmk.doc_id = annk.doc_id),
            |g AS (SELECT doc_id, bm25_rank, ann_rank,
            |   CAST((CASE WHEN bm25_rank > 0
            |       THEN floor(1000000 / (60 + bm25_rank)) ELSE 0 END)
            |     + (CASE WHEN ann_rank > 0
            |       THEN floor(1000000 / (60 + ann_rank)) ELSE 0 END)
            |     AS BIGINT) AS rrf_micro
            |  FROM f),
            |r AS (SELECT g.*, row_number() OVER (
            |    ORDER BY rrf_micro DESC, doc_id) AS rank FROM g)
            |SELECT rank, doc_id, rrf_micro, bm25_rank, ann_rank
            |FROM r WHERE rank <= 10 ORDER BY 1""".stripMargin),
    headline = true)

  /** Hashing-trick featurization audit (Weinberger et al. ICML'09): hash
    * every word token into a FIXED B=64-bucket feature space (md5 mod B,
    * the portable uniform) and profile the resulting feature table —
    * token mass, distinct-token collisions, and document coverage per
    * bucket. The hashing trick is the scale move for featurizing
    * unbounded vocabularies: the feature space is B columns at any
    * corpus size, no vocabulary build, no dictionary broadcast; the
    * whole featurization is one explode + one map-side-combinable
    * aggregation to exactly B output rows.
    */
  private[llm] def featureHashProfile(docs: org.apache.spark.sql.DataFrame,
      buckets: Int): org.apache.spark.sql.DataFrame = {
    docs
      .select(col("doc_id"), explode(graft.functions.Tokenize(col("text"))).as("tok"))
      .withColumn("bucket",
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long") % buckets)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_tokens"),
        count_distinct(col("tok")).as("n_distinct_tokens"),
        count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(col("bucket"))
  }

  private val featHash = Q(
    "text_feature_hashing",
    (s, d) => featureHashProfile(Tables.documents(s, d), buckets = 64),
    Some(s"""WITH tok AS (SELECT doc_id, unnest(${CorpusQueries.WordsExpr}) AS tok
            |  FROM documents)
            |SELECT ('0x' || substring(md5(tok), 1, 15))::BIGINT % 64 AS bucket,
            | count(*) AS n_tokens,
            | count(DISTINCT tok) AS n_distinct_tokens,
            | count(DISTINCT doc_id) AS n_docs
            |FROM tok GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Temperature-scaled mixture sampling (the multilingual-corpus
    * rebalancing move, α = 0.5 — mT5/XLM-R style): sampling share per
    * source ∝ n_s^α, which upweights small sources relative to their
    * natural share without equalizing outright (the α → 0 limit is
    * `text_mixture_sample`'s equal-share draw, α = 1 is proportional).
    * Two scans: pass 1 reduces to |sources| counts, the α-scaled rates
    * derive on that tiny frame (sqrt is IEEE-correctly-rounded — the
    * same double in both engines), pass 2 streams the corpus against
    * the broadcast rates keeping docs whose md5-uniform falls under
    * their source's rate. Oversubscribed small sources saturate at
    * rate 1 — visible via n_kept == n_docs.
    */
  private[llm] def temperatureMixture(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // each sqrt(n_s) micro-floors into a BIGINT BEFORE the sum (the
    // text_neyman_allocation convention): a raw sum(sqrt(double)) would
    // depend on partition accumulation order, and rate feeds a `u <
    // rate` gate, so one flipped ulp could move a doc across the draw.
    // sqrt(n_s)·1e6 ≤ ~3e12 even at 1e13 docs/source — BIGINT-safe.
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      .withColumn("sq",
        floor(sqrt(col("n_s").cast("double")) * 1e6).cast("long"))
    val stats = counts.agg(
      sum(col("n_s")).as("n_total"),
      sum(col("sq")).as("sum_sq"))
    // target draw M = n_total/2 docs, allocated ∝ sqrt(n_s):
    // rate_s = min(1, (n_total*0.5) * (sq/sum_sq) / n_s) — both ratio
    // operands exact integers, so the one double expression is
    // identical across engines
    val rates = counts.crossJoin(broadcast(stats))
      .select(col("source").as("src"), col("n_s"),
        least(lit(1.0),
          col("n_total").cast("double") * 0.5
            * (col("sq").cast("double") / col("sum_sq").cast("double"))
            / col("n_s")).as("rate"))
    val v = conv(substring(md5(col("doc_id").cast("string")), 1, 15),
      16, 10).cast("double")
    val u = (v + lit(1.0)) / lit(math.pow(16.0, 15) + 1.0)
    docs.select(col("doc_id"), col("source"), u.as("u"))
      .join(broadcast(rates), col("source") === col("src"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_docs"),
        sum(when(col("u") < col("rate"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("source"))
  }

  private val temperature = Q(
    "text_temperature_mixture",
    (s, d) => temperatureMixture(Tables.documents(s, d)),
    Some("""WITH c AS (SELECT source, count(*) AS n_s,
           |  CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1e6) AS BIGINT)
           |    AS sq
           |  FROM documents GROUP BY 1),
           |st AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_total,
           |  CAST(sum(sq) AS BIGINT) AS sum_sq FROM c),
           |r AS (SELECT source AS src, n_s,
           |  least(1.0, CAST(n_total AS DOUBLE) * 0.5
           |    * (CAST(sq AS DOUBLE) / CAST(sum_sq AS DOUBLE)) / n_s)
           |    AS rate
           | FROM c CROSS JOIN st),
           |u AS (SELECT doc_id, source,
           |  (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
           |     AS BIGINT) + 1.0) / (1152921504606846976.0 + 1.0) AS u
           | FROM documents)
           |SELECT source, max(n_s) AS n_docs,
           | CAST(sum(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT)
           |   AS n_kept
           |FROM u JOIN r ON source = src
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Linear (logistic-style) quality classifier over hashed features —
    * the fastText/CCNet-shaped quality gate: score each document as
    * Σ_tokens w[h(token)] + bias and keep docs whose logit clears 0.
    * Real deployments load trained weights; here the B=64 weight table
    * is a fixed DETERMINISTIC function of the bucket id
    * (w[b] = (b·2654435761) mod 1009 − 504, Knuth's multiplicative
    * constant — computable in closed form by both engines, so the whole
    * gate is exactly cross-checkable end-to-end). The plumbing is the
    * production shape regardless of where weights come from: no
    * vocabulary build, no dictionary broadcast, one explode + two keyed
    * aggregations; a trained model just swaps the weight expression for
    * a 64-entry broadcast map. Zero-token docs score bias alone (the
    * left join — dropping them would silently pass empty documents).
    */
  /** Per-document logit under the fixed hashed-feature linear model —
    * the reusable core of the gate (v7 pipeline composes on this). */
  private[llm] def logitPerDoc(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(graft.functions.Tokenize(col("text"))).as("tok"))
      .withColumn("bucket",
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long") % 64)
      .withColumn("w", (col("bucket") * 2654435761L) % 1009L - 504L)
    val perDoc = toks.groupBy(col("doc_id")).agg(sum(col("w")).as("s"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("s"), lit(0L)) - 250L).as("logit"))
  }

  /** The per-doc logit chain as DuckDB CTEs ending in `lg(doc_id,
    * logit)` — text-identical model on the oracle side. */
  private[llm] val LogitCte =
    s"""ltok AS (SELECT doc_id, unnest(${CorpusQueries.WordsExpr})
       |   AS tok FROM documents),
       |lwt AS (SELECT doc_id,
       |  (('0x' || substring(md5(tok), 1, 15))::BIGINT % 64)
       |    * 2654435761 % 1009 - 504 AS w
       | FROM ltok),
       |lpd AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS s
       | FROM lwt GROUP BY 1),
       |lg AS (SELECT d.doc_id, COALESCE(lpd.s, 0) - 250 AS logit
       | FROM documents d LEFT JOIN lpd ON d.doc_id = lpd.doc_id)"""
      .stripMargin

  private[llm] def logisticGate(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    docs.select(col("doc_id"), col("source"))
      .join(logitPerDoc(docs), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("logit") > 0, 1L).otherwise(0L)).as("n_pass"),
        sum(col("logit")).as("sum_logit"))
      .orderBy(col("source"))
  }

  private val logistic = Q(
    "text_quality_logistic",
    (s, d) => logisticGate(Tables.documents(s, d)),
    Some(s"""WITH tok AS (SELECT doc_id, unnest(${CorpusQueries.WordsExpr})
            |   AS tok FROM documents),
            |wt AS (SELECT doc_id,
            |  (('0x' || substring(md5(tok), 1, 15))::BIGINT % 64)
            |    * 2654435761 % 1009 - 504 AS w
            | FROM tok),
            |pd AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS s
            | FROM wt GROUP BY 1),
            |sc AS (SELECT d.source, COALESCE(pd.s, 0) - 250 AS logit
            | FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id)
            |SELECT source, count(*) AS n_docs,
            | CAST(sum(CASE WHEN logit > 0 THEN 1 ELSE 0 END) AS BIGINT)
            |   AS n_pass,
            | CAST(sum(logit) AS BIGINT) AS sum_logit
            |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** Deterministic negative sampling for contrastive retrieval training
    * (the DPR/contriever data-prep step): each BM25 top-10 positive
    * gets 4 corpus negatives, drawn by per-positive md5 order so the
    * sample is a pure function of the ids — reproducible across
    * engines, retries, and partitionings, and disjoint from the
    * positive set (global anti-join first). The rank window runs on an
    * md5-prefix-filtered candidate stream (hex digit '0' ⇒ 1/16 of the
    * corpus; both engines apply the identical filter, so the compare
    * is exact regardless) — the prefix widens with corpus size to keep
    * the window input bounded, the same knob as every md5-banded
    * sampler here.
    */
  private val negSampling = Q(
    "retrieval_negative_sampling",
    (s, d) => {
      import graft.ops.Checkpoints.StageCheckpoint
      val docs = Tables.documents(s, d)
      // staged: the 10-row positive frame fans out to the anti join AND
      // the cross join, and its BM25+BoundedRank lineage is a full
      // corpus pass that would otherwise re-plan per consumer
      val pos = Retrieval.bm25TopK(docs, "doc_id", "text",
          terms = Seq("vector", "stream", "hash"), k = 10)
        .select(col("doc_id").as("p_doc_id"), col("rank").as("p_rank"))
        .stageCheckpoint()
      val cand = docs.select(col("doc_id").as("neg_doc_id"))
        .join(broadcast(pos.select(col("p_doc_id").as("x"))),
          col("neg_doc_id") === col("x"), "left_anti")
      val paired = cand.crossJoin(broadcast(pos))
        .withColumn("h", md5(concat(col("p_doc_id").cast("string"),
          lit("#"), col("neg_doc_id").cast("string"))))
        .filter(substring(col("h"), 1, 1) === "0")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p_doc_id")).orderBy(col("h"), col("neg_doc_id"))
      paired.withColumn("neg_rank", row_number().over(w))
        .filter(col("neg_rank") <= 4)
        .select(col("p_rank"), col("p_doc_id"), col("neg_rank"),
          col("neg_doc_id"))
        .orderBy(col("p_rank"), col("neg_rank"))
    },
    Some(s"""WITH ${TextQueries.Bm25Cte},
            |pos AS (SELECT doc_id AS p_doc_id, rank AS p_rank FROM r
            |  WHERE rank <= 10),
            |cand AS (SELECT doc_id AS neg_doc_id FROM documents
            |  WHERE doc_id NOT IN (SELECT p_doc_id FROM pos)),
            |pr AS (SELECT p_rank, p_doc_id, neg_doc_id,
            |   md5(CAST(p_doc_id AS VARCHAR) || '#'
            |     || CAST(neg_doc_id AS VARCHAR)) AS h
            |  FROM cand CROSS JOIN pos),
            |f AS (SELECT p_rank, p_doc_id, neg_doc_id,
            |   row_number() OVER (PARTITION BY p_doc_id
            |     ORDER BY h, neg_doc_id) AS neg_rank
            |  FROM pr WHERE substring(h, 1, 1) = '0')
            |SELECT p_rank, p_doc_id, neg_rank, neg_doc_id FROM f
            |WHERE neg_rank <= 4 ORDER BY p_rank, neg_rank""".stripMargin))

  /** Inverted-index shard plan — the search-index build diagnostic:
    * postings are distinct (term, doc) pairs, terms hash into 8 shards
    * by the md5-mod convention, and the plan reports each shard's term
    * count, posting mass, and heaviest posting list (term + df; argmax
    * through one max(struct) with the md5-string tiebreak, so unicode
    * collation never orders the compare). The skew between shards is
    * the number that decides whether term-hash sharding suffices or the
    * heaviest lists need splitting — the same decision Lucene/ES make
    * with `index.routing`; one explode, two keyed aggregations, 8 rows
    * out.
    */
  private val indexShardPlan = Q(
    "text_index_shard_plan",
    (s, d) => {
      val postings = Tables.documents(s, d)
        .select(col("doc_id"), explode(graft.functions.Tokenize(col("text"))).as("tok"))
        .distinct()
      val byTerm = postings.groupBy(col("tok"))
        .agg(count(lit(1)).as("df"))
        .withColumn("shard",
          conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long") % 8)
      byTerm.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_terms"),
          sum(col("df")).as("n_postings"),
          max(struct(col("df"), md5(col("tok")).as("m"), col("tok").as("t")))
            .as("top"))
        .select(col("shard"), col("n_terms"), col("n_postings"),
          col("top.df").as("top_df"), col("top.t").as("top_term"))
        .orderBy(col("shard"))
    },
    Some(s"""WITH tok AS (SELECT DISTINCT doc_id,
            |   unnest(${CorpusQueries.WordsExpr}) AS tok FROM documents),
            |bt AS (SELECT tok, count(*) AS df,
            |   ('0x' || substring(md5(tok), 1, 15))::BIGINT % 8 AS shard
            |  FROM tok GROUP BY 1),
            |rk AS (SELECT shard, tok, df, row_number() OVER (
            |    PARTITION BY shard ORDER BY df DESC, md5(tok) DESC) AS rn
            |  FROM bt)
            |SELECT bt.shard, count(*) AS n_terms,
            | CAST(sum(bt.df) AS BIGINT) AS n_postings,
            | max(CASE WHEN rk.rn = 1 THEN rk.df END) AS top_df,
            | max(CASE WHEN rk.rn = 1 THEN rk.tok END) AS top_term
            |FROM bt JOIN rk ON bt.shard = rk.shard AND bt.tok = rk.tok
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** DCG rank discounts as INLINED integer constants —
    * ⌊log₂(r+1)·10⁶⌋ for ranks 1..10, the same public-constant move as
    * the Benford table: no transcendental function executes in either
    * engine, so every DCG term is one exact integer division.
    */
  private val DcgDenomMicro: Seq[(Int, Long)] = Seq(
    1 -> 1000000L, 2 -> 1584962L, 3 -> 2000000L, 4 -> 2321928L,
    5 -> 2584962L, 6 -> 2807354L, 7 -> 3000000L, 8 -> 3169925L,
    9 -> 3321928L, 10 -> 3459431L)

  /** `(rel·10¹²) ÷ ⌊log₂(rank+1)·10⁶⌋` as a CASE over the inlined
    * table, parameterized on the integer-division operator (Spark
    * `div`, DuckDB `//`). */
  private def dcgTermSql(relExpr: String, rankExpr: String,
      intDiv: String): String =
    "CASE " + DcgDenomMicro.map { case (r, dn) =>
      s"WHEN $rankExpr = $r THEN ($relExpr * 1000000000000) $intDiv $dn"
    }.mkString(" ") + " ELSE 0 END"

  /** Ranking-quality evaluation of the BM25 retriever — MRR and
    * nDCG@10 against a graded ground truth (relevance = number of
    * query terms a document contains, the deterministic stand-in for
    * human judgments; gain 2^g − 1). The eval-metric layer every
    * retrieval stack ships next to the index itself. All metrics are
    * exact integers: reciprocal rank in micro-units by integer
    * division, each DCG term through the inlined discount table
    * (nothing transcendental at runtime), nDCG in basis points from
    * the two BIGINT sums. IDCG derives from the corpus-wide grade
    * HISTOGRAM (three conditional counts), never a global sort — the
    * ideal ranking's grades are read off cumulative counts.
    */
  private val evalMetrics = Q(
    "retrieval_eval_metrics",
    (s, d) => {
      import graft.ops.Checkpoints.StageCheckpoint
      val docs = Tables.documents(s, d)
      val grades = docs.select(col("doc_id"), graft.functions.Tokenize(col("text")).as("w"))
        .select(col("doc_id"),
          (array_contains(col("w"), "vector").cast("int") +
            array_contains(col("w"), "stream").cast("int") +
            array_contains(col("w"), "hash").cast("int")).as("g"))
      val top = Retrieval.bm25TopK(docs, "doc_id", "text",
          terms = Seq("vector", "stream", "hash"), k = 10)
        .select(col("rank"), col("doc_id")).stageCheckpoint()
      val tg = top.join(grades, Seq("doc_id"))
        .withColumn("rel", expr("CASE g WHEN 3 THEN 7 WHEN 2 THEN 3" +
          " WHEN 1 THEN 1 ELSE 0 END"))
      val dcg = tg.agg(sum(expr(dcgTermSql("rel", "rank", "div")))
        .as("dcg_micro"),
        coalesce(expr("1000000 div min(CASE WHEN g >= 1 THEN rank END)"),
          lit(0L)).as("mrr_micro"))
      val cnt = grades.agg(
        sum(when(col("g") === 3, 1L).otherwise(0L)).as("n3"),
        sum(when(col("g") === 2, 1L).otherwise(0L)).as("n2"),
        sum(when(col("g") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") >= 1, 1L).otherwise(0L)).as("n_rel"))
      val ideal = docs.sparkSession.range(1, 11)
        .select(col("id").cast("int").as("rank"))
        .crossJoin(broadcast(cnt))
        .withColumn("rel", expr("CASE WHEN rank <= n3 THEN 7" +
          " WHEN rank <= n3 + n2 THEN 3" +
          " WHEN rank <= n3 + n2 + n1 THEN 1 ELSE 0 END"))
      val idcg = ideal.agg(max(col("n_rel")).as("n_rel"),
        sum(expr(dcgTermSql("rel", "rank", "div"))).as("idcg_micro"))
      dcg.crossJoin(idcg)
        .select(col("n_rel"), col("mrr_micro"), col("dcg_micro"),
          col("idcg_micro"),
          when(col("idcg_micro") > 0,
            expr("(10000 * dcg_micro) div idcg_micro")).as("ndcg_bp"))
    },
    Some(s"""WITH ${TextQueries.Bm25Cte},
            |top10 AS (SELECT doc_id, rank FROM r WHERE rank <= 10),
            |gw AS (SELECT doc_id, ${CorpusQueries.WordsExpr} AS w
            |  FROM documents),
            |gr AS (SELECT doc_id,
            |   (CASE WHEN len(list_filter(w, x -> x = 'vector')) > 0
            |     THEN 1 ELSE 0 END
            |    + CASE WHEN len(list_filter(w, x -> x = 'stream')) > 0
            |     THEN 1 ELSE 0 END
            |    + CASE WHEN len(list_filter(w, x -> x = 'hash')) > 0
            |     THEN 1 ELSE 0 END) AS g
            |  FROM gw),
            |tg AS (SELECT rank, g,
            |   CASE g WHEN 3 THEN 7 WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END
            |     AS rel
            |  FROM top10 JOIN gr USING (doc_id)),
            |dcg AS (SELECT CAST(sum(${dcgTermSql("rel", "rank", "//")})
            |    AS BIGINT) AS dcg_micro,
            |   COALESCE(1000000 // min(CASE WHEN g >= 1 THEN rank END), 0)
            |     AS mrr_micro
            |  FROM tg),
            |cnt AS (SELECT
            |   CAST(sum(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
            |   CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
            |   CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            |   CAST(sum(CASE WHEN g >= 1 THEN 1 ELSE 0 END) AS BIGINT)
            |     AS n_rel
            |  FROM gr),
            |rk(rank) AS (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10)),
            |ideal AS (SELECT rank,
            |   CASE WHEN rank <= n3 THEN 7 WHEN rank <= n3 + n2 THEN 3
            |    WHEN rank <= n3 + n2 + n1 THEN 1 ELSE 0 END AS rel
            |  FROM rk CROSS JOIN cnt),
            |idcg AS (SELECT CAST(sum(${dcgTermSql("rel", "rank", "//")})
            |    AS BIGINT) AS idcg_micro FROM ideal)
            |SELECT n_rel, mrr_micro, dcg_micro, idcg_micro,
            | CASE WHEN idcg_micro > 0
            |  THEN (10000 * dcg_micro) // idcg_micro END AS ndcg_bp
            |FROM cnt, dcg, idcg""".stripMargin))

  /** Cohen's κ agreement between two INDEPENDENT quality gates — the
    * filter-governance question ("do my classifiers agree beyond
    * chance, or is one redundant?") a curation stack answers before
    * stacking gates: gate A = the hashed-feature logistic model
    * ([[logitPerDoc]] > 0), gate B = the v6 heuristic gate
    * (tokens ≥ 20 ∧ alpha ≥ 0.5). κ = (n·(n₁₁+n₀₀) − Σ marginal
    * products) / (n² − Σ marginal products) — every term an exact
    * BIGINT from one confusion-matrix aggregation (n ≤ corpus, so the
    * products sit far under 2⁵³ and the single floor(num·10⁶/den)
    * double is deterministic cross-engine). One corpus pass per gate,
    * one join, one agg row.
    */
  private val gateKappa = Q(
    "dq_gate_agreement_kappa",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // text normalized to '' for the MATERIALIZED gate value (the
      // gopherGates convention): a NULL text must score b = 0 exactly
      // like the oracle's CASE ... ELSE 0 — the bare predicate would
      // yield NULL and silently drop the doc from the confusion matrix
      // while still counting it in n
      val txt = coalesce(col("text"), lit(""))
      val ab = docs.select(col("doc_id"),
          (TextAnalysis.tokenCount(txt) >= 20 &&
            TextAnalysis.alphaRatio(txt) >= 0.5).cast("long").as("b"))
        .join(logitPerDoc(docs), Seq("doc_id"))
        .withColumn("a", (col("logit") > 0).cast("long"))
      ab.agg(count(lit(1)).as("n"),
          coalesce(sum(col("a") * col("b")), lit(0L)).as("n11"),
          coalesce(sum(col("a") * (lit(1L) - col("b"))), lit(0L)).as("n10"),
          coalesce(sum((lit(1L) - col("a")) * col("b")), lit(0L)).as("n01"),
          coalesce(sum((lit(1L) - col("a")) * (lit(1L) - col("b"))), lit(0L))
            .as("n00"))
        .withColumn("pe_n2", expr(
          "(n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)"))
        .select(col("n").as("n_docs"), col("n11"), col("n10"),
          col("n01"), col("n00"),
          expr("""CASE WHEN n * n - pe_n2 > 0 THEN
                 | CAST(floor(CAST(n * (n11 + n00) - pe_n2 AS DOUBLE) * 1e6
                 |   / CAST(n * n - pe_n2 AS DOUBLE)) AS BIGINT)
                 |END""".stripMargin).as("kappa_micro"))
    },
    Some(s"""WITH $LogitCte,
            |b AS (SELECT d.doc_id,
            |  CASE WHEN ${CorpusQueries.qualityPredSql("d.text", 20, 0.5)}
            |   THEN 1 ELSE 0 END AS b
            | FROM documents d),
            |ab AS (SELECT CASE WHEN lg.logit > 0 THEN 1 ELSE 0 END AS a, b.b
            | FROM lg JOIN b ON lg.doc_id = b.doc_id),
            |st AS (SELECT count(*) AS n,
            |  CAST(COALESCE(sum(a * b), 0) AS BIGINT) AS n11,
            |  CAST(COALESCE(sum(a * (1 - b)), 0) AS BIGINT) AS n10,
            |  CAST(COALESCE(sum((1 - a) * b), 0) AS BIGINT) AS n01,
            |  CAST(COALESCE(sum((1 - a) * (1 - b)), 0) AS BIGINT) AS n00
            | FROM ab),
            |pe AS (SELECT st.*,
            |  (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS pe_n2
            | FROM st)
            |SELECT n AS n_docs, n11, n10, n01, n00,
            | CASE WHEN n * n - pe_n2 > 0 THEN
            |  CAST(floor(CAST(n * (n11 + n00) - pe_n2 AS DOUBLE) * 1e6
            |    / CAST(n * n - pe_n2 AS DOUBLE)) AS BIGINT)
            | END AS kappa_micro
            |FROM pe""".stripMargin))

  /** Quality-classifier calibration table: exact global DECILES of the
    * logistic score (via the range-bucketed two-phase global ntile —
    * never an unpartitioned window) against the heuristic gate's pass
    * rate per decile, in integer basis points. A calibrated score shows
    * monotone qual_bp across deciles; a flat curve means the model adds
    * no signal over the heuristic. Integer arithmetic end-to-end.
    */
  private val calibration = Q(
    "dq_quality_calibration",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // '' normalization for the same NULL-text reason as gateKappa
      val txt = coalesce(col("text"), lit(""))
      val scored = docs.select(col("doc_id"),
          (TextAnalysis.tokenCount(txt) >= 20 &&
            TextAnalysis.alphaRatio(txt) >= 0.5).cast("long")
            .as("qual"))
        .join(logitPerDoc(docs), Seq("doc_id"))
      graft.ops.GlobalOrder.ntileBy(
          scored, "logit", "doc_id", 10, "decile")
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("logit")).as("sum_logit"),
          sum(col("qual")).as("n_qual_pass"))
        .withColumn("qual_bp", expr("(n_qual_pass * 10000) div n_docs"))
        .orderBy(col("decile"))
    },
    Some(s"""WITH $LogitCte,
            |b AS (SELECT d.doc_id,
            |  CASE WHEN ${CorpusQueries.qualityPredSql("d.text", 20, 0.5)}
            |   THEN 1 ELSE 0 END AS qual
            | FROM documents d),
            |t AS (SELECT lg.logit, b.qual,
            |  ntile(10) OVER (ORDER BY lg.logit, lg.doc_id) AS decile
            | FROM lg JOIN b ON lg.doc_id = b.doc_id)
            |SELECT decile, count(*) AS n_docs,
            | CAST(sum(logit) AS BIGINT) AS sum_logit,
            | CAST(sum(qual) AS BIGINT) AS n_qual_pass,
            | (CAST(sum(qual) AS BIGINT) * 10000) // count(*) AS qual_bp
            |FROM t GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Best-first token-budget quota fill: per source, admit documents in
    * (quality desc, id) order until the running token sum exceeds the
    * per-source budget — the "fill each source's quota with its best
    * documents" selection step between scoring and training. The
    * admission rule is the deterministic PREFIX of the per-source
    * quality order (a doc whose cumulative sum crosses the budget is
    * dropped along with everything after it — no knapsack backtracking,
    * so the kept set is a pure function of the order and both engines
    * replay it from one partitioned window cumsum). Per-source windows
    * — never a global sort; id-sums pin the exact admitted set.
    */
  private val quotaFill = Q(
    "docs_quota_fill_best_first",
    (s, d) => {
      val budget = 20000L
      val docs = Tables.documents(s, d)
      val scored = docs.select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("tc"))
        .join(logitPerDoc(docs), Seq("doc_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("logit").desc, col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      scored.withColumn("cum", sum(col("tc")).over(w))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(when(col("cum") <= budget, 1L).otherwise(0L)),
            lit(0L)).as("n_kept"),
          coalesce(sum(when(col("cum") <= budget, col("tc"))
            .otherwise(0L)), lit(0L)).as("kept_tokens"),
          coalesce(sum(when(col("cum") <= budget, col("doc_id"))
            .otherwise(0L)), lit(0L)).as("sum_kept_ids"))
        .orderBy(col("source"))
    },
    Some(s"""WITH $LogitCte,
            |t AS (SELECT d.doc_id, d.source,
            |  CAST(CASE WHEN length(regexp_replace(d.text, '\\s', '', 'g'))
            |     = 0 THEN 0
            |    ELSE len(string_split_regex(trim(d.text), '\\s+')) END
            |   AS BIGINT) AS tc, lg.logit
            | FROM documents d JOIN lg ON d.doc_id = lg.doc_id),
            |c AS (SELECT source, tc, doc_id,
            |  CAST(sum(tc) OVER (PARTITION BY source
            |    ORDER BY logit DESC, doc_id ROWS UNBOUNDED PRECEDING)
            |   AS BIGINT) AS cum
            | FROM t)
            |SELECT source, count(*) AS n_docs,
            | CAST(COALESCE(sum(CASE WHEN cum <= 20000 THEN 1 ELSE 0 END), 0)
            |   AS BIGINT) AS n_kept,
            | CAST(COALESCE(sum(CASE WHEN cum <= 20000 THEN tc ELSE 0 END), 0)
            |   AS BIGINT) AS kept_tokens,
            | CAST(COALESCE(sum(CASE WHEN cum <= 20000 THEN doc_id ELSE 0 END),
            |   0) AS BIGINT) AS sum_kept_ids
            |FROM c GROUP BY 1 ORDER BY 1""".stripMargin))

  val qs: Seq[Q] = Seq(rrf, featHash, temperature, logistic, negSampling,
    indexShardPlan, evalMetrics, gateKappa, calibration, quotaFill)
}
