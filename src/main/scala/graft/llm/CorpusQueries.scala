package graft.llm

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Checkpoints.StageCheckpoint

/** Corpus-curation operators a training-data pipeline runs between raw
  * crawl and tokenizer: winnowing overlap fingerprints, repetition
  * scoring, PII scrubbing, and exact stratified sampling. Every query
  * aggregates to a bounded (per-lang / per-source) result and carries an
  * independent DuckDB oracle.
  */
object CorpusQueries extends QueryPack {

  /** Clean tokenization every shingle-family oracle uses — mirrors
    * [[Hashing.words]] exactly (edge-strip \s, split \s+, drop empties).
    * Shared with [[DedupQueries]]' shingle oracles: one convention, one
    * definition.
    */
  private[llm] def wordsExpr(textCol: String): String =
    s"""list_filter(string_split_regex(
       |    regexp_replace($textCol, '^\\s+|\\s+$$', '', 'g'), '\\s+'), x -> x <> '')"""
      .stripMargin
  private[llm] val WordsExpr = wordsExpr("text")

  /** The PII redaction chain as DuckDB SQL, built from the SAME pattern
    * constants the engine compiles ([[TextAnalysis.scrubPii]] order:
    * email → IP → phone).
    */
  private[llm] def scrubExpr(textCol: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($textCol, '" +
      TextAnalysis.emailPattern + "', '<EMAIL>', 'g'), '" +
      TextAnalysis.ipv4Pattern + "', '<IP>', 'g'), '" +
      TextAnalysis.phonePattern + "', '<PHONE>', 'g')"

  /** [[TextAnalysis.fingerprint]] as DuckDB SQL — the exact-dedup key. */
  private[llm] def fingerprintExpr(textCol: String): String =
    s"substring(md5(trim(regexp_replace(lower($textCol), '\\s+', ' ', 'g'))), 1, 16)"

  /** The training-pipeline quality gate (token count ≥ minTokens, alpha
    * ratio ≥ minAlpha) as DuckDB SQL — mirrors TextAnalysis.tokenCount's
    * whitespace-only guard and alphaRatio's empty-text branch.
    */
  private[llm] def qualityPredSql(textCol: String, minTokens: Int,
      minAlpha: Double): String =
    s"""(CASE WHEN length(regexp_replace($textCol, '\\s', '', 'g')) = 0 THEN 0
       |   ELSE len(string_split_regex(trim($textCol), '\\s+')) END) >= $minTokens
       |  AND (CASE WHEN length($textCol) = 0 THEN 0.0
       |   ELSE CAST(length(regexp_replace(lower($textCol), '[^a-z]', '', 'g'))
       |     AS DOUBLE) / length($textCol) END) >= $minAlpha""".stripMargin

  /** Brute-force 3-shingle Jaccard near-dup pairs as a DuckDB CTE chain
    * (no WITH keyword) ending in `${p}prs` = (j) — the doc_ids an exact
    * pairwise pass marks as near-duplicates of an earlier doc. The
    * ground truth the banded MinHash-LSH engine is judged against.
    */
  private[llm] def shinglePairsChain(from: String, textCol: String,
      threshold: Double, p: String = ""): String =
    s"""${p}sh AS (SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |    for i in range(1, len(w)-1)]) AS sh
       |  FROM (SELECT doc_id, ${wordsExpr(textCol)} AS w FROM $from)
       |  WHERE len(w) >= 3),
       |${p}prs AS (SELECT b.doc_id AS j FROM ${p}sh a JOIN ${p}sh b
       |  ON a.doc_id < b.doc_id
       |  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.sh, b.sh))) >= $threshold)""".stripMargin

  /** Shared DuckDB rebuild of [[Hashing.winnow]] (3-gram md5 prefixes,
    * window-4 minima, a doc with ≤4 hashes yields its single global
    * min). ONE copy: a change to the winnowing scheme lands here and in
    * Hashing.winnow, nowhere else. Emits a CTE chain (no WITH keyword)
    * ending in `${p}u` = (keep, fp) exploded fingerprints; `p` prefixes
    * the CTE names so two instantiations can coexist in one query.
    */
  private[llm] def winnowChain(keep: String, from: String = "documents",
      textCol: String = "text", p: String = ""): String =
    s"""${p}t AS (SELECT $keep, ${wordsExpr(textCol)} AS w
       |  FROM $from),
       |${p}g AS (SELECT $keep, CASE WHEN len(w) < 3 THEN CAST([] AS VARCHAR[])
       |   ELSE [substring(md5(array_to_string(w[i:i+2], ' ')), 1, 16)
       |         for i in range(1, len(w) - 1)] END AS h
       |  FROM ${p}t),
       |${p}f AS (SELECT $keep, CASE WHEN len(h) = 0 THEN CAST([] AS VARCHAR[])
       |   WHEN len(h) <= 4 THEN [list_min(h)]
       |   ELSE list_distinct([list_min(h[i:i+3])
       |         for i in range(1, len(h) - 2)]) END AS fps
       |  FROM ${p}g),
       |${p}u AS (SELECT $keep, unnest(fps) AS fp FROM ${p}f)""".stripMargin

  private def winnowCte(keep: String): String = "WITH " + winnowChain(keep)

  /** Winnowing fingerprints (MOSS selection over md5'd word 3-grams,
    * window 4) aggregated per language: document counts, fingerprints
    * selected, distinct fingerprints. At 100 TB this is the overlap-
    * detection index build: ~2/(w+1) of the hashes survive selection, and
    * the guarantee (any shared w+n−1 = 6-word run yields a shared
    * fingerprint) is what exact dedup by full-document hash cannot give.
    */
  private val winnowing = Q(
    "text_winnowing_fingerprint",
    // single corpus pass: explode_outer keeps zero-fingerprint docs (a
    // null fp row) so doc counts survive, and the md5 winnowing UDF runs
    // exactly once — the two-branch formulation re-scanned the corpus
    // and re-hashed every 3-gram for each branch. The two distinct
    // aggregates plan through one Expand (~2× exploded rows), far
    // cheaper than a second UDF pass at corpus scale.
    (s, d) => Tables.documents(s, d)
      .select(col("lang"), col("doc_id"),
        explode_outer(TextAnalysis.winnowedFingerprints(col("text"))).as("fp"))
      .groupBy(col("lang"))
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        count(col("fp")).as("sum_fps"),
        count_distinct(col("fp")).as("n_distinct"))
      .orderBy(col("lang")),
    Some(winnowCte("lang") +
      """,
        |b AS (SELECT lang, count(*) AS n_docs,
        |   CAST(sum(len(fps)) AS BIGINT) AS sum_fps FROM f GROUP BY 1),
        |dd AS (SELECT lang, count(DISTINCT fp) AS n_distinct FROM u GROUP BY 1)
        |SELECT b.lang, n_docs, sum_fps, COALESCE(n_distinct, 0) AS n_distinct
        |FROM b LEFT JOIN dd USING (lang) ORDER BY b.lang""".stripMargin),
    headline = true)

  /** Duplicate-2-gram repetition signal per language. All verified
    * aggregates are integral (gram totals / distinct counts / max dup
    * count) — the ratio itself is FP-division-order safe only per doc, so
    * it stays in [[TextAnalysis.repetitionRatio]] + its spec.
    */
  private val repetition = Q(
    "text_repetition_ratio",
    (s, d) => Tables.documents(s, d)
      .select(col("lang"),
        TextAnalysis.bigramTotal(col("text")).as("tg"),
        TextAnalysis.bigramDistinct(col("text")).as("dg"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("tg")).as("sum_grams"),
        sum(col("dg")).as("sum_distinct"),
        max(col("tg") - col("dg")).as("max_dups"))
      .orderBy(col("lang")),
    Some(s"""WITH t AS (SELECT lang, $WordsExpr AS w
            |  FROM documents),
            |g AS (SELECT lang, greatest(len(w) - 1, 0) AS tg,
            |   CASE WHEN len(w) < 2 THEN 0
            |    ELSE len(list_distinct([w[i] || ' ' || w[i+1]
            |          for i in range(1, len(w))])) END AS dg
            |  FROM t)
            |SELECT lang, count(*) AS n, CAST(sum(tg) AS BIGINT) AS sum_grams,
            | CAST(sum(dg) AS BIGINT) AS sum_distinct,
            | CAST(max(tg - dg) AS BIGINT) AS max_dups
            |FROM g GROUP BY 1 ORDER BY 1""".stripMargin))

  /** PII scrub accounting per source: match counts per pattern class and
    * the post-redaction character total (proving the replacement itself
    * agrees across engines). The harness corpus is synthetic word soup,
    * so counts are typically zero here — planted-PII redaction behavior
    * is pinned in CorpusSpec.
    */
  private val pii = Q(
    "text_pii_scrub",
    (s, d) => Tables.documents(s, d)
      .select(col("source"),
        TextAnalysis.emailCount(col("text")).as("ec"),
        TextAnalysis.phoneCount(col("text")).as("pc"),
        TextAnalysis.ipv4Count(col("text")).as("ic"),
        length(TextAnalysis.scrubPii(col("text"))).as("sl"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("ec")).as("sum_emails"),
        sum(col("pc")).as("sum_phones"),
        sum(col("ic")).as("sum_ips"),
        sum(col("sl")).as("sum_scrub_chars"))
      .orderBy(col("source")),
    // pattern literals and the scrub chain interpolate from the SAME
    // constants the engine compiles — they cannot drift independently
    Some(s"""WITH t AS (SELECT source,
            |  len(regexp_extract_all(text, '${TextAnalysis.emailPattern}')) AS ec,
            |  len(regexp_extract_all(text, '${TextAnalysis.phonePattern}')) AS pc,
            |  len(regexp_extract_all(text, '${TextAnalysis.ipv4Pattern}')) AS ic,
            |  length(${scrubExpr("text")}) AS sl
            | FROM documents)
            |SELECT source, count(*) AS n, CAST(sum(ec) AS BIGINT) AS sum_emails,
            | CAST(sum(pc) AS BIGINT) AS sum_phones,
            | CAST(sum(ic) AS BIGINT) AS sum_ips,
            | CAST(sum(sl) AS BIGINT) AS sum_scrub_chars
            |FROM t GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Exact stratified sampling: per-stratum rank over md5(key)
    * (deterministic spread, reproducible across runs and engines), keep
    * the first ceil(fraction·|stratum|). The per-stratum window needs a
    * per-key total, so a stratum serializes through one partition — fine
    * for bounded strata (languages); open-ended strata at 100 TB should
    * use [[TextAnalysis.sampleByHash]] per group instead (approximate
    * fraction, no window, append-stable). Public so the spec exercises
    * the SAME code the registered query binds to.
    */
  def stratifiedSample(df: org.apache.spark.sql.DataFrame, strata: String,
      key: String, fraction: Double): org.apache.spark.sql.DataFrame = {
    val rankW = Window.partitionBy(col(strata))
      .orderBy(md5(col(key).cast("string")), col(key))
    val cntW = Window.partitionBy(col(strata))
    df.withColumn("_rn", row_number().over(rankW))
      .withColumn("_cnt", count(lit(1)).over(cntW))
      .filter(col("_rn") <= ceil(col("_cnt") * fraction))
      .drop("_rn", "_cnt")
  }

  private val stratified = Q(
    "text_stratified_sample",
    (s, d) => stratifiedSample(
      Tables.documents(s, d).select(col("lang"), col("doc_id")),
      "lang", "doc_id", 0.1)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("doc_id")).as("sum_ids"))
      .orderBy(col("lang")),
    Some("""WITH r AS (SELECT lang, doc_id,
           |  row_number() OVER (PARTITION BY lang
           |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
           |  count(*) OVER (PARTITION BY lang) AS cnt
           | FROM documents)
           |SELECT lang, count(*) AS n_sampled,
           | CAST(sum(doc_id) AS BIGINT) AS sum_ids
           |FROM r WHERE rn <= ceil(0.1 * cnt)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Winnowing as a dedup operator: pairs sharing ≥5 selected
    * fingerprints — contiguous-run overlap, the contamination-check
    * complement to MinHash set similarity. Bucketed by fingerprint with
    * a doc-frequency cap (mirrored in the oracle; a no-op on this corpus
    * where max df = 7).
    */
  private val winnowPairs = Q(
    "dedup_winnowing_overlap",
    (s, d) => Winnowing.overlapPairs(
      Tables.documents(s, d), "doc_id", "text", minShared = 5)
      .orderBy(col("i"), col("j")),
    Some(winnowCte("doc_id") +
      """,
        |dfc AS (SELECT fp, count(*) AS c FROM u GROUP BY 1),
        |uf AS (SELECT u.doc_id, u.fp FROM u JOIN dfc USING (fp) WHERE c <= 1000),
        |p AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS n_shared
        |  FROM uf a JOIN uf b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT i, j, CAST(n_shared AS BIGINT) AS n_shared
        |FROM p WHERE n_shared >= 5 ORDER BY i, j""".stripMargin),
    headline = true)

  /** Decontamination against an in-corpus "benchmark" (doc_id < 50
    * stands in for an eval set): corpus docs sharing ≥2 winnowed
    * fingerprints with any benchmark doc. The benchmark fingerprint set
    * broadcasts; the corpus side never shuffles.
    */
  private val decontaminate = Q(
    "dedup_decontaminate_winnow",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Winnowing.contaminated(
        docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50),
        "doc_id", "text", minShared = 2)
        .orderBy(col("id"))
    },
    Some(winnowCte("doc_id") +
      """,
        |b AS (SELECT DISTINCT fp FROM u WHERE doc_id < 50)
        |SELECT u.doc_id AS id, count(*) AS n_shared
        |FROM u JOIN b USING (fp) WHERE u.doc_id >= 50
        |GROUP BY 1 HAVING count(*) >= 2 ORDER BY 1""".stripMargin),
    headline = true)

  /** [[decontaminate]]'s scale variant: Bloom-sketch pre-filter + exact
    * verify ([[Winnowing.contaminatedBloom]]). Same oracle — the Bloom
    * filter only moves pruning earlier; the exact verify join keeps the
    * output bit-identical to the broadcast-set formulation.
    */
  private val decontaminateBloom = Q(
    "dedup_decontaminate_bloom",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Winnowing.contaminatedBloom(
        docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50),
        "doc_id", "text", minShared = 2)
        .orderBy(col("id"))
    },
    Some(winnowCte("doc_id") +
      """,
        |b AS (SELECT DISTINCT fp FROM u WHERE doc_id < 50)
        |SELECT u.doc_id AS id, count(*) AS n_shared
        |FROM u JOIN b USING (fp) WHERE u.doc_id >= 50
        |GROUP BY 1 HAVING count(*) >= 2 ORDER BY 1""".stripMargin),
    headline = true)

  /** Corpus-wide top-20 word 2-grams by document frequency (the
    * vocabulary/boilerplate-discovery heavy-hitter query). Distinct
    * grams per doc (so a looping doc can't dominate), tie-broken on
    * md5(gram) — ASCII-only, collation-safe across engines where raw
    * multilingual grams are not.
    */
  private val topNgrams = Q(
    "text_top_ngrams_df",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), explode(TextAnalysis.shingles(col("text"), 2)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, md5(col("gram")))
      .limit(20),
    Some(s"""WITH g AS (SELECT doc_id,
            |  unnest(list_distinct([w[i] || ' ' || w[i+1]
            |    for i in range(1, len(w))])) AS gram
            | FROM (SELECT doc_id, $WordsExpr AS w
            |       FROM documents)
            | WHERE len(w) >= 2)
            |SELECT gram, count(*) AS df FROM g
            |GROUP BY 1 ORDER BY df DESC, md5(gram) LIMIT 20""".stripMargin),
    headline = true)

  /** Token document-frequency profile: distinct-token vocabulary size,
    * stopword-like tokens (df > 50% of docs), and the max df — the
    * corpus statistics that drive stopword lists and IDF weighting.
    */
  private val tokenDf = Q(
    "text_token_df_stats",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      docs.select(col("doc_id"),
          explode(array_distinct(TextAnalysis.tokens(col("text")))).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocs))
        .agg(count(lit(1)).as("n_vocab"),
          sum(when(col("df") * 2 > col("n_docs"), 1).otherwise(0)).as("n_stop_like"),
          max(col("df")).as("max_df"))
    },
    Some("""WITH tok AS (SELECT doc_id, unnest(list_distinct(
           |    string_split_regex(trim(text), '\s+'))) AS tok FROM documents),
           |d AS (SELECT tok, count(*) AS df FROM tok GROUP BY 1),
           |n AS (SELECT count(*) AS n_docs FROM documents)
           |SELECT count(*) AS n_vocab,
           | CAST(sum(CASE WHEN df * 2 > n_docs THEN 1 ELSE 0 END) AS BIGINT)
           |   AS n_stop_like,
           | max(df) AS max_df
           |FROM d, n""".stripMargin))

  /** Paragraph-granularity exact dedup (the C4/RefinedWeb line-dedup
    * shape): documents split into 10-token chunks (reusing
    * [[TextAnalysis.chunkByTokens]], the oracle-proven splitter), each
    * chunk fingerprinted, and only the globally FIRST occurrence in
    * (doc_id, chunk_idx) order survives. Doc-level dedup misses the
    * boilerplate this catches: two distinct pages sharing a navigation
    * paragraph. The keep-first window partitions on the fingerprint
    * (bounded by that paragraph's duplicate count), so no global sort
    * exists anywhere; output rolls up per source.
    */
  private val paraDedup = Q(
    "docs_paragraph_dedup",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val paras = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          posexplode(TextAnalysis.chunkByTokens(col("text"), 10))
            .as(Seq("idx", "chunk")))
        .withColumn("fp", md5(col("chunk")))
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"), col("idx"))
      paras
        .withColumn("rn", row_number().over(w))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chunks")).as("n_chunks"),
          sum(col("n_kept")).as("n_kept"),
          sum(when(col("n_kept") === col("n_chunks"), 1L).otherwise(0L))
            .as("n_docs_intact"))
        .orderBy(col("source"))
    },
    Some(s"""WITH t AS (SELECT doc_id, source, $WordsExpr AS w FROM documents),
            |c AS (SELECT doc_id, source, i AS idx,
            |  array_to_string(w[(i-1)*10+1 : least(i*10, len(w))], ' ') AS chunk
            | FROM t, UNNEST(range(1, CAST(ceil(len(w)/10.0) AS BIGINT)+1)) AS u(i)),
            |k AS (SELECT doc_id, source,
            |  row_number() OVER (PARTITION BY md5(chunk)
            |    ORDER BY doc_id, idx) AS rn
            | FROM c),
            |pd AS (SELECT doc_id, source, count(*) AS n_chunks,
            |   sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_kept
            |  FROM k GROUP BY 1, 2)
            |SELECT source, count(*) AS n_docs,
            | CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
            | CAST(sum(n_kept) AS BIGINT) AS n_kept,
            | CAST(sum(CASE WHEN n_kept = n_chunks THEN 1 ELSE 0 END) AS BIGINT)
            |   AS n_docs_intact
            |FROM pd GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Deterministic training-shard assignment: shard = md5-uniform of
    * doc_id mod 16 — the write-side layout step of every training run
    * (N reproducible shards, balanced by hash, no coordination). The
    * md5→BIGINT convention is the engine's standard cross-engine
    * uniform; per-shard stats verify both the assignment and balance.
    */
  private val shards = Q(
    "docs_shuffle_shards",
    (s, d) => Tables.documents(s, d)
      .withColumn("shard",
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 16)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("shard")),
    Some("""SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           |   % 16 AS shard,
           | count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           | min(doc_id) AS min_doc, max(doc_id) AS max_doc
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Decontamination METHOD agreement — the governance read before
    * trusting any single contamination gate (the [[gateKappa]] idea
    * applied to decontamination): the winnow-fingerprint drop set
    * (shared-run evidence, ≥ 2 shared window-min fingerprints) vs the
    * 5-gram-fraction drop set (≥ 10% of a doc's distinct 5-grams hit
    * the benchmark), as one full-outer flag join — set sizes, overlap,
    * Jaccard in integer bp, and id-sums pinning each region's exact
    * membership. Both member pipelines keep their own oracled scale
    * shapes (broadcast fingerprint sets, map-side-combined counts);
    * the agreement layer is one doc-keyed join over two drop-set
    * frames, each already corpus-filtered small.
    */
  private val decontamAgreement = Q(
    "dedup_decontam_method_agreement",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val d1 = Winnowing.contaminated(
          docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50),
          "doc_id", "text", minShared = 2)
        .select(col("id").as("doc_id"), lit(1L).as("in_winnow"))
      def grams(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"),
          explode(TextAnalysis.shingles(col("text"), 5)).as("g"))
        .select(col("doc_id"), substring(md5(col("g")), 1, 16).as("fp"))
      val bench = grams(docs.filter(col("doc_id") < 50))
        .select(col("fp")).distinct().withColumn("hit", lit(1))
      val d2 = grams(docs.filter(col("doc_id") >= 50))
        .join(broadcast(bench), Seq("fp"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
        .filter(expr("n_hit * 10000 div n_grams") >= 1000)
        .select(col("doc_id"), lit(1L).as("in_frac"))
      d1.join(d2, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("in_winnow"), lit(0L)).as("w"),
          coalesce(col("in_frac"), lit(0L)).as("f"))
        .agg(coalesce(sum(col("w")), lit(0L)).as("n_winnow"),
          coalesce(sum(col("f")), lit(0L)).as("n_frac"),
          coalesce(sum(col("w") * col("f")), lit(0L)).as("n_both"),
          coalesce(sum(when(col("w") === 1 && col("f") === 0,
            col("doc_id"))), lit(0L)).as("sum_winnow_only_ids"),
          coalesce(sum(when(col("w") === 0 && col("f") === 1,
            col("doc_id"))), lit(0L)).as("sum_frac_only_ids"),
          coalesce(sum(when(col("w") === 1 && col("f") === 1,
            col("doc_id"))), lit(0L)).as("sum_both_ids"))
        .withColumn("jaccard_bp",
          when(col("n_winnow") + col("n_frac") - col("n_both") > 0,
            expr("(n_both * 10000) div (n_winnow + n_frac - n_both)")))
    },
    Some(s"""WITH ${winnowChain("doc_id")},
            |wb AS (SELECT DISTINCT fp FROM u WHERE doc_id < 50),
            |w1 AS (SELECT u.doc_id FROM u JOIN wb USING (fp)
            |  WHERE u.doc_id >= 50 GROUP BY 1 HAVING count(*) >= 2),
            |qt AS (SELECT doc_id, $WordsExpr AS w FROM documents),
            |qg AS (SELECT doc_id, unnest(list_distinct(
            |   [w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
            |    for i in range(1, len(w)-3)])) AS gram
            |  FROM qt WHERE len(w) >= 5),
            |qf AS (SELECT doc_id, substring(md5(gram), 1, 16) AS fp FROM qg),
            |qb AS (SELECT DISTINCT fp FROM qf WHERE doc_id < 50),
            |w2 AS (SELECT qf.doc_id FROM qf LEFT JOIN qb ON qf.fp = qb.fp
            |  WHERE qf.doc_id >= 50 GROUP BY 1
            |  HAVING (CAST(count(qb.fp) AS BIGINT) * 10000) // count(*)
            |    >= 1000),
            |fl AS (SELECT COALESCE(w1.doc_id, w2.doc_id) AS doc_id,
            |  CASE WHEN w1.doc_id IS NOT NULL THEN 1 ELSE 0 END AS w,
            |  CASE WHEN w2.doc_id IS NOT NULL THEN 1 ELSE 0 END AS f
            | FROM w1 FULL OUTER JOIN w2 ON w1.doc_id = w2.doc_id),
            |ag AS (SELECT
            |  CAST(COALESCE(sum(w), 0) AS BIGINT) AS n_winnow,
            |  CAST(COALESCE(sum(f), 0) AS BIGINT) AS n_frac,
            |  CAST(COALESCE(sum(w * f), 0) AS BIGINT) AS n_both,
            |  CAST(COALESCE(sum(CASE WHEN w = 1 AND f = 0 THEN doc_id END),
            |    0) AS BIGINT) AS sum_winnow_only_ids,
            |  CAST(COALESCE(sum(CASE WHEN w = 0 AND f = 1 THEN doc_id END),
            |    0) AS BIGINT) AS sum_frac_only_ids,
            |  CAST(COALESCE(sum(CASE WHEN w = 1 AND f = 1 THEN doc_id END),
            |    0) AS BIGINT) AS sum_both_ids
            | FROM fl)
            |SELECT n_winnow, n_frac, n_both, sum_winnow_only_ids,
            | sum_frac_only_ids, sum_both_ids,
            | CASE WHEN n_winnow + n_frac - n_both > 0
            |  THEN (n_both * 10000) // (n_winnow + n_frac - n_both) END
            |   AS jaccard_bp
            |FROM ag""".stripMargin))

  /** Multi-epoch shuffle dispersion audit: a multi-epoch training run
    * re-shuffles the corpus per epoch with a deterministic keyed draw
    * (shard_e = md5(e:doc) mod 8 — the `docs_shuffle_shards` assignment
    * salted by the epoch), and this query answers "do consecutive
    * epochs actually decorrelate?": for every epoch pair, how many docs
    * landed in the SAME shard (expected n/8 under independence),
    * published as an exact count plus integer basis points. One corpus
    * scan computes all three epoch assignments as columns — the
    * pairwise overlap needs no join at all, which is the scale point:
    * the naive formulation self-joins the corpus per epoch pair.
    */
  private val epochOverlap = Q(
    "docs_epoch_shuffle_overlap",
    (s, d) => {
      def shard(e: Int) =
        conv(substring(md5(concat(lit(e.toString), lit(":"),
          col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long") % 8
      val agg = Tables.documents(s, d)
        .select(shard(0).as("s0"), shard(1).as("s1"), shard(2).as("s2"))
        .agg(count(lit(1)).as("n"),
          // coalesce: sum over an EMPTY corpus is null, and the oracle
          // publishes 0 — the empty-input guard convention
          coalesce(sum(when(col("s0") === col("s1"), 1L).otherwise(0L)),
            lit(0L)).as("m01"),
          coalesce(sum(when(col("s0") === col("s2"), 1L).otherwise(0L)),
            lit(0L)).as("m02"),
          coalesce(sum(when(col("s1") === col("s2"), 1L).otherwise(0L)),
            lit(0L)).as("m12"))
      agg.select(explode(array(
          struct(lit(0L).as("epoch_a"), lit(1L).as("epoch_b"),
            col("n"), col("m01").as("n_same_shard")),
          struct(lit(0L).as("epoch_a"), lit(2L).as("epoch_b"),
            col("n"), col("m02").as("n_same_shard")),
          struct(lit(1L).as("epoch_a"), lit(2L).as("epoch_b"),
            col("n"), col("m12").as("n_same_shard")))).as("p"))
        .select(col("p.epoch_a"), col("p.epoch_b"),
          col("p.n").as("n_docs"), col("p.n_same_shard"))
        .withColumn("same_bp",
          when(col("n_docs") > 0,
            expr("(n_same_shard * 10000) div n_docs")).otherwise(0L))
        .orderBy(col("epoch_a"), col("epoch_b"))
    },
    Some("""WITH sh AS (SELECT
           |  ('0x' || substring(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 15))
           |    ::BIGINT % 8 AS s0,
           |  ('0x' || substring(md5('1:' || CAST(doc_id AS VARCHAR)), 1, 15))
           |    ::BIGINT % 8 AS s1,
           |  ('0x' || substring(md5('2:' || CAST(doc_id AS VARCHAR)), 1, 15))
           |    ::BIGINT % 8 AS s2
           | FROM documents),
           |a AS (SELECT count(*) AS n,
           |  CAST(sum(CASE WHEN s0 = s1 THEN 1 ELSE 0 END) AS BIGINT) AS m01,
           |  CAST(sum(CASE WHEN s0 = s2 THEN 1 ELSE 0 END) AS BIGINT) AS m02,
           |  CAST(sum(CASE WHEN s1 = s2 THEN 1 ELSE 0 END) AS BIGINT) AS m12
           | FROM sh),
           |p AS (SELECT 0 AS epoch_a, 1 AS epoch_b, n, m01 AS ns FROM a
           | UNION ALL SELECT 0, 2, n, m02 FROM a
           | UNION ALL SELECT 1, 2, n, m12 FROM a)
           |SELECT CAST(epoch_a AS BIGINT) AS epoch_a,
           | CAST(epoch_b AS BIGINT) AS epoch_b, n AS n_docs,
           | COALESCE(ns, 0) AS n_same_shard,
           | CASE WHEN n > 0 THEN (COALESCE(ns, 0) * 10000) // n ELSE 0 END
           |   AS same_bp
           |FROM p ORDER BY 1, 2""".stripMargin))

  /** DSIR-style importance weighting (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS'23): score every
    * document by how target-like its hashed unigram distribution is,
    * weight = Σ_tokens [ln P̂_target(bucket) − ln P̂_corpus(bucket)] with
    * add-1 smoothing over B=1024 md5 buckets. Hashing the vocabulary into
    * a FIXED number of buckets is the scale move — the per-bucket
    * log-ratio table is 1024 rows at any corpus size, so the scoring join
    * broadcasts and the whole pipeline is two corpus scans (distribution
    * estimate, then scoring — DSIR's inherent two-pass shape) with
    * map-side-combined aggregations. Target set: lang='en'.
    *
    * Determinism: per-bucket log-ratios quantize to integer micro-units
    * before the per-document sum (the BM25/ANN convention), so weights
    * are exact BIGINTs — immune to summation order and ln() ulp skew.
    * The bucket-stats frame is localCheckpoint'd: the totals row and the
    * ratio table both consume it, and without the checkpoint each
    * consumer re-derives the corpus scan.
    */

  private val dsir = Q(
    "docs_dsir_importance",
    (s, d) => {
      val B = 1024
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(graft.functions.Tokenize(col("text"))).as("tok"))
        .withColumn("b",
          conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long") % B)
      val bt = toks.groupBy(col("b")).agg(
          count(lit(1)).as("c_all"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c_tgt"))
        .stageCheckpoint()
      val tot = bt.agg(sum(col("c_all")).as("ca"), sum(col("c_tgt")).as("ct"))
      val lr = bt.join(broadcast(tot))
        .select(col("b"),
          round((log((col("c_tgt") + lit(1.0)) / (col("ct") + lit(B.toDouble))) -
            log((col("c_all") + lit(1.0)) / (col("ca") + lit(B.toDouble)))) * lit(1e6))
            .cast("long").as("lr_micro"))
      toks.join(broadcast(lr), "b")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("lr_micro")).as("weight_micro"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH t AS (SELECT doc_id, lang, unnest($WordsExpr) AS tok
            |  FROM documents),
            |bk AS (SELECT doc_id, lang,
            |  ('0x' || substring(md5(tok), 1, 15))::BIGINT % 1024 AS b
            |  FROM t),
            |bt AS (SELECT b, count(*) AS c_all,
            |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_tgt
            |  FROM bk GROUP BY 1),
            |tot AS (SELECT sum(c_all) AS ca, sum(c_tgt) AS ct FROM bt),
            |lr AS (SELECT b, CAST(round((ln((c_tgt + 1.0) / (ct + 1024.0))
            |    - ln((c_all + 1.0) / (ca + 1024.0))) * 1e6) AS BIGINT)
            |    AS lr_micro
            |  FROM bt, tot)
            |SELECT doc_id, count(*) AS n_tokens,
            | CAST(sum(lr_micro) AS BIGINT) AS weight_micro
            |FROM bk JOIN lr USING (b)
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** The canonical eval-set contamination METRIC (GPT-3/PaLM style):
    * per-document FRACTION of its distinct word 5-grams that appear
    * anywhere in the benchmark (doc_id < 50, the same stand-in eval set
    * as the winnow/Bloom decontamination pair). Where those queries gate
    * on an absolute shared-fingerprint count, this reports the overlap
    * fraction itself in integer basis points — the number a curation
    * report actually publishes — and flags docs ≥ 10%. Benchmark grams
    * collapse to a broadcast md5-fingerprint set (eval sets are tiny;
    * the corpus side never shuffles grams, only per-doc counts), and the
    * division is integer, so both engines agree bit-for-bit.
    */
  private val contamFrac = Q(
    "dedup_contaminate_ngram_frac",
    (s, d) => {
      val docs = Tables.documents(s, d)
      def grams(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"),
          explode(TextAnalysis.shingles(col("text"), 5)).as("g"))
        .select(col("doc_id"), substring(md5(col("g")), 1, 16).as("fp"))
      val bench = grams(docs.filter(col("doc_id") < 50))
        .select(col("fp")).distinct().withColumn("hit", lit(1))
      grams(docs.filter(col("doc_id") >= 50))
        .join(broadcast(bench), Seq("fp"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
        .withColumn("frac_bp", expr("n_hit * 10000 div n_grams"))
        .filter(col("frac_bp") >= 1000)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH t AS (SELECT doc_id, $WordsExpr AS w FROM documents),
            |g AS (SELECT doc_id, unnest(list_distinct(
            |   [w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
            |    for i in range(1, len(w)-3)])) AS gram
            |  FROM t WHERE len(w) >= 5),
            |f AS (SELECT doc_id, substring(md5(gram), 1, 16) AS fp FROM g),
            |b AS (SELECT DISTINCT fp FROM f WHERE doc_id < 50),
            |c AS (SELECT f.doc_id, count(*) AS n_grams, count(b.fp) AS n_hit
            |  FROM f LEFT JOIN b ON f.fp = b.fp
            |  WHERE f.doc_id >= 50 GROUP BY 1)
            |SELECT doc_id, n_grams, CAST(n_hit AS BIGINT) AS n_hit,
            | (CAST(n_hit AS BIGINT) * 10000) // n_grams AS frac_bp
            |FROM c WHERE (CAST(n_hit AS BIGINT) * 10000) // n_grams >= 1000
            |ORDER BY 1""".stripMargin),
    headline = true)

  /** Perplexity-style quality scoring (the CCNet gate): an add-one-
    * smoothed BIGRAM language model fit on the corpus itself, every doc
    * scored by its mean negative log-likelihood, top-20 most-surprising
    * docs reported. The [[dsir]] integer discipline makes the compare
    * exact despite ln(): each distinct bigram's −ln P = ln(c1+V) −
    * ln(c2+1) rounds ONCE to integer micro-nats (a 1-ulp libm
    * difference cannot move the rounded value), then all per-doc math —
    * Σ k·nll, the mean via `div` — is integer. Counts are three
    * shuffles keyed on gram/word (map-side combined); the vocabulary
    * scalar broadcasts; nothing global. Per-doc bigrams keep
    * MULTIPLICITY (a looping doc must pay per occurrence) — only the
    * model table is distinct-gram-sized.
    */
  /** The bigram-LM scoring core, shared with the v5 pipeline: fit the
    * add-one-smoothed model on `docs`' (doc_id, text) and return every
    * doc's (doc_id, n_bigrams, avg_nll_micro) with the [[dsir]] integer
    * discipline (each distinct bigram's −ln P rounds ONCE to micro-nats;
    * all per-doc math is integer). */
  private[llm] def bigramNllScores(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(explode(graft.functions.Tokenize(col("text"))).as("tok"))
    val c1 = toks.groupBy(col("tok").as("w1")).agg(count(lit(1)).as("c1"))
    val vTot = toks.agg(countDistinct(col("tok")).as("v"))
    val bg = docs.select(col("doc_id"),
      explode(TextAnalysis.wordBigrams(col("text"))).as("bg"))
    val c2 = bg.groupBy(col("bg")).agg(count(lit(1)).as("n2"))
    val nll = c2
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .join(c1, "w1")
      .crossJoin(broadcast(vTot))
      .select(col("bg"),
        round((log(col("c1") + col("v")) - log(col("n2") + lit(1.0))) * 1e6)
          .cast("long").as("nll_micro"))
    bg.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("k"))
      .join(nll, "bg")
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        sum(col("k") * col("nll_micro")).as("nll_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("nll_sum div n_bigrams").as("avg_nll_micro"))
  }

  private val perplexity = Q(
    "text_bigram_perplexity",
    (s, d) => bigramNllScores(Tables.documents(s, d))
      .orderBy(col("avg_nll_micro").desc, col("doc_id"))
      .limit(20),
    Some(s"""WITH t AS (SELECT doc_id, $WordsExpr AS w FROM documents),
            |tok AS (SELECT unnest(w) AS tok FROM t),
            |c1 AS (SELECT tok AS w1, count(*) AS c1 FROM tok GROUP BY 1),
            |v AS (SELECT count(DISTINCT tok) AS v FROM tok),
            |bg AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
            |    for i in range(1, len(w))]) AS bg
            |  FROM t WHERE len(w) >= 2),
            |c2 AS (SELECT bg, count(*) AS n2 FROM bg GROUP BY 1),
            |nll AS (SELECT c2.bg, CAST(round((ln(c1.c1 + v.v)
            |    - ln(c2.n2 + 1.0)) * 1e6) AS BIGINT) AS nll_micro
            |  FROM c2 JOIN c1 ON c1.w1 = string_split(c2.bg, ' ')[1]
            |  CROSS JOIN v),
            |dbg AS (SELECT doc_id, bg, count(*) AS k FROM bg GROUP BY 1, 2),
            |sc AS (SELECT doc_id, sum(k) AS n_bigrams, sum(k * nll_micro) AS s
            |  FROM dbg JOIN nll USING (bg) GROUP BY 1)
            |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
            | CAST(s AS BIGINT) // CAST(n_bigrams AS BIGINT) AS avg_nll_micro
            |FROM sc
            |ORDER BY CAST(s AS BIGINT) // CAST(n_bigrams AS BIGINT) DESC,
            | doc_id
            |LIMIT 20""".stripMargin),
    headline = true)

  /** Batch twin of the STREAMING curation gates
    * ([[graft.streaming.DocStream]].qualityGate ∘ decontaminate — the
    * deterministic, stateless prefix of the stream chain; the keyed
    * dedup stage is spec-pinned in DocStreamSpec): the registered query
    * drives the exact library code the stream runs, so the DuckDB
    * compare oracles the streaming operator's row semantics. The
    * decontamination is the same distinct-gram hit-RATIO gate (≥ 10%)
    * as `docs_training_pipeline_v5` — the stream and the batch pipeline
    * must keep/drop identically on the same rows, which DocStreamSpec
    * pins and this oracle hash-checks cross-engine.
    */
  private val streamGatesTwin = Q(
    "stream_doc_curation_gates",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val benchFps = docs.filter(col("doc_id") < 50)
        .select(explode(TextAnalysis.shingles(col("text"), 5)).as("g"))
        .select(substring(md5(col("g")), 1, 16).as("fp")).distinct()
      graft.streaming.DocStream.decontaminate(
        graft.streaming.DocStream.qualityGate(
          docs.filter(col("doc_id") >= 50), minTokens = 10, minAlpha = 0.5),
        benchFps)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("lang"))
    },
    Some(s"""WITH c0 AS (SELECT doc_id, text, lang FROM documents
            | WHERE doc_id >= 50 AND ${qualityPredSql("text", 10, 0.5)}),
            |bt AS (SELECT $WordsExpr AS w FROM documents WHERE doc_id < 50),
            |bf AS (SELECT DISTINCT substring(md5(gram), 1, 16) AS fp
            |  FROM (SELECT unnest(list_distinct(
            |    [w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
            |     for i in range(1, len(w)-3)])) AS gram
            |   FROM bt WHERE len(w) >= 5)),
            |cg AS (SELECT doc_id, substring(md5(gram), 1, 16) AS fp
            |  FROM (SELECT doc_id, unnest(list_distinct(
            |    [w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
            |     for i in range(1, len(w)-3)])) AS gram
            |   FROM (SELECT doc_id, $WordsExpr AS w FROM c0)
            |   WHERE len(w) >= 5)),
            |hit AS (SELECT cg.doc_id FROM cg LEFT JOIN bf ON cg.fp = bf.fp
            |  GROUP BY 1 HAVING (count(bf.fp) * 10000) // count(*) >= 1000)
            |SELECT lang, count(*) AS n_docs,
            | CAST(sum(doc_id) AS BIGINT) AS sum_ids
            |FROM c0 WHERE doc_id NOT IN (SELECT doc_id FROM hit)
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Curriculum shard layout — order training data easy→hard and keep
    * shards balanced within each difficulty band (length-based
    * curriculum, the standard cheap difficulty proxy): token-count
    * deciles via the range-bucketed exact-ntile operator (one global
    * ntile, zero unpartitioned windows), md5 shard assignment within
    * each decile. Output is the bounded decile×shard grid with doc
    * counts, token mass, and the id-sum pinning exact placement — the
    * layout a curriculum-scheduled training run reads shard-by-shard.
    */
  private val curriculum = Q(
    "docs_curriculum_order",
    (s, d) => {
      import graft.ops.Checkpoints.StageCheckpoint
      val base = graft.Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("tc"))
        .stageCheckpoint()
      graft.ops.GlobalOrder.ntileBy(base, "tc", "doc_id", 10, "decile")
        .withColumn("shard",
          conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("long") % 8)
        .groupBy(col("decile"), col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tc")).as("sum_tokens"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("decile"), col("shard"))
    },
    Some("""WITH t AS (SELECT doc_id,
           |  CASE WHEN length(regexp_replace(text, '\s', '', 'g')) = 0 THEN 0
           |   ELSE len(string_split_regex(trim(text), '\s+')) END AS tc
           | FROM documents),
           |n AS (SELECT doc_id, tc,
           |  ntile(10) OVER (ORDER BY tc, doc_id) AS decile,
           |  ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           |    % 8 AS shard
           | FROM t)
           |SELECT decile, shard, count(*) AS n_docs,
           | CAST(sum(tc) AS BIGINT) AS sum_tokens,
           | CAST(sum(doc_id) AS BIGINT) AS sum_ids
           |FROM n GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Heaps' law fit — vocabulary growth V(N) ≈ K·N^β, the corpus-scale
    * companion to `text_zipf_fit` (β ≈ 0.5 for natural text; β → 1
    * flags boilerplate/ID-heavy corpora whose "vocabulary" never
    * saturates — a dedup/quality smell). Growth checkpoints are the 10
    * doc-id deciles via the exact global-ntile operator; cumulative
    * vocabulary uses the first-appearance trick (`ts_cumulative_users`'
    * rewrite: a token joins the running vocab at min(doc_id), so the
    * running DISTINCT collapses to a prefix sum of first appearances —
    * no per-prefix re-scan). The log-log regression runs over 10
    * micro-rounded-ln points (the zipf convention) with β as the one
    * identically-written double expression. Tokenization is
    * Hashing.words end-to-end — counts and vocabulary share one
    * convention.
    */
  private val heaps = Q(
    "text_heaps_law",
    (s, d) => {
      import graft.ops.Checkpoints.StageCheckpoint
      import org.apache.spark.sql.expressions.Window
      val withW = Tables.documents(s, d)
        .select(col("doc_id"), graft.functions.Tokenize(col("text")).as("w"))
        .stageCheckpoint()
      val base = withW.select(col("doc_id"), size(col("w")).cast("long").as("tc"))
      val dec = graft.ops.GlobalOrder
        .ntileBy(base, "doc_id", "doc_id", 10, "decile")
        .stageCheckpoint()
      val firstSeen = withW
        .select(col("doc_id"), explode(col("w")).as("tok"))
        .groupBy(col("tok")).agg(min(col("doc_id")).as("fd"))
      val vocabNew = firstSeen
        .join(dec.select(col("doc_id").as("fd"), col("decile")), "fd")
        .groupBy(col("decile")).agg(count(lit(1)).as("nv"))
      val perDec = dec.groupBy(col("decile"))
        .agg(sum(col("tc")).as("toks"))
        .join(vocabNew, Seq("decile"), "left")
        .select(col("decile"), col("toks"),
          coalesce(col("nv"), lit(0L)).as("nv"))
      val wc = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = perDec
        .withColumn("ct", sum(col("toks")).over(wc))
        .withColumn("cv", sum(col("nv")).over(wc))
      val pts = cum.filter(col("ct") > 0 && col("cv") > 0)
        .select(
          round(log(col("ct").cast("double")) * 1e6).cast("long").as("x"),
          round(log(col("cv").cast("double")) * 1e6).cast("long").as("y"))
      val st = pts.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      val tot = cum.agg(max(col("ct")).as("total_tokens"),
        max(col("cv")).as("total_vocab"))
      st.crossJoin(tot)
        .select(col("n").as("n_points"), col("sx"), col("sy"), col("sxy"),
          col("sxx"), col("total_tokens"), col("total_vocab"),
          ((col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")))
            .as("beta"))
    },
    Some(s"""WITH wd AS (SELECT doc_id, $WordsExpr AS w FROM documents),
            |base AS (SELECT doc_id, len(w) AS tc FROM wd),
            |dec AS (SELECT doc_id, tc,
            |   ntile(10) OVER (ORDER BY doc_id, doc_id) AS decile FROM base),
            |tok AS (SELECT doc_id, unnest(w) AS tok FROM wd),
            |fs AS (SELECT tok, min(doc_id) AS fd FROM tok GROUP BY 1),
            |vn AS (SELECT d.decile, count(*) AS nv
            |  FROM fs f JOIN dec d ON f.fd = d.doc_id GROUP BY 1),
            |td AS (SELECT decile, CAST(sum(tc) AS BIGINT) AS toks
            |  FROM dec GROUP BY 1),
            |pd AS (SELECT td.decile, toks, COALESCE(nv, 0) AS nv
            |  FROM td LEFT JOIN vn ON td.decile = vn.decile),
            |cum AS (SELECT decile,
            |   CAST(sum(toks) OVER (ORDER BY decile ROWS BETWEEN
            |     UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ct,
            |   CAST(sum(nv) OVER (ORDER BY decile ROWS BETWEEN
            |     UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cv
            |  FROM pd),
            |pts AS (SELECT
            |   CAST(round(ln(CAST(ct AS DOUBLE)) * 1e6) AS BIGINT) AS x,
            |   CAST(round(ln(CAST(cv AS DOUBLE)) * 1e6) AS BIGINT) AS y
            |  FROM cum WHERE ct > 0 AND cv > 0),
            |st AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
            |   CAST(sum(y) AS BIGINT) AS sy,
            |   CAST(sum(x * y) AS BIGINT) AS sxy,
            |   CAST(sum(x * x) AS BIGINT) AS sxx FROM pts),
            |tt AS (SELECT max(ct) AS total_tokens, max(cv) AS total_vocab
            |  FROM cum)
            |SELECT n AS n_points, sx, sy, sxy, sxx,
            | total_tokens, total_vocab,
            | (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            |  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta
            |FROM st, tt""".stripMargin),
    headline = true)

  /** Per-source unigram KL divergence from the corpus distribution —
    * the domain-shift score (which sources speak a different language
    * than the blend? the mT5/DoReMi mixing diagnostic, and the
    * corpus-level cousin of `docs_dsir_importance`'s per-doc weights).
    * KL(p_s‖q) = Σ_t p_s(t)·ln(p_s(t)/q(t)); published SCALED by the
    * source's token count so every term is an integer product:
    * N_s·KL = Σ_t c_st·ln((c_st/N_s)/(c_t/N)) — DIVIDE-first inside
    * the log (identically written in both engines), never the c_st·N
    * integer product, which at web-corpus scale (N ~ 1e10) would wrap
    * Long silently in Spark while DuckDB raises — with each per-TERM
    * log micro-rounded once (the zipf/perplexity convention) and the
    * weighted sum an exact BIGINT from there. Smoothing-free by
    * construction (c_st ≤ c_t guarantees finite terms). One explode,
    * two keyed aggregations, a broadcast-sized totals join.
    */
  private val klDivergence = Q(
    "text_kl_source_divergence",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"), explode(graft.functions.Tokenize(col("text"))).as("tok"))
      val bySrc = toks.groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c_st"))
      val byTok = bySrc.groupBy(col("tok")).agg(sum(col("c_st")).as("c_t"))
      val nSrc = bySrc.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
      val nTot = byTok.agg(sum(col("c_t")).as("n"))
      bySrc.join(byTok, "tok")
        .join(broadcast(nSrc), "source")
        .crossJoin(broadcast(nTot))
        .select(col("source"), col("n_s"), col("c_st"),
          round(log((col("c_st").cast("double") / col("n_s").cast("double"))
            / (col("c_t").cast("double") / col("n").cast("double"))) * 1e6)
            .cast("long").as("ln_micro"))
        .groupBy(col("source"))
        .agg(max(col("n_s")).as("n_tokens"),
          count(lit(1)).as("vocab"),
          sum(col("c_st") * col("ln_micro")).as("kl_scaled_micro"))
        .orderBy(col("source"))
    },
    Some(s"""WITH tok AS (SELECT source, unnest($WordsExpr) AS tok
            |  FROM documents),
            |bs AS (SELECT source, tok, count(*) AS c_st
            |  FROM tok GROUP BY 1, 2),
            |bt AS (SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t
            |  FROM bs GROUP BY 1),
            |ns AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s
            |  FROM bs GROUP BY 1),
            |nt AS (SELECT CAST(sum(c_t) AS BIGINT) AS n FROM bt),
            |terms AS (SELECT bs.source, ns.n_s, bs.c_st,
            |   CAST(round(ln((CAST(bs.c_st AS DOUBLE)
            |       / CAST(ns.n_s AS DOUBLE))
            |     / (CAST(bt.c_t AS DOUBLE) / CAST(nt.n AS DOUBLE)))
            |    * 1e6) AS BIGINT) AS ln_micro
            |  FROM bs JOIN bt USING (tok) JOIN ns USING (source)
            |  CROSS JOIN nt)
            |SELECT source, max(n_s) AS n_tokens, count(*) AS vocab,
            | CAST(sum(c_st * ln_micro) AS BIGINT) AS kl_scaled_micro
            |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin))

  /** The Gopher quality-rule battery (Rae et al. 2021 §A.1.1) as a
    * per-source audit — the standard pre-training document gate set
    * run before any model-based filtering: word-count bounds [50, 1e5],
    * mean word length in [3, 10], symbol-to-word ratio (#/ellipsis)
    * ≤ 0.1, ≤ 90% bullet-led lines, ≤ 30% ellipsis-ended lines, ≥ 80%
    * of words containing an alphabetic character, and ≥ 2 distinct
    * members of Gopher's stop-word octet. Every rule is evaluated in
    * INTEGER arithmetic (ratio thresholds cleared of division:
    * 10·nsym > nw, 10·nalpha < 8·nw, …) so the per-source fail counts
    * and the pass-all count compare exactly. One corpus pass: the word
    * array comes from the codegen [[graft.functions.Tokenize]], word
    * characters from one whitespace-strip length (total non-ws chars ==
    * total word chars by the maximal-run definition), lines from the
    * shared split convention (edge empties kept in both engines).
    */
  private val gopherGates = Q(
    "docs_gopher_gates",
    (s, d) => {
      // NULL text normalizes to '' up front (both engines): Tokenize's
      // empty-array null contract and WordsExpr's NULL list would
      // otherwise send the same row down different CASE branches.
      val txt = coalesce(col("text"), lit(""))
      val w = graft.functions.Tokenize(txt)
      val lines = split(txt, "\n")
      val stops = array(Seq("the", "be", "to", "of", "and", "that",
        "have", "with").map(lit): _*)
      val t = Tables.documents(s, d).select(col("source"),
        size(w).as("nw"),
        length(regexp_replace(txt, "[ \t\n\f\r]", ""))
          .as("wchars"),
        size(filter(w, x => x.rlike("[a-zA-Z]"))).as("nalpha"),
        (length(txt)
          - length(regexp_replace(txt, "#", ""))
          + size(regexp_extract_all(txt,
              lit("\\.\\.\\.|…"), lit(0)))).as("nsym"),
        size(lines).as("nlines"),
        size(filter(lines, l => l.startsWith("- ") ||
          l.startsWith("* ") || l.startsWith("•"))).as("nbul"),
        size(filter(lines, l => l.endsWith("...") || l.endsWith("…")))
          .as("nell"),
        size(array_intersect(w, stops)).as("nstop"))
      t.select(col("source"),
          (col("nw") < 50 || col("nw") > 100000L).cast("long").as("f_wc"),
          (col("nw") === 0 || col("wchars") < lit(3) * col("nw") ||
            col("wchars") > lit(10) * col("nw")).cast("long").as("f_mwl"),
          (lit(10) * col("nsym") > col("nw")).cast("long").as("f_sym"),
          (lit(10) * col("nbul") > lit(9) * col("nlines")).cast("long")
            .as("f_bul"),
          (lit(10) * col("nell") > lit(3) * col("nlines")).cast("long")
            .as("f_ell"),
          (lit(10) * col("nalpha") < lit(8) * col("nw")).cast("long")
            .as("f_alpha"),
          (col("nstop") < 2).cast("long").as("f_stop"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("f_wc")).as("n_fail_wordcount"),
          sum(col("f_mwl")).as("n_fail_meanwordlen"),
          sum(col("f_sym")).as("n_fail_symbolratio"),
          sum(col("f_bul")).as("n_fail_bulletlines"),
          sum(col("f_ell")).as("n_fail_ellipsislines"),
          sum(col("f_alpha")).as("n_fail_alphawords"),
          sum(col("f_stop")).as("n_fail_stopwords"),
          sum(when(col("f_wc") + col("f_mwl") + col("f_sym") +
            col("f_bul") + col("f_ell") + col("f_alpha") +
            col("f_stop") === 0, 1L).otherwise(0L)).as("n_pass_all"))
        .orderBy(col("source"))
    },
    Some(s"""WITH d0 AS (SELECT source, coalesce(text, '') AS text
            |  FROM documents),
            |t AS (SELECT source, $WordsExpr AS w,
            |   length(regexp_replace(text, '[ \\t\\n\\f\\r]', '', 'g'))
            |     AS wchars,
            |   length(text) - length(replace(text, '#', ''))
            |     + len(regexp_extract_all(text, '\\.\\.\\.|…')) AS nsym,
            |   string_split(text, chr(10)) AS ln
            |  FROM d0),
            |g AS (SELECT source, len(w) AS nw, wchars, nsym,
            |   len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
            |     AS nalpha,
            |   len(ln) AS nlines,
            |   len(list_filter(ln, x -> starts_with(x, '- ')
            |     OR starts_with(x, '* ') OR starts_with(x, '•'))) AS nbul,
            |   len(list_filter(ln, x -> ends_with(x, '...')
            |     OR ends_with(x, '…'))) AS nell,
            |   len(list_intersect(w, ['the','be','to','of','and','that',
            |     'have','with'])) AS nstop
            |  FROM t),
            |f AS (SELECT source,
            |   CASE WHEN nw < 50 OR nw > 100000 THEN 1 ELSE 0 END AS f_wc,
            |   CASE WHEN nw = 0 OR wchars < 3 * nw OR wchars > 10 * nw
            |    THEN 1 ELSE 0 END AS f_mwl,
            |   CASE WHEN 10 * nsym > nw THEN 1 ELSE 0 END AS f_sym,
            |   CASE WHEN 10 * nbul > 9 * nlines THEN 1 ELSE 0 END AS f_bul,
            |   CASE WHEN 10 * nell > 3 * nlines THEN 1 ELSE 0 END AS f_ell,
            |   CASE WHEN 10 * nalpha < 8 * nw THEN 1 ELSE 0 END AS f_alpha,
            |   CASE WHEN nstop < 2 THEN 1 ELSE 0 END AS f_stop
            |  FROM g)
            |SELECT source, count(*) AS n_docs,
            | CAST(sum(f_wc) AS BIGINT) AS n_fail_wordcount,
            | CAST(sum(f_mwl) AS BIGINT) AS n_fail_meanwordlen,
            | CAST(sum(f_sym) AS BIGINT) AS n_fail_symbolratio,
            | CAST(sum(f_bul) AS BIGINT) AS n_fail_bulletlines,
            | CAST(sum(f_ell) AS BIGINT) AS n_fail_ellipsislines,
            | CAST(sum(f_alpha) AS BIGINT) AS n_fail_alphawords,
            | CAST(sum(f_stop) AS BIGINT) AS n_fail_stopwords,
            | CAST(sum(CASE WHEN f_wc + f_mwl + f_sym + f_bul + f_ell
            |     + f_alpha + f_stop = 0 THEN 1 ELSE 0 END) AS BIGINT)
            |   AS n_pass_all
            |FROM f GROUP BY 1 ORDER BY 1""".stripMargin))

  /** CCNet-style perplexity partition (Wenzek et al., LREC'20 — the
    * head/middle/tail split every crawl-curation pipeline applies
    * before mixing): score each document with the corpus bigram LM
    * ([[bigramNllScores]] — integer micro-nat NLL, the determinism
    * spine of the perplexity family), cut the population into exact
    * terciles with the range-bucketed global-ntile operator (NO
    * unpartitioned window — the `rfm_customer_segments` machinery),
    * and publish the per-bucket profile a mixing recipe reads: doc
    * count, bigram mass, NLL range, and the id-sum pinning exact
    * membership. Bucket 1 is the fluent "head" a quality-weighted
    * sampler oversamples; bucket 3 the tail it prunes. Scale: scoring
    * is the two-scan DSIR shape, the tercile assignment two extra jobs
    * with ≤64 scalars of driver state, the output 3 rows.
    */
  private val ccnetBuckets = Q(
    "docs_ccnet_perplexity_buckets",
    (s, d) => {
      // staged: ntileBy runs two actions (cut sketch + bucket counts)
      // and the final pass a third — without the checkpoint each would
      // re-derive the whole bigram-LM scoring
      val scores = bigramNllScores(Tables.documents(s, d)).stageCheckpoint()
      graft.ops.GlobalOrder
        .ntileBy(scores, "avg_nll_micro", "doc_id", 3, out = "bucket")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bigrams")).as("sum_bigrams"),
          min(col("avg_nll_micro")).as("min_nll_micro"),
          max(col("avg_nll_micro")).as("max_nll_micro"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("bucket"))
    },
    Some(s"""WITH t AS (SELECT doc_id, $WordsExpr AS w FROM documents),
            |tok AS (SELECT unnest(w) AS tok FROM t),
            |c1 AS (SELECT tok AS w1, count(*) AS c1 FROM tok GROUP BY 1),
            |v AS (SELECT count(DISTINCT tok) AS v FROM tok),
            |bg AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
            |    for i in range(1, len(w))]) AS bg
            |  FROM t WHERE len(w) >= 2),
            |c2 AS (SELECT bg, count(*) AS n2 FROM bg GROUP BY 1),
            |nll AS (SELECT c2.bg, CAST(round((ln(c1.c1 + v.v)
            |    - ln(c2.n2 + 1.0)) * 1e6) AS BIGINT) AS nll_micro
            |  FROM c2 JOIN c1 ON c1.w1 = string_split(c2.bg, ' ')[1]
            |  CROSS JOIN v),
            |dbg AS (SELECT doc_id, bg, count(*) AS k FROM bg GROUP BY 1, 2),
            |sc AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
            |  CAST(sum(k * nll_micro) AS BIGINT)
            |    // CAST(sum(k) AS BIGINT) AS avg_nll_micro
            |  FROM dbg JOIN nll USING (bg) GROUP BY 1),
            |tiled AS (SELECT doc_id, n_bigrams, avg_nll_micro,
            |  ntile(3) OVER (ORDER BY avg_nll_micro, doc_id) AS bucket
            |  FROM sc)
            |SELECT bucket, count(*) AS n_docs,
            | CAST(sum(n_bigrams) AS BIGINT) AS sum_bigrams,
            | min(avg_nll_micro) AS min_nll_micro,
            | max(avg_nll_micro) AS max_nll_micro,
            | CAST(sum(doc_id) AS BIGINT) AS sum_ids
            |FROM tiled GROUP BY 1 ORDER BY 1""".stripMargin))

  /** N-gram novelty curve over the training-shard order — the
    * diminishing-returns diagnostic behind "is another crawl snapshot
    * worth ingesting": with shards 0..7 as arrival order (the
    * `docs_shuffle_shards` md5 assignment), a shard's novelty is the
    * fraction of its distinct 5-gram shingles whose FIRST corpus-wide
    * occurrence is that shard. The first-seen attribution is one
    * min-aggregation keyed by gram (map-side combined), joined back on
    * the same gram key — two shuffles on the gram domain and a
    * pure-integer basis-point ratio; no pairwise shard comparison
    * anywhere, so the curve costs the same two scans whether there are
    * 8 shards or 8,000 snapshots.
    */
  private val noveltyCurve = Q(
    "text_ngram_novelty_curve",
    (s, d) => {
      val g = Tables.documents(s, d)
        .withColumn("shard",
          conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("long") % 8)
        .select(col("shard"),
          explode(TextAnalysis.shingles(col("text"), 5)).as("gram"))
        .distinct()
        // consumed by both the first-seen aggregation and the join probe
        .stageCheckpoint()
      val first = g.groupBy(col("gram")).agg(min(col("shard")).as("first_shard"))
      g.join(first, "gram")
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_distinct_grams"),
          sum(when(col("shard") === col("first_shard"), 1L).otherwise(0L))
            .as("n_novel"))
        .withColumn("novel_bp",
          expr("n_novel * 10000 div n_distinct_grams"))
        .orderBy(col("shard"))
    },
    Some(s"""WITH t AS (SELECT
            |  ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            |    % 8 AS shard, $WordsExpr AS w
            | FROM documents),
            |g AS (SELECT DISTINCT shard,
            |  unnest([w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
            |    for i in range(1, len(w) - 3)]) AS gram
            |  FROM t WHERE len(w) >= 5),
            |f AS (SELECT gram, min(shard) AS first_shard FROM g GROUP BY 1)
            |SELECT shard, count(*) AS n_distinct_grams,
            | CAST(sum(CASE WHEN shard = first_shard THEN 1 ELSE 0 END)
            |   AS BIGINT) AS n_novel,
            | CAST(sum(CASE WHEN shard = first_shard THEN 1 ELSE 0 END)
            |   AS BIGINT) * 10000 // count(*) AS novel_bp
            |FROM g JOIN f USING (gram)
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Length-bucketed inference batch planning — the dynamic-batching
    * layout step a serving/eval fleet runs before tokenizing 100 TB of
    * prompts: documents bucket by the smallest power-of-two width that
    * holds their token count (capped at the 16,384-token context;
    * longer docs truncate to the cap), each batch packs
    * C div width same-width docs against a C = 16,384-token budget,
    * and the output profiles every bucket: batch count, the padding
    * tokens the power-of-two rounding wastes, and utilization in basis
    * points. The width exponent is pure integer arithmetic —
    * length(bin(tc−1)) is the bit length both engines agree on, no
    * float log2 near a power-of-two boundary. One scan, one
    * ≤15-group aggregation; the per-group math is integral.
    */
  private val lengthBuckets = Q(
    "docs_length_bucket_batching",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(graft.functions.Tokenize(col("text"))).as("tc"))
        .filter(col("tc") >= 1)
        .withColumn("e", expr(
          "least(CASE WHEN tc <= 1 THEN 0 ELSE length(bin(tc - 1)) END, 14)"))
        .withColumn("width", expr("CAST(pow(2, e) AS BIGINT)"))
        .withColumn("fit", expr("least(CAST(tc AS BIGINT), width)"))
      docs.groupBy(col("width"))
        .agg(count(lit(1)).as("n_docs"),
          min(expr("16384 div width")).as("docs_per_batch"),
          sum(col("fit")).as("sum_tokens"),
          sum(col("width") - col("fit")).as("pad_tokens"))
        .withColumn("n_batches",
          expr("(n_docs + docs_per_batch - 1) div docs_per_batch"))
        .withColumn("util_bp", expr(
          "sum_tokens * 10000 div (n_batches * docs_per_batch * width)"))
        .orderBy(col("width"))
    },
    Some(s"""WITH t AS (SELECT doc_id, len($WordsExpr) AS tc FROM documents),
            |b AS (SELECT doc_id, tc,
            |  CAST(pow(2, least(CASE WHEN tc <= 1 THEN 0
            |    ELSE length(bin(tc - 1)) END, 14)) AS BIGINT) AS width
            |  FROM t WHERE tc >= 1),
            |w AS (SELECT width, doc_id,
            |  least(CAST(tc AS BIGINT), width) AS fit FROM b),
            |g AS (SELECT width, count(*) AS n_docs,
            |  min(16384 // width) AS docs_per_batch,
            |  CAST(sum(fit) AS BIGINT) AS sum_tokens,
            |  CAST(sum(width - fit) AS BIGINT) AS pad_tokens
            | FROM w GROUP BY 1)
            |SELECT width, n_docs, docs_per_batch, sum_tokens, pad_tokens,
            | (n_docs + docs_per_batch - 1) // docs_per_batch AS n_batches,
            | sum_tokens * 10000 // (((n_docs + docs_per_batch - 1)
            |   // docs_per_batch) * docs_per_batch * width) AS util_bp
            |FROM g ORDER BY width""".stripMargin))

  val qs: Seq[Q] = Seq(winnowing, repetition, pii, stratified, winnowPairs,
    decontaminate, decontaminateBloom, topNgrams, tokenDf, paraDedup, shards,
    dsir, contamFrac, perplexity, streamGatesTwin, curriculum, heaps,
    klDivergence, gopherGates, ccnetBuckets, noveltyCurve, lengthBuckets,
    epochOverlap, decontamAgreement)
}
