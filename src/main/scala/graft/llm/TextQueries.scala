package graft.llm

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis queries over the `documents` table, each oracle-checked
  * against an independent DuckDB reimplementation of the same semantics.
  * Aggregates stay in exact arithmetic (counts, integral sums, min/max of
  * identically-derived doubles) — no rounding flakes.
  */
object TextQueries extends QueryPack {

  private val tokenStats = Q(
    "text_token_stats",
    (s, d) => {
      val t = Tables.documents(s, d)
        .select(col("lang"), TextAnalysis.tokenCount(col("text")).as("tc"),
          col("n_chars"))
      t.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("tc")).as("sum_tokens"),
          min(col("tc")).as("min_tokens"), max(col("tc")).as("max_tokens"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"))
    },
    Some("""WITH t AS (SELECT lang,
           |  CASE WHEN length(regexp_replace(text, '\s', '', 'g')) = 0 THEN 0
           |   ELSE len(string_split_regex(trim(text), '\s+')) END AS tc, n_chars
           | FROM documents)
           |SELECT lang, count(*) AS n, CAST(sum(tc) AS BIGINT) AS sum_tokens,
           | min(tc) AS min_tokens, max(tc) AS max_tokens,
           | CAST(sum(n_chars) AS BIGINT) AS sum_chars
           |FROM t GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** Sequence packing for pretraining: concatenate each language's
    * documents in doc_id order into one token stream, slice it into
    * fixed-size context windows, and report the packing geometry (window
    * count, boundary-straddling docs, tail padding). This is the
    * concat-then-chunk packing real LLM data pipelines run after
    * curation; the cumulative offset is ONE window-function pass (no
    * iteration — greedy "close the bin early" packing is sequential by
    * nature, concat-then-chunk is the parallelizable form that also
    * wastes zero tokens). All outputs are integer arithmetic on token
    * counts, so the DuckDB rebuild matches exactly.
    *
    * At 100 TB the per-language window partitionBy is the scale knob:
    * packing is embarrassingly parallel across languages (or any
    * coarser shard key), and within one partition the running sum is the
    * same single sort Spark's window operator already does.
    */
  private val packWindows = Q(
    "docs_pack_windows",
    (s, d) => {
      val ctx = 512
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("tok"))
        .withColumn("end_off", sum(col("tok")).over(w))
        .withColumn("start_off", col("end_off") - col("tok"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok")).as("total_tokens"),
          floor((sum(col("tok")) + lit(ctx - 1)) / lit(ctx)).as("n_windows"),
          sum(when(col("tok") > 0 &&
            floor(col("start_off") / ctx) =!= floor((col("end_off") - 1) / ctx), 1L)
            .otherwise(0L)).as("n_straddling"),
          (floor((sum(col("tok")) + lit(ctx - 1)) / lit(ctx)) * ctx
            - sum(col("tok"))).as("tail_padding"))
        .orderBy(col("lang"))
    },
    Some("""WITH t AS (SELECT doc_id, lang,
           |  CASE WHEN length(regexp_replace(text, '\s', '', 'g')) = 0 THEN 0
           |   ELSE len(string_split_regex(trim(text), '\s+')) END AS tok
           | FROM documents),
           |s AS (SELECT lang, tok,
           |  sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
           |    ROWS UNBOUNDED PRECEDING) AS end_off
           | FROM t)
           |SELECT lang, count(*) AS n_docs,
           | CAST(sum(tok) AS BIGINT) AS total_tokens,
           | CAST(floor((sum(tok) + 511) / 512.0) AS BIGINT) AS n_windows,
           | CAST(sum(CASE WHEN tok > 0 AND
           |    floor((end_off - tok) / 512.0) <> floor((end_off - 1) / 512.0)
           |   THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling,
           | CAST(floor((sum(tok) + 511) / 512.0) AS BIGINT) * 512
           |   - CAST(sum(tok) AS BIGINT) AS tail_padding
           |FROM s GROUP BY 1 ORDER BY 1""".stripMargin),
    headline = true)

  /** BPE tokenizer-training's inner loop, distributed: count adjacent
    * character-pair frequencies across the corpus — the statistic whose
    * argmax is the next merge rule. One explode chain (words →
    * char pairs) into a partial-aggregated count; at 100 TB this is the
    * canonical map-side-combine shape (the pair alphabet is tiny, so
    * partial aggregation collapses each task's output to ≤ |pairs|
    * rows before the shuffle). Restricted to [a-z]+ words so the pair
    * strings are pure ASCII (cross-engine collation-safe ordering).
    */
  private val bpePairs = Q(
    "text_bpe_pair_counts",
    (s, d) => Tables.documents(s, d)
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("word"))
      .select(explode(TextAnalysis.charPairs(col("word"))).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20),
    Some("""WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))
           |   AS word FROM documents),
           |p AS (SELECT unnest([word[i:i+1] for i in range(1, len(word))]) AS pair
           | FROM w WHERE len(word) >= 2)
           |SELECT pair, count(*) AS n FROM p
           |GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""".stripMargin))

  /** The full BPE TRAINING loop (Sennrich et al. 2016), distributed —
    * [[bpePairs]] is one iteration's statistic; this runs the actual
    * algorithm: 10 merge rounds, each = weighted adjacent-pair count
    * over the current segmentation → deterministic argmax (count desc,
    * then the ASCII "l r" pair string — identical to (l, r)
    * lexicographic for space-free tokens) → greedy left-to-right
    * non-overlapping merge of that pair in every word. The engine
    * trains on the WORD-FREQUENCY table, not the corpus: after one
    * corpus pass the state is |vocab| rows (the standard BPE trick —
    * at 100 TB the corpus is read once and ten tiny vocab-frame
    * rounds follow), each round stageCheckpointed so plans stay flat.
    * The greedy merge is a single fold (merged tokens never re-match
    * as the LEFT of the same pair in one pass — "aaaa" → "aa aa"),
    * expressed identically as the JVM fold here and a `list_reduce`
    * string fold in the 10-round unrolled DuckDB oracle. Output: the
    * learned merge table (rank, l, r, merged, weighted count) — the
    * artifact a tokenizer ships.
    *
    * Shared by [[bpeTrain]] (emits the merge table) and [[bpeStats]]
    * (consumes the final segmentation): returns (final seg frame
    * (word, freq, s), per-round merge rows).
    */
  private def bpeLoop(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.DataFrame]) = {
    import graft.ops.Checkpoints.StageCheckpoint
    val mergeU = udf { (segs: Seq[String], l: String, r: String) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      segs.foreach { t =>
        if (out.nonEmpty && out.last == l && t == r)
          out(out.length - 1) = l + r
        else out += t
      }
      out.toSeq
    }
    val vocab = Tables.documents(s, d)
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("s", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .stageCheckpoint()
    var seg = vocab
    var merges = Seq.empty[org.apache.spark.sql.DataFrame]
    for (i <- 1 to 10) {
      val best = seg
        .select(col("freq"), explode(expr(
          """transform(slice(s, 1, size(s) - 1),
            |  (x, j) -> concat(x, ' ', element_at(s, j + 2)))"""
            .stripMargin)).as("pr"))
        .groupBy(col("pr")).agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("pr")).limit(1)
        .select(expr("split_part(pr, ' ', 1)").as("l"),
          expr("split_part(pr, ' ', 2)").as("r"), col("c"))
      merges = merges :+ best.select(lit(i.toLong).as("rank"),
        col("l"), col("r"), concat(col("l"), col("r")).as("merged"),
        col("c").as("pair_count"))
      // LEFT join, not a cross join: once the vocabulary runs out of
      // adjacent pairs `best` is EMPTY, and a cross join would erase
      // the segmentation (and null out [[bpeStats]]' totals) — a null
      // merge pair folds every word through unchanged instead.
      seg = seg.join(broadcast(best), lit(true), "left")
        .select(col("word"), col("freq"),
          mergeU(col("s"), col("l"), col("r")).as("s"))
        .stageCheckpoint()
    }
    (seg, merges)
  }

  /** The shared DuckDB 10-round chain: CTEs `w, v, seg0 … seg10, m1 …
    * m10` — suffix with a final SELECT per consumer. */
  private def bpeSqlChain: String = {
    val iters = (1 to 10).map { i =>
      val prev = if (i == 1) "seg0" else s"seg${i - 1}"
      s"""p$i AS (SELECT unnest([s[j] || ' ' || s[j+1]
         |    for j in range(1, len(s))]) AS pr, freq FROM $prev),
         |m$i AS (SELECT split_part(pr, ' ', 1) AS l,
         |   split_part(pr, ' ', 2) AS r, c
         |  FROM (SELECT pr, CAST(sum(freq) AS BIGINT) AS c FROM p$i
         |   GROUP BY 1 ORDER BY c DESC, pr LIMIT 1)),
         |seg$i AS (SELECT word, freq,
         |   string_split(list_reduce(s, (a, b) ->
         |     CASE WHEN regexp_extract(a, '[^ ]+$$') = m.l AND b = m.r
         |      THEN regexp_replace(a, '[^ ]+$$', m.l || m.r)
         |      ELSE a || ' ' || b END), ' ') AS s
         |  FROM $prev LEFT JOIN m$i m ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))
       |   AS word FROM documents),
       |v AS (SELECT word, count(*) AS freq FROM w GROUP BY 1),
       |seg0 AS (SELECT word, freq,
       |   [word[j:j] for j in range(1, len(word) + 1)] AS s FROM v),
       |$iters""".stripMargin
  }

  private val bpeTrain = Q(
    "text_bpe_train_merges",
    (s, d) => bpeLoop(s, d)._2.reduce(_ unionByName _)
      .orderBy(col("rank")),
    Some {
      val rows = (1 to 10).map(i =>
        s"SELECT $i AS rank, l, r, l || r AS merged, c AS pair_count FROM m$i")
        .mkString("\nUNION ALL ")
      s"""$bpeSqlChain
         |$rows
         |ORDER BY rank""".stripMargin
    })

  /** The trained tokenizer APPLIED — the fertility/compression read
    * every tokenizer choice is judged by: after [[bpeLoop]]'s 10
    * merges, how many tokens does the corpus need? Per-corpus totals
    * (weighted by word frequency): words, characters, tokens under the
    * learned segmentation, tokens saved vs character-level, and
    * fertility in integer milli-tokens-per-word (the `div` convention).
    * Consumes the SAME loop and the SAME unrolled oracle chain as the
    * training query — one artifact, two reads.
    */
  private val bpeStats = Q(
    "text_bpe_tokenize_stats",
    (s, d) => bpeLoop(s, d)._1
      .agg(sum(col("freq")).as("n_words"),
        sum(col("freq") * length(col("word"))).as("n_chars"),
        sum(col("freq") * size(col("s"))).as("n_tokens"))
      .select(col("n_words"), col("n_chars"), col("n_tokens"),
        (col("n_chars") - col("n_tokens")).as("tokens_saved"),
        expr("(1000 * n_tokens) div n_words").as("fertility_milli")),
    Some(s"""$bpeSqlChain
            |SELECT CAST(sum(freq) AS BIGINT) AS n_words,
            | CAST(sum(freq * length(word)) AS BIGINT) AS n_chars,
            | CAST(sum(freq * len(s)) AS BIGINT) AS n_tokens,
            | CAST(sum(freq * length(word)) - sum(freq * len(s)) AS BIGINT)
            |   AS tokens_saved,
            | (1000 * CAST(sum(freq * len(s)) AS BIGINT))
            |   // CAST(sum(freq) AS BIGINT) AS fertility_milli
            |FROM seg10""".stripMargin))

  /** Spell-variant detection over the frequent vocabulary — SymSpell's
    * deletion-neighborhood trick distributed: two words are within edit
    * distance 1 iff their {word} ∪ delete-one-char sets intersect, so
    * candidate generation is a bucket join on those variants (never
    * all-pairs over the vocabulary) and exact Levenshtein verifies the
    * survivors. The vocabulary cut (top-K by frequency, word tiebreak)
    * is what a corpus normalizer actually scans for OCR/typo variants.
    * ASCII-restricted words: cross-engine collation-safe.
    *
    * This corpus's synthetic vocabulary (31 distinct words, measured)
    * contains no distance-1 pairs, so the verified result is the correct
    * EMPTY set in both engines; find-the-variant behavior is proven on
    * planted typos in TextAnalysisSpec (mirroring the
    * `dedup_embedding_cosine` pattern).
    */
  private val spellVariants = Q(
    "text_spell_variants",
    (s, d) => {
      val vocab = Tables.documents(s, d)
        .select(explode(regexp_extract_all(lower(col("text")),
          lit("[a-z]+"), lit(0))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word")).limit(200)
        .select(col("word"))
      TextAnalysis.spellVariantPairs(vocab, "word")
        .orderBy(col("w1"), col("w2"))
    },
    Some("""WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))
           |   AS word FROM documents),
           |v AS (SELECT word FROM (SELECT word, count(*) AS n FROM w GROUP BY 1
           |   ORDER BY n DESC, word LIMIT 200)),
           |p AS (SELECT a.word AS w1, b.word AS w2
           | FROM v a JOIN v b ON a.word < b.word
           | WHERE levenshtein(a.word, b.word) <= 1)
           |SELECT w1, w2 FROM p ORDER BY 1, 2""".stripMargin))

  /** Weighted sampling without replacement — the data-MIXING primitive
    * (upweight long/high-quality documents when drawing a training
    * subset): Efraimidis-Spirakis keys u^(1/w) with u a hash-derived
    * uniform, top-k by key. One scan, no RNG state — the sample is a
    * pure function of (doc_id, weight), so it is reproducible across
    * engines, retries, and partitionings, and the top-k plans as
    * per-partition heaps (TakeOrderedAndProject), never a global sort.
    * Keys quantize to 6dp before ranking (the bruteTopK convention) so
    * last-ulp pow() differences between engines cannot flip an order.
    */
  private val weightedSample = Q(
    "text_weighted_sample",
    (s, d) => {
      val w = TextAnalysis.tokenCount(col("text")).cast("double") + lit(1.0)
      // 15 hex chars of md5(doc_id) → uniform in (0,1); 16^15 = 2^60
      val v = conv(substring(md5(col("doc_id").cast("string")), 1, 15),
        16, 10).cast("double")
      val u = (v + lit(1.0)) / lit(math.pow(16.0, 15) + 1.0)
      Tables.documents(s, d)
        .select(col("doc_id"), round(pow(u, lit(1.0) / w), 6).as("k"))
        .orderBy(col("k").desc, col("doc_id"))
        .limit(20)
    },
    Some("""WITH t AS (SELECT doc_id,
           |  round(pow(
           |   (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
           |      AS BIGINT) + 1.0) / (1152921504606846976.0 + 1.0),
           |   1.0 / (1.0 + CASE WHEN length(regexp_replace(text, '\s', '', 'g')) = 0
           |     THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END)), 6)
           |   AS k
           | FROM documents)
           |SELECT doc_id, k FROM t ORDER BY k DESC, doc_id LIMIT 20""".stripMargin))

  private val quality = Q(
    "text_quality_scores",
    (s, d) => {
      val t = Tables.documents(s, d).select(col("source"),
        TextAnalysis.alphaRatio(col("text")).as("ar"),
        TextAnalysis.stopwordCount(col("text")).as("sw"),
        TextAnalysis.qualityScore(col("text")).as("qs"))
      t.groupBy(col("source"))
        .agg(count(lit(1)).as("n"), min(col("ar")).as("min_alpha"),
          max(col("ar")).as("max_alpha"), sum(col("sw")).as("sum_stopwords"),
          min(col("qs")).as("min_quality"), max(col("qs")).as("max_quality"))
        .orderBy(col("source"))
    },
    // qs replicated term-by-term: (alpha + min(len/500,1) + min(sw/5,1))/3;
    // the empty-text CASE mirrors the engine's alphaRatio 0.0 branch
    // (bare division would give NULL here vs 0.0 there)
    Some("""WITH t AS (SELECT source,
           |  CASE WHEN length(text) = 0 THEN 0.0
           |   ELSE CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
           |    / length(text) END AS ar,
           |  len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
           |    x -> x IN ('the','a','of','and','to','in','is'))) AS sw,
           |  length(text) AS lc
           | FROM documents),
           |q AS (SELECT source, ar, sw,
           |  (ar + least(CAST(lc AS DOUBLE) / 500.0, 1.0)
           |      + least(CAST(sw AS DOUBLE) / 5.0, 1.0)) / 3.0 AS qs
           | FROM t)
           |SELECT source, count(*) AS n, min(ar) AS min_alpha, max(ar) AS max_alpha,
           | CAST(sum(sw) AS BIGINT) AS sum_stopwords,
           | min(qs) AS min_quality, max(qs) AS max_quality
           |FROM q GROUP BY 1 ORDER BY 1""".stripMargin))

  /** The marker-count langid chain as DuckDB CTEs ending in
    * `p(lang, predicted)` — shared by the confusion-matrix oracle and
    * the precision/recall oracle. Ties resolve en > de > fr > es,
    * all-zero → und, mirroring TextAnalysis.langId.
    */
  private[llm] val LangidCte =
    """lt AS (SELECT lang,
      |  string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
      |lsc AS (SELECT lang,
      |  len(list_filter(w, x -> x IN ('the','a','of','and','is'))) AS s_en,
      |  len(list_filter(w, x -> x IN ('der','die','das','und','ist'))) AS s_de,
      |  len(list_filter(w, x -> x IN ('le','la','les','et','est'))) AS s_fr,
      |  len(list_filter(w, x -> x IN ('el','la','los','y','es'))) AS s_es
      | FROM lt),
      |p AS (SELECT lang, CASE
      |  WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
      |  WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
      |  WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
      |  WHEN s_es > 0 THEN 'es'
      |  ELSE 'und' END AS predicted FROM lsc)""".stripMargin

  private val langid = Q(
    "text_langid_heuristic",
    (s, d) => Tables.documents(s, d)
      .select(col("lang"), TextAnalysis.langId(col("text")).as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted")),
    Some(s"""WITH $LangidCte
           |SELECT lang, predicted, count(*) AS n
           |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Per-class precision / recall / F1 of the langid heuristic against
    * the labeled `lang` column — the classifier-evaluation layer on top
    * of the confusion matrix (`text_langid_heuristic` IS the matrix;
    * this reduces it to the numbers a model card quotes). All three
    * metrics in integer basis points from exact TP/FP/FN counts
    * (F1 = 2TP/(2TP+FP+FN) — one division, no rounded intermediate
    * precision/recall), classes taken from label ∪ prediction so a
    * never-predicted label and a never-labeled prediction ('und') both
    * surface instead of silently vanishing. Bounded |classes|² matrix
    * in, |classes| rows out.
    */
  private val langidPrf = Q(
    "text_langid_prf",
    (s, d) => {
      val cm = Tables.documents(s, d)
        .select(col("lang"), TextAnalysis.langId(col("text")).as("pred"))
        .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("n"))
      val classes = cm.select(col("lang").as("cls"))
        .unionByName(cm.select(col("pred").as("cls"))).distinct()
      val tp = cm.filter(col("lang") === col("pred"))
        .select(col("lang").as("cls"), col("n").as("tp0"))
      val predTot = cm.groupBy(col("pred").as("cls"))
        .agg(sum(col("n")).as("pred_n"))
      val actTot = cm.groupBy(col("lang").as("cls"))
        .agg(sum(col("n")).as("act_n"))
      classes
        .join(tp, Seq("cls"), "left")
        .join(predTot, Seq("cls"), "left")
        .join(actTot, Seq("cls"), "left")
        .select(col("cls"),
          coalesce(col("tp0"), lit(0L)).as("tp"),
          (coalesce(col("pred_n"), lit(0L)) - coalesce(col("tp0"), lit(0L)))
            .as("fp"),
          (coalesce(col("act_n"), lit(0L)) - coalesce(col("tp0"), lit(0L)))
            .as("fn"))
        .select(col("cls"), col("tp"), col("fp"), col("fn"),
          when(col("tp") + col("fp") > 0,
            expr("(10000 * tp) div (tp + fp)")).as("precision_bp"),
          when(col("tp") + col("fn") > 0,
            expr("(10000 * tp) div (tp + fn)")).as("recall_bp"),
          when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
            expr("(20000 * tp) div (2 * tp + fp + fn)")).as("f1_bp"))
        .orderBy(col("cls"))
    },
    Some(s"""WITH $LangidCte,
            |cm AS (SELECT lang, predicted AS pred, count(*) AS n
            |  FROM p GROUP BY 1, 2),
            |cls AS (SELECT lang AS cls FROM cm
            |  UNION SELECT pred FROM cm),
            |tp AS (SELECT lang AS cls, n AS tp0 FROM cm WHERE lang = pred),
            |pt AS (SELECT pred AS cls, CAST(sum(n) AS BIGINT) AS pred_n
            |  FROM cm GROUP BY 1),
            |at AS (SELECT lang AS cls, CAST(sum(n) AS BIGINT) AS act_n
            |  FROM cm GROUP BY 1),
            |m AS (SELECT cls.cls, COALESCE(tp0, 0) AS tp,
            |   COALESCE(pred_n, 0) - COALESCE(tp0, 0) AS fp,
            |   COALESCE(act_n, 0) - COALESCE(tp0, 0) AS fn
            |  FROM cls LEFT JOIN tp USING (cls)
            |  LEFT JOIN pt USING (cls) LEFT JOIN at USING (cls))
            |SELECT cls, tp, fp, fn,
            | CASE WHEN tp + fp > 0 THEN (10000 * tp) // (tp + fp) END
            |   AS precision_bp,
            | CASE WHEN tp + fn > 0 THEN (10000 * tp) // (tp + fn) END
            |   AS recall_bp,
            | CASE WHEN 2 * tp + fp + fn > 0
            |   THEN (20000 * tp) // (2 * tp + fp + fn) END AS f1_bp
            |FROM m ORDER BY cls""".stripMargin))

  private val fingerprintQ = Q(
    "text_fingerprint",
    (s, d) => Tables.documents(s, d)
      .select(col("lang"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), count_distinct(col("fp")).as("n_distinct"))
      .orderBy(col("lang")),
    Some("""SELECT lang, count(*) AS n,
           | count(DISTINCT substring(md5(trim(regexp_replace(lower(text),
           |   '\s+', ' ', 'g'))), 1, 16)) AS n_distinct
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin))

  private val subwords = Q(
    "text_subword_counts",
    (s, d) => {
      val t = Tables.documents(s, d).select(col("lang"),
        TextAnalysis.subwordCount(col("text")).as("sc"))
      t.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("sc")).as("sum_subwords"),
          min(col("sc")).as("min_subwords"), max(col("sc")).as("max_subwords"))
        .orderBy(col("lang"))
    },
    Some("""WITH t AS (SELECT lang,
           |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \t\n\f\r]+')) AS sc
           | FROM documents)
           |SELECT lang, count(*) AS n, CAST(sum(sc) AS BIGINT) AS sum_subwords,
           | min(sc) AS min_subwords, max(sc) AS max_subwords
           |FROM t GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Rolling-hash fingerprinting through the SQL surface: the custom
    * `poly_hash` Catalyst expression registered at runtime and invoked
    * from `spark.sql(...)` over a temp view. Oracled EXACTLY: the hash
    * runs over `md5(text)` — a 32-char ASCII hex bridge both engines
    * agree on byte-for-byte — so DuckDB rebuilds the same 2⁶⁴-wrapping
    * polynomial with a `list_reduce` over `ascii()` bytes in HUGEINT,
    * then maps to signed BIGINT. min/max compare raw 64-bit hash VALUES
    * per group, not just distinct counts. PolyHash on arbitrary UTF-8
    * (and the nfkc_lower composition) stays pinned in FunctionsSpec.
    */
  private val polyFingerprint = Q(
    "text_polyhash_fingerprint",
    (s, d) => {
      graft.functions.GraftExtensions.register(s)
      Tables.documents(s, d).createOrReplaceTempView("v_documents")
      s.sql("""SELECT lang, count(*) AS n,
              | count(DISTINCT poly_hash(md5(text))) AS n_distinct,
              | min(poly_hash(md5(text))) AS min_fp,
              | max(poly_hash(md5(text))) AS max_fp
              |FROM v_documents GROUP BY lang ORDER BY lang""".stripMargin)
    },
    Some("""WITH fp AS (SELECT lang, (SELECT list_reduce(
           |    list_prepend(0::HUGEINT,
           |      [ascii(m[i:i])::HUGEINT for i in range(1, len(m)+1)]),
           |    (a, b) -> (a * 1000003 + b) % 18446744073709551616)
           |   FROM (SELECT md5(text) AS m)) AS u
           |  FROM documents),
           |s AS (SELECT lang, CAST(CASE
           |    WHEN u >= 9223372036854775808 THEN u - 18446744073709551616
           |    ELSE u END AS BIGINT) AS f FROM fp)
           |SELECT lang, count(*) AS n, count(DISTINCT f) AS n_distinct,
           | min(f) AS min_fp, max(f) AS max_fp
           |FROM s GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Context-window chunking: documents packed into ≤32-token chunks,
    * per-language chunk counts and sizes. Oracle rebuilds the chunks in
    * DuckDB with list slicing — same boundaries, same joined text.
    */
  private val chunking = Q(
    "text_chunking",
    (s, d) => Tables.documents(s, d)
      .select(col("lang"),
        explode(TextAnalysis.chunkByTokens(col("text"), 32)).as("chunk"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(length(col("chunk"))).as("sum_chars"),
        max(length(col("chunk"))).as("max_chars"))
      .orderBy(col("lang")),
    // \s-class strip + empty-token filter in lockstep with chunkByTokens:
    // plain trim() strips only spaces and would count phantom chunks for
    // tab/newline-padded docs
    Some("""WITH t AS (SELECT lang,
           |  list_filter(string_split_regex(
           |    regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'),
           |    x -> x <> '') AS w
           |  FROM documents),
           |c AS (SELECT lang,
           |  array_to_string(w[(i-1)*32+1 : least(i*32, len(w))], ' ') AS chunk
           | FROM t, UNNEST(range(1, CAST(ceil(len(w)/32.0) AS BIGINT)+1)) AS u(i))
           |SELECT lang, count(*) AS n_chunks,
           | CAST(sum(length(chunk)) AS BIGINT) AS sum_chars,
           | max(length(chunk)) AS max_chars
           |FROM c GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Reproducible corpus sampling: per-language kept counts for a 10%
    * hash band, on the md5-uniform ([[TextAnalysis.sampleByHashMd5]]) so
    * the oracle rebuilds the exact kept-set in DuckDB (the
    * `docs_shuffle_shards` convention). The xxhash64 hot-path variant
    * keeps its determinism/band-bound pins in TextAnalysisSpec.
    */
  private val sampling = Q(
    "text_sample_by_hash",
    (s, d) => Tables.documents(s, d)
      .filter(TextAnalysis.sampleByHashMd5(col("doc_id"), perMille = 100))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
      .orderBy(col("lang")),
    Some("""SELECT lang, count(*) AS n_sampled FROM documents
           |WHERE doc_id IS NOT NULL
           |  AND ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
           |    ::BIGINT % 1000 < 100
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** BM25 ranked retrieval ([[Retrieval.bm25TopK]]): top-10 documents
    * for a fixed seed-term query, compared on (rank, doc_id, score in
    * integer micro-units) — the BIGINT quantization makes the ranking an
    * exact cross-engine comparison (see Retrieval's determinism note).
    * The oracle rebuilds the full formula independently: tf from the
    * words list, df/N/avgdl from the corpus, identical idf variant.
    */
  /** The BM25 scoring chain as DuckDB CTEs ending in `r(doc_id,
    * score_micro, rank)` — shared by the bm25 oracle and the
    * negative-sampling oracle so both sides score with the identical
    * formula text.
    */
  private[llm] val Bm25Cte =
    s"""d AS (SELECT doc_id, ${CorpusQueries.WordsExpr} AS w
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
       |r AS (SELECT doc_id, score_micro, row_number() OVER (
       |    ORDER BY score_micro DESC, doc_id) AS rank FROM sc)"""
      .stripMargin

  private val bm25 = Q(
    "text_bm25_topk",
    (s, d) => Retrieval.bm25TopK(Tables.documents(s, d), "doc_id", "text",
      terms = Seq("vector", "stream", "hash"), k = 10)
      .orderBy(col("rank")),
    Some(s"""WITH $Bm25Cte
            |SELECT rank, doc_id, score_micro FROM r
            |WHERE rank <= 10 ORDER BY 1""".stripMargin),
    headline = true)

  /** Mixture sampling to TARGET proportions — the training-mix primitive
    * (draw a 50%-size corpus with sources equalized, the "rebalance the
    * web crawl against the curated sources" move): pass 1 counts docs per
    * source (map-side partial agg to |sources| rows), the per-source keep
    * rate `min(1, target/n_s)` derives on the driver-free 1-row stats
    * frame, pass 2 streams the corpus once against the BROADCAST rates
    * and keeps doc_id where the md5-uniform (same construction as
    * `text_weighted_sample` — a pure function of doc_id, so the sample
    * is reproducible across engines/retries/partitionings) falls under
    * the rate. Undersized sources saturate at rate 1 rather than
    * upsampling — count columns make the saturation visible. Two scans
    * total, no shuffle wider than |sources|.
    */
  private val mixtureSample = Q(
    "text_mixture_sample",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      val stats = counts.agg(sum(col("n_s")).as("n_total"),
        count(lit(1)).as("n_sources"))
      val rates = counts.crossJoin(broadcast(stats))
        .select(col("source").as("src"), col("n_s"),
          least(lit(1.0),
            (col("n_total").cast("double") * 0.5 / col("n_sources"))
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
    },
    Some("""WITH c AS (SELECT source, count(*) AS n_s
           |  FROM documents GROUP BY 1),
           |st AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_total,
           |  count(*) AS n_sources FROM c),
           |r AS (SELECT source AS src, n_s,
           |  least(1.0, (CAST(n_total AS DOUBLE) * 0.5 / n_sources) / n_s)
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

  /** Character-statistics quality signals (the Gopher-rule family the
    * token-level `text_quality_scores` doesn't cover): per-doc
    * character entropy, distinct-character count, and the most-common
    * character's share — low entropy / high top-char share flags
    * boilerplate and degenerate repetition. The 20 lowest-entropy docs
    * report. One JVM codepoint-counting pass per doc (the per-char
    * GROUP BY an exploded formulation would pay is all inside the
    * UDF); entropy rounds ONCE to integer micro-bits — FP sum-order
    * differences (~1e-12) sit six orders below the rounding step — and
    * the share is integer basis points. Codepoint iteration matches
    * DuckDB's UTF-8 character semantics (BMP-safe; the oracle's
    * string_split(text, '') is per-character).
    */
  private val charStats = Q(
    "text_char_entropy",
    (s, d) => {
      val statsU = udf { (t: String) =>
        if (t == null || t.isEmpty) null
        else {
          val counts = new scala.collection.mutable.HashMap[Int, Long]()
          var i = 0
          var n = 0L
          while (i < t.length) {
            val cp = t.codePointAt(i)
            counts.update(cp, counts.getOrElse(cp, 0L) + 1L)
            n += 1L
            i += Character.charCount(cp)
          }
          val log2n = math.log(n.toDouble) / math.log(2.0)
          var sumKlogK = 0.0
          var maxK = 0L
          counts.valuesIterator.foreach { k =>
            sumKlogK += k * (math.log(k.toDouble) / math.log(2.0))
            if (k > maxK) maxK = k
          }
          val entropyMicro = math.round(1e6 * (log2n - sumKlogK / n))
          (n, counts.size.toLong, maxK * 10000L / n, entropyMicro)
        }
      }
      Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), statsU(col("text")).as("st"))
        .select(col("doc_id"), col("st._1").as("n_chars"),
          col("st._2").as("n_distinct_chars"),
          col("st._3").as("top_char_bp"),
          col("st._4").as("entropy_micro"))
        .orderBy(col("entropy_micro"), col("doc_id"))
        .limit(20)
    },
    Some("""WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
           |  FROM documents WHERE length(text) > 0),
           |cc AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2),
           |st AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n,
           |   count(*) AS n_distinct_chars, CAST(max(k) AS BIGINT) AS maxk,
           |   CAST(round(1e6 * (log2(sum(k))
           |     - sum(k * log2(k)) / sum(k))) AS BIGINT) AS entropy_micro
           |  FROM cc GROUP BY 1)
           |SELECT doc_id, n AS n_chars, n_distinct_chars,
           | (maxk * 10000) // n AS top_char_bp, entropy_micro
           |FROM st ORDER BY entropy_micro, doc_id LIMIT 20""".stripMargin))

  /** TF-IDF top terms per document — the classic keyword extraction /
    * document-representation primitive (what feeds tag clouds, sparse
    * retrieval indexes, and topic labeling). One token pass → per-(doc,
    * term) tf; DF falls out of the tf frame (one row per doc×term, so
    * count-per-term IS document frequency); idf = ln((N+1)/(df+1))
    * micro-rounded ONCE per (doc, term) so the per-doc ranking is an
    * exact BIGINT comparison (the BM25 convention). Rank window is
    * PARTITIONED by doc; ties break on md5(term) — hex-ASCII, immune to
    * the cross-engine unicode collation trap.
    */
  private val tfidfTop = Q(
    "text_tfidf_top_terms",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val tf = docs
        .select(col("doc_id"), explode(graft.functions.Tokenize(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      // df via a |tf|-frame window, not a groupBy-and-join-back (which
      // would re-plan the corpus pass — the bm25 lesson)
      val withDf = tf.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("tok"))))
      val nDocs = docs.agg(count(lit(1)).as("n"))
      val scored = withDf.crossJoin(broadcast(nDocs))
        .withColumn("score_micro",
          round(col("tf") * log((col("n") + lit(1.0)) / (col("df") + lit(1.0)))
            * 1e6, 0).cast("long"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score_micro").desc, md5(col("tok")))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("tok"), col("score_micro"))
        .orderBy(col("doc_id"), col("rank"))
    },
    Some(s"""WITH t AS (SELECT doc_id, unnest(${CorpusQueries.WordsExpr}) AS tok
            |  FROM documents),
            |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
            |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
            |nd AS (SELECT count(*) AS n FROM documents),
            |sc AS (SELECT doc_id, tok,
            |   CAST(round(tf * ln((n + 1.0) / (df + 1.0)) * 1e6, 0) AS BIGINT)
            |     AS score_micro
            |  FROM tf JOIN df USING (tok), nd),
            |r AS (SELECT doc_id, tok, score_micro, row_number() OVER (
            |    PARTITION BY doc_id ORDER BY score_micro DESC, md5(tok))
            |    AS rank FROM sc)
            |SELECT doc_id, rank, tok, score_micro FROM r
            |WHERE rank <= 3 ORDER BY 1, 2""".stripMargin))

  /** Zipf rank-frequency fit over the corpus vocabulary — natural text
    * follows freq ∝ rank^s with s ≈ −1, and a corpus whose fitted
    * exponent sits far off is machine-generated/templated (a corpus-
    * level quality signal next to the per-doc gates). Log-log linear
    * regression over the top-100 tokens: one map-side-combined
    * frequency aggregation, a 100-row bounded frame (TakeOrdered +
    * BoundedRank — no unpartitioned window), ln(rank)/ln(freq)
    * micro-rounded ONCE per row (the BM25 ln convention) so the
    * regression's sufficient statistics are exact BIGINTs; the slope
    * is derived, 6dp-rounded from identically-written doubles.
    */
  private val zipf = Q(
    "text_zipf_fit",
    (s, d) => {
      val freqs = Tables.documents(s, d)
        .select(explode(graft.functions.Tokenize(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      val top = freqs.orderBy(col("freq").desc, md5(col("tok"))).limit(100)
      val ranked = graft.ops.BoundedRank.attach(
        top.withColumn("m5", md5(col("tok"))), "rank",
        Seq("freq" -> true, "m5" -> false))
      val pts = ranked.select(
        round(log(col("rank").cast("double")) * 1e6, 0).cast("long").as("x"),
        round(log(col("freq").cast("double")) * 1e6, 0).cast("long").as("y"))
      val st = pts.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      val (n, sx, sy, sxy, sxx) = (col("n").cast("double"),
        col("sx").cast("double"), col("sy").cast("double"),
        col("sxy").cast("double"), col("sxx").cast("double"))
      st.select(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"),
        round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
          .as("zipf_slope"))
    },
    Some(s"""WITH f AS (SELECT tok, count(*) AS freq
            | FROM (SELECT unnest(${CorpusQueries.WordsExpr}) AS tok
            |       FROM documents) GROUP BY 1),
            |t AS (SELECT freq, md5(tok) AS m5 FROM f
            | ORDER BY freq DESC, m5 LIMIT 100),
            |r AS (SELECT freq, row_number() OVER (
            |   ORDER BY freq DESC, m5) AS rank FROM t),
            |p AS (SELECT
            |  CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6, 0) AS BIGINT) AS x,
            |  CAST(round(ln(CAST(freq AS DOUBLE)) * 1e6, 0) AS BIGINT) AS y
            | FROM r),
            |st AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
            |  CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x*y) AS BIGINT) AS sxy,
            |  CAST(sum(x*x) AS BIGINT) AS sxx FROM p)
            |SELECT n, sx, sy, sxy, sxx,
            | round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            |  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
            |   AS zipf_slope
            |FROM st""".stripMargin))

  /** Neyman-optimal stratified allocation (survey sampling's minimum-
    * variance rule): a fixed 1000-doc budget splits across sources
    * ∝ n_h·σ_h — high-variance strata earn more samples than equal or
    * proportional allocation would give them, which is how a corpus
    * audit spends a labeling budget. The identity n_h·σ_h =
    * √(n·Σx² − (Σx)²) keeps everything integral until ONE sqrt: the
    * variance integrand goes through DECIMAL (the overflow rule for
    * squared sums), each stratum's √var_num is micro-floored ONCE into
    * a DECIMAL(25,0) (integral, order-independent to sum, and wide
    * enough for √1e38·1e6 — a BIGINT here would wrap silently in Spark
    * at the very scale the DECIMAL integrand exists for; a raw
    * sum(sqrt(double)) would depend on partition accumulation order
    * and could flip the floor below), and the floor(1000·w/Σw)
    * allocation is one identically-written double expression over two
    * exact integral operands. The realized draw is the md5-uniform against
    * rate = alloc/n_h (the `text_mixture_sample` machinery). var_num is
    * published as its canonical decimal STRING: a DECIMAL(38,0) cell is
    * exact in both engines but readers disagree on its formatting
    * (int128 decimals fall out of the int64 fast path), so the compare
    * convention is the digit string. Two corpus scans,
    * |sources|-bounded state.
    */
  private val neyman = Q(
    "text_neyman_allocation",
    (s, d) => {
      val d19 = "decimal(19,0)"
      val docs = Tables.documents(s, d)
      val st = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_s"),
          sum(col("n_chars")).as("sx"),
          sum(col("n_chars") * col("n_chars")).as("sxx"))
        .select(col("source"), col("n_s"),
          (col("n_s").cast(d19) * col("sxx").cast(d19) -
            col("sx").cast(d19) * col("sx").cast(d19))
            .cast("decimal(38,0)").as("var_num"))
      // sqrtq through DECIMAL(25,0): sqrt of a DECIMAL(38,0) reaches
      // 1e19, so micro-quantizing into a BIGINT would silently wrap in
      // Spark (and raise in DuckDB) in exactly the regime var_num's
      // DECIMAL exists for. floor() yields an integral double, whose
      // exact binary value both engines convert to the same decimal;
      // the decimal sum is order-independent, and the allocation is
      // the identically-written double expression (both operands are
      // exact integral decimals → identical doubles → identical floor).
      val stq = st.withColumn("sqrtq",
        floor(sqrt(col("var_num").cast("double")) * 1e6)
          .cast("decimal(25,0)"))
      val tot = stq.agg(sum(col("sqrtq")).cast("decimal(35,0)").as("sw"))
      val alloc = stq.crossJoin(broadcast(tot))
        .select(col("source").as("src"), col("n_s"), col("var_num"),
          floor(lit(1000.0) * col("sqrtq").cast("double") /
            col("sw").cast("double")).cast("long").as("alloc"))
      val v = conv(substring(md5(col("doc_id").cast("string")), 1, 15),
        16, 10).cast("double")
      val u = (v + lit(1.0)) / lit(math.pow(16.0, 15) + 1.0)
      docs.select(col("doc_id"), col("source"), u.as("u"))
        .join(broadcast(alloc), col("source") === col("src"))
        .groupBy(col("source"))
        .agg(max(col("n_s")).as("n_docs"),
          max(col("var_num")).cast("string").as("var_num"),
          max(col("alloc")).as("alloc"),
          sum(when(col("u") <
            col("alloc").cast("double") / col("n_s").cast("double"), 1L)
            .otherwise(0L)).as("n_drawn"))
        .orderBy(col("source"))
    },
    Some("""WITH st AS (SELECT source, count(*) AS n_s,
           |   CAST(sum(n_chars) AS BIGINT) AS sx,
           |   CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
           |  FROM documents GROUP BY 1),
           |v AS (SELECT source, n_s,
           |   CAST(CAST(n_s AS DECIMAL(19,0)) * CAST(sxx AS DECIMAL(19,0))
           |     - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
           |    AS DECIMAL(38,0)) AS var_num
           |  FROM st),
           |vq AS (SELECT source, n_s, var_num,
           |   CAST(floor(sqrt(CAST(var_num AS DOUBLE)) * 1e6)
           |     AS DECIMAL(25,0)) AS sqrtq
           |  FROM v),
           |tot AS (SELECT CAST(sum(sqrtq) AS DECIMAL(35,0)) AS sw FROM vq),
           |al AS (SELECT source AS src, n_s, var_num,
           |   CAST(floor(1000.0 * CAST(sqrtq AS DOUBLE)
           |     / CAST(sw AS DOUBLE)) AS BIGINT) AS alloc
           |  FROM vq CROSS JOIN tot),
           |u AS (SELECT doc_id, source,
           |  (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
           |     AS BIGINT) + 1.0) / (1152921504606846976.0 + 1.0) AS u
           | FROM documents)
           |SELECT al.src AS source, max(n_s) AS n_docs,
           | CAST(max(var_num) AS VARCHAR) AS var_num, max(alloc) AS alloc,
           | CAST(sum(CASE WHEN u.u < CAST(alloc AS DOUBLE)
           |    / CAST(n_s AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT)
           |   AS n_drawn
           |FROM u JOIN al ON u.source = al.src
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Vocabulary coverage curve — what fraction of the corpus's token
    * MASS the top-100/1k/10k terms cover: the tokenizer-budget planner
    * (a 10k vocab covering 95% of mass means 5% of tokens fall to
    * subword/UNK handling — the number that sizes the vocab before any
    * BPE training). Heavy-hitter selection is TakeOrdered per K over
    * the staged vocabulary frame with the md5 tiebreak (unicode terms
    * never string-compare), coverage in integer basis points. Pairs
    * with `text_heaps_law`: Heaps says how fast vocabulary GROWS, this
    * says how little of it carries the mass.
    */
  private val vocabCoverage = Q(
    "text_vocab_coverage",
    (s, d) => {
      import graft.ops.Checkpoints.StageCheckpoint
      val counts = Tables.documents(s, d)
        .select(explode(graft.functions.Tokenize(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .stageCheckpoint()
      val tot = counts.agg(sum(col("c")).as("total_mass"),
        count(lit(1)).as("vocab_size"))
      def cov(k: Int) = counts
        .orderBy(col("c").desc, md5(col("tok")))
        .limit(k)
        .agg(lit(k.toLong).as("k"), sum(col("c")).as("mass_k"))
      cov(100).unionByName(cov(1000)).unionByName(cov(10000))
        .crossJoin(broadcast(tot))
        .select(col("k"), col("mass_k"), col("total_mass"),
          col("vocab_size"),
          expr("(10000 * mass_k) div total_mass").as("coverage_bp"))
        .orderBy(col("k"))
    },
    Some(s"""WITH tok AS (SELECT unnest(${CorpusQueries.WordsExpr}) AS tok
            |  FROM documents),
            |cnt AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
            |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total_mass,
            |   count(*) AS vocab_size FROM cnt),
            |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, md5(tok))
            |   AS rn FROM cnt),
            |ks(k) AS (VALUES (100), (1000), (10000)),
            |m AS (SELECT k, CAST(sum(CASE WHEN rn <= k THEN c ELSE 0 END)
            |    AS BIGINT) AS mass_k
            |  FROM r CROSS JOIN ks GROUP BY 1)
            |SELECT CAST(k AS BIGINT) AS k, mass_k, total_mass, vocab_size,
            | (10000 * mass_k) // total_mass AS coverage_bp
            |FROM m CROSS JOIN tot ORDER BY 1""".stripMargin))

  /** Sparse TF-IDF document-similarity top-k self-join — the doc-doc
    * complement of [[bm25]]'s query-doc retrieval: every document's
    * 3 most-similar neighbors under idf-weighted cosine over its
    * 3-gram shingle features. The inverted-index formulation is the
    * scale shape: candidates come from an equi-join on the FEATURE
    * (never a doc×doc product), restricted to discriminative features
    * (df ≥ 2 — singletons cannot co-occur — and df·10 ≤ N, the
    * stopword-feature cut that bounds every join bucket at N/10; on
    * this corpus shingle df maxes at ~25 so the cut is headroom, at
    * 100 TB it is the lever that keeps Σ df² linear). Weights are the
    * house micro-rounded idf (ln((N+1)/(df+1))·10⁶, rounded ONCE) so
    * numerators and squared norms are exact BIGINTs; the cosine is a
    * single-expression double over those integers floored to micro
    * units — nothing order-dependent crosses the compare. Both
    * directions of each verified pair enter the per-doc rank window
    * ((cos desc, neighbor id) tiebreak), top-3 kept.
    */
  private val tfidfDocSim = Q(
    "text_tfidf_doc_similarity",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.Checkpoints.StageCheckpoint
      val docs = Tables.documents(s, d)
      val feat = docs.select(col("doc_id"),
        explode(TextAnalysis.shingles(col("text"))).as("tok"))
      val withDf = feat.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("tok"))))
      val nDocs = docs.agg(count(lit(1)).as("n"))
      val weighted = withDf.crossJoin(broadcast(nDocs))
        .filter(col("df") >= 2 && col("df") * 10 <= col("n"))
        .withColumn("w",
          round(log((col("n") + lit(1.0)) / (col("df") + lit(1.0))) * 1e6, 0)
            .cast("long"))
        .select(col("doc_id"), col("tok"), col("w"))
        .stageCheckpoint() // feeds both join sides AND the norms
      val norms = weighted.groupBy(col("doc_id"))
        .agg(sum(col("w") * col("w")).as("s2"))
      val num = weighted.select(col("doc_id").as("i"), col("tok"),
          col("w").as("wa"))
        .join(weighted.select(col("doc_id").as("j"), col("tok"),
          col("w").as("wb")), "tok")
        .filter(col("i") < col("j"))
        .groupBy(col("i"), col("j"))
        .agg(sum(col("wa") * col("wb")).as("num"))
      // norms is PER-DOCUMENT — unbounded at corpus scale, so no
      // broadcast hint: it derives from the staged frame, whose runtime
      // size lets AQE pick broadcast itself at SFs where it fits
      val pairs = num
        .join(norms.select(col("doc_id").as("i"), col("s2").as("s2i")), "i")
        .join(norms.select(col("doc_id").as("j"), col("s2").as("s2j")), "j")
        .withColumn("cos_micro",
          floor(col("num").cast("double") * 1e6
            / (sqrt(col("s2i").cast("double"))
              * sqrt(col("s2j").cast("double")))).cast("long"))
        .select(col("i"), col("j"), col("cos_micro"))
      val sym = pairs
        .select(col("i").as("doc_id"), col("j").as("nbr_id"), col("cos_micro"))
        .unionByName(pairs.select(col("j").as("doc_id"),
          col("i").as("nbr_id"), col("cos_micro")))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("cos_micro").desc, col("nbr_id"))
      sym.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("nbr_id"), col("cos_micro"))
        .orderBy(col("doc_id"), col("rank"))
    },
    Some(s"""WITH sh AS (SELECT doc_id, unnest(
            |   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
            |     for i in range(1, len(w)-1)])) AS tok
            |  FROM (SELECT doc_id, ${CorpusQueries.WordsExpr} AS w
            |        FROM documents) WHERE len(w) >= 3),
            |df AS (SELECT tok, count(*) AS df FROM sh GROUP BY 1),
            |nd AS (SELECT count(*) AS n FROM documents),
            |wt AS (SELECT doc_id, sh.tok,
            |   CAST(round(ln((n + 1.0) / (df + 1.0)) * 1e6, 0) AS BIGINT)
            |     AS w
            |  FROM sh JOIN df USING (tok), nd
            |  WHERE df >= 2 AND df * 10 <= n),
            |nr AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS s2
            |  FROM wt GROUP BY 1),
            |nm AS (SELECT a.doc_id AS i, b.doc_id AS j,
            |   CAST(sum(a.w * b.w) AS BIGINT) AS num
            |  FROM wt a JOIN wt b ON a.tok = b.tok AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2),
            |pr AS (SELECT i, j, CAST(floor(CAST(num AS DOUBLE) * 1e6
            |    / (sqrt(CAST(na.s2 AS DOUBLE)) * sqrt(CAST(nb.s2 AS DOUBLE))))
            |   AS BIGINT) AS cos_micro
            |  FROM nm JOIN nr na ON na.doc_id = nm.i
            |  JOIN nr nb ON nb.doc_id = nm.j),
            |sym AS (SELECT i AS doc_id, j AS nbr_id, cos_micro FROM pr
            | UNION ALL SELECT j, i, cos_micro FROM pr),
            |r AS (SELECT doc_id, nbr_id, cos_micro, row_number() OVER (
            |   PARTITION BY doc_id ORDER BY cos_micro DESC, nbr_id) AS rank
            |  FROM sym)
            |SELECT doc_id, rank, nbr_id, cos_micro FROM r
            |WHERE rank <= 3 ORDER BY 1, 2""".stripMargin),
    headline = true)

  val qs: Seq[Q] = Seq(tokenStats, packWindows, bpePairs, bpeTrain, bpeStats,
    spellVariants,
    weightedSample, quality, langid, langidPrf, fingerprintQ, subwords,
    polyFingerprint, chunking, sampling, bm25, mixtureSample, charStats,
    tfidfTop, zipf, neyman, vocabCoverage, tfidfDocSim)
}
