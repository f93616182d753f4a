package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{BloomPrune, Corpus, Dedup, Reco, Relational, Similarity, Sketches, Skew, TimeWindows, TrainingMix}
import graft.plans.LabelPropagation
import graft.sources.{Bucketing, Multimodal}
import graft.streaming.RealTime

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named entry in
  * [[queries]]; every SQL-expressible one has matching ANSI SQL in
  * [[oracleSql]] (run by the driver in DuckDB over the same parquet tables).
  * Column names and types are kept identical on both sides — the driver
  * hash-compares values after sorting columns by name.
  */

import graft.EntryHelpers._

/** Registry: text-analysis / corpus-statistics queries — one `queries` entry and one DuckDB
  * `oracles` twin per graded query. Composed into SparkEntry (driver
  * contract); keys must stay globally unique across registries
  * (spec-asserted in EntrySpec).
  */
private[graft] object TextRegistry {

  /** Sketch-only PRODUCTION forms of the graded sketch queries — the path
    * a 100-TB pipeline actually runs (no exact-truth twin, no dedup
    * shuffle, no per-source sort). Benched by `SPARK_GRAFT_SKETCH_PROD=1`
    * into its own artifact; NOT part of the driver-graded suite — their
    * correctness rests on SketchProdSpec pinning each estimate column
    * equal to its graded twin's.
    */
  def prodQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q102_hll_cardinality" -> ((s, dir) =>
      Corpus.hllCardinalityProd(Tables.documents(s, dir))),
    "q147_hll_merge" -> ((s, dir) =>
      Corpus.hllMergeProd(Tables.documents(s, dir))),
    "q157_hll_intersection" -> ((s, dir) =>
      Corpus.hllIntersectionProd(Tables.documents(s, dir))),
    "q109_hist_quantiles" -> ((s, dir) =>
      Corpus.histogramQuantilesProd(Tables.documents(s, dir))))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_token_stats" -> ((s, dir) => TextAnalysis.tokenStats(Tables.documents(s, dir))),
    "q33_lang_id" -> ((s, dir) => TextAnalysis.langId(Tables.documents(s, dir))),
    "q34_quality_score" -> ((s, dir) => TextAnalysis.qualityScore(Tables.documents(s, dir))),
    "q35_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(Tables.documents(s, dir)).select("doc_id", "fp_md5")),
    // BPE-ish pretokenizer counts (letters-runs / digits / symbols + a
    // ceil(len/4) subword estimate)
    "q53_token_bpe" -> ((s, dir) => TextAnalysis.bpeTokenCounts(Tables.documents(s, dir))),
    // rolling char-8-gram md5-prefix fingerprints (winnowing primitive)
    "q54_rolling_fingerprint" -> ((s, dir) =>
      TextAnalysis.rollingFingerprints(Tables.documents(s, dir))),
    // Gopher-style repetition quality signals (word-2-gram concentration)
    "q61_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionSignals(Tables.documents(s, dir))),
    // winnowing: min rolling-hash per window of 4 — selected fingerprints
    "q64_winnowing" -> ((s, dir) =>
      TextAnalysis.winnowedFingerprints(Tables.documents(s, dir))),
    // PII scrub: counts + redacted-text digest (full text dropped for a
    // compact graded output; the operator itself returns it)
    "q65_pii_redact" -> ((s, dir) =>
      TextAnalysis.piiRedact(Tables.documents(s, dir)).drop("redacted")),
    // TF-IDF-shaped rarity-weighted top terms per document
    "q55_top_terms" -> ((s, dir) => TextAnalysis.topTermsPerDoc(Tables.documents(s, dir))),
    "q67_filter_funnel" -> ((s, dir) =>
      TextAnalysis.filterFunnel(Tables.documents(s, dir))),
    // per-source trigram diversity (template-spam signal)
    "q68_ngram_diversity" -> ((s, dir) =>
      Corpus.distinctNgramRatio(Tables.documents(s, dir))),
    // source × source shared-8-gram matrix (gram-bucketed join)
    "q69_source_overlap" -> ((s, dir) =>
      Corpus.sourceOverlap(Tables.documents(s, dir))),
    // literal-quote decontamination: broadcast probes, zero-shuffle scan
    "q70_quote_hits" -> ((s, dir) =>
      Corpus.quoteHits(Tables.documents(s, dir))),
    // repeated 32-token windows across the corpus (headers/footers/chrome)
    "q72_boilerplate" -> ((s, dir) =>
      Corpus.boilerplateWindows(Tables.documents(s, dir))),
    // C4-style segment-dedup rewrite: drop 8-token segments seen in >= 3
    // docs, re-assemble survivors in order, hash the rewritten text
    "q116_segment_dedup" -> ((s, dir) =>
      Corpus.segmentDedupRewrite(Tables.documents(s, dir))),
    // robust stats: per-source winsorized length clipping (exact
    // percentile bounds broadcast back — the document side never shuffles)
    "q91_winsorize" -> ((s, dir) =>
      Corpus.winsorize(Tables.documents(s, dir))),
    // curriculum phases: fixed cuts over the deterministic quality score
    "q80_curriculum" -> ((s, dir) =>
      TextAnalysis.curriculumPhases(Tables.documents(s, dir))),
    // vocab induction: corpus-wide top-50 word bigrams (BPE counting pass)
    "q76_top_ngrams" -> ((s, dir) =>
      Corpus.topNgrams(Tables.documents(s, dir))),
    // vocabulary coverage: per-doc OOV fraction against the corpus's own
    // deterministic top-1000 token vocabulary (broadcast back)
    "q145_oov_rate" -> ((s, dir) =>
      Corpus.oovRate(Tables.documents(s, dir))),
    // corpus release audit: v1/v2 simulated by modulo splits, with
    // doc_id%13 docs edited in v2 so every status class appears
    "q78_snapshot_diff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Corpus.snapshotDiff(
        docs.where(col("doc_id") % 7 =!= 0),
        docs.where(col("doc_id") % 11 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 13 === 0, concat(col("text"), lit(" [v2]")))
              .otherwise(col("text"))))
    }),
    // deterministic 256-register HLL distinct-8-gram estimate per source,
    // graded against the exact distinct count (error is the deliverable)
    "q102_hll_cardinality" -> ((s, dir) =>
      Corpus.hllCardinalityFrom(hllGrams(s, dir))),
    // HLL shard-merge ≡ direct-registers proof over the same memoized
    // hashed grams — the property that makes the sketch distributed
    "q147_hll_merge" -> ((s, dir) =>
      Corpus.hllMergeFrom(hllGrams(s, dir))),
    // pairwise source overlap by register inclusion-exclusion — the
    // constant-size sketch form of the quadratic exact overlap matrix
    "q157_hll_intersection" -> ((s, dir) =>
      Corpus.hllIntersectionFrom(hllGrams(s, dir))),
    // one BPE merge-selection step: overlapping pair counts rank the
    // candidates, greedy replace-shrinkage grades what each would merge
    "q167_bpe_merge" -> ((s, dir) =>
      Corpus.bpeMergeStep(Tables.documents(s, dir))),
    // positional-index phrase query: adjacent-position self-join over
    // (doc, pos, token) postings — the index algebra twin of q95
    "q169_phrase_search" -> ((s, dir) =>
      Corpus.phraseSearch(Tables.documents(s, dir))),
    // exact per-source KS and Wasserstein-1 drift of the length
    // distribution vs the rest of the corpus (one grid pass, both stats)
    "q172_ks_drift" -> ((s, dir) =>
      Corpus.ksDrift(Tables.documents(s, dir))),
    // Chao1 + Good-Turing unseen-vocabulary estimates per source from
    // one count-of-counts pass — the corpus-coverage report
    "q176_vocab_richness" -> ((s, dir) =>
      Corpus.vocabRichness(Tables.documents(s, dir))),
    // d-gap + varint byte cost of the top-df posting lists vs raw ids —
    // the storage half of the q169 index
    "q178_postings_compression" -> ((s, dir) =>
      Corpus.postingsCompression(Tables.documents(s, dir))),
    // greedy set-cover source selection: which 3 sources buy the most
    // distinct 8-grams (the data-curation budget question), over the
    // memoized hashed-gram stream
    "q185_greedy_coverage" -> ((s, dir) =>
      Corpus.greedyCoverageFrom(hllGrams(s, dir))),
    // quantile normalization of doc length onto the corpus distribution
    // (distributed global rank, per-source rank windows, exact integers)
    "q186_quantile_normalize" -> ((s, dir) =>
      Corpus.quantileNormalize(Tables.documents(s, dir))),
    // per-doc shared-window exposure ppm — the document-level
    // boilerplate signal curation thresholds on (q72's corpus twin)
    "q244_doc_span_share" -> ((s, dir) =>
      Corpus.docSpanShare(Tables.documents(s, dir))),
    // Flesch-style readability in exact milli units (vowel-group
    // syllable proxy, documented double floor)
    "q249_readability" -> ((s, dir) =>
      graft.functions.TextAnalysis.readability(Tables.documents(s, dir))),
    // reciprocal-rank fusion of the BM25 and term-density runs —
    // integer-floor 1e9/(60+rank) contributions, RRF-over-union
    "q258_rrf_fusion" -> ((s, dir) =>
      Corpus.rrfFusion(Tables.documents(s, dir),
        Seq("dup", "spark", "window", "batch"))),
    // degenerate-text detector: most-repeated word 3-gram share per doc
    // in exact ppm — the multiset the shingle ops deliberately drop
    "q259_repetition_score" -> ((s, dir) =>
      Corpus.repetitionScore(Tables.documents(s, dir))),
    // DSIR importance scores vs the en target slice — integer-log2
    // likelihood-ratio weights, token-keyed join-back, no float logs
    "q260_importance_weights" -> ((s, dir) =>
      Corpus.importanceWeights(Tables.documents(s, dir))),
    // per-class precision/recall/F1 of q33's langID vs the truth label
    // — cleared-denominator ppm floors, 0-denominator classes explicit
    "q267_langid_eval" -> ((s, dir) =>
      TextAnalysis.langIdEval(Tables.documents(s, dir))),
    // Cohen's kappa over the same confusion seam — chance-corrected
    // agreement as one integer ratio, truncation-matched across engines
    "q268_langid_kappa" -> ((s, dir) =>
      TextAnalysis.langIdKappa(Tables.documents(s, dir))),
    // 10%-trimmed mean doc length per source — the robust location
    // between mean and median, exact floor cuts and milli average
    "q273_trimmed_mean" -> ((s, dir) =>
      Corpus.trimmedMeanLength(Tables.documents(s, dir))),
    // per-source Spearman rank correlation of n_chars vs token count —
    // exact BIGINT d² sums, per-source windows only
    "q202_spearman" -> ((s, dir) =>
      Corpus.spearmanRanks(Tables.documents(s, dir))),
    // TF-IDF keyword search with integer-log2 idf — exact BIGINT scores,
    // broadcast term stats, TakeOrderedAndProject heap
    "q197_tfidf_search" -> ((s, dir) =>
      Corpus.tfidfSearch(Tables.documents(s, dir),
        Seq("dup", "spark", "window", "batch"))),
    // per-doc character entropy (floor-log2 proxy, exact integers) —
    // the compressibility quality signal
    "q211_char_entropy" -> ((s, dir) =>
      graft.functions.TextAnalysis.charEntropy(Tables.documents(s, dir))),
    // class-based TF-IDF: each source's 5 most distinctive tokens by
    // tf x integer-log2 source-idf — the cluster-profile report
    "q217_source_keywords" -> ((s, dir) =>
      Corpus.sourceKeywords(Tables.documents(s, dir))),
    // BM25 ranking with cleared-denominator exact integers — tf
    // saturation + length normalization beside q197's raw TF-IDF
    "q224_bm25_search" -> ((s, dir) =>
      Corpus.bm25Search(Tables.documents(s, dir),
        Seq("dup", "spark", "window", "batch"))),
    // BPE pieces per word and chars per piece, per language — the
    // tokenizer-fertility accounting over the q53 decomposition
    "q219_token_fertility" -> ((s, dir) =>
      graft.functions.TextAnalysis.tokenFertility(Tables.documents(s, dir))),
    // unigram LM surprisal per document: integer-log2 bits/token — the
    // model-based quality filter beside q34's heuristics
    "q207_lm_surprisal" -> ((s, dir) =>
      Corpus.lmSurprisal(Tables.documents(s, dir))),
    // per-source lexical diversity: Simpson repeat concentration + TTR,
    // single divisions of exact integer counts
    "q153_token_diversity" -> ((s, dir) =>
      graft.functions.TextAnalysis.tokenDiversity(Tables.documents(s, dir))),
    // 256-bucket histogram p50/p90/p99 per source, graded against the
    // exact order statistic (integer-only sketch-vs-truth report)
    "q109_hist_quantiles" -> ((s, dir) =>
      Corpus.histogramQuantiles(Tables.documents(s, dir))),
    "q94_charclass_profile" -> ((s, dir) =>
      TextAnalysis.charClassProfile(Tables.documents(s, dir))),
    // corpus collocations by lift (log-free monotone twin of PMI)
    "q95_collocations" -> ((s, dir) =>
      Corpus.collocations(Tables.documents(s, dir))),
    // per-source z-score length normalization from exact integer sums
    "q99_zscore_norm" -> ((s, dir) =>
      Corpus.zscoreLengths(Tables.documents(s, dir))),
  )

  def oracles: Map[String, String] = Map(
    // quantile_cont = Spark's exact interpolated percentile (the q48
    // contract), so the clip bounds are bit-identical on both engines
    "q91_winsorize" ->
      """WITH b AS (
        |  SELECT source,
        |    quantile_cont(n_chars, 0.05) AS p_lo,
        |    quantile_cont(n_chars, 0.95) AS p_hi
        |  FROM documents GROUP BY source)
        |SELECT doc_id, d.source AS source, n_chars,
        |  least(greatest(CAST(n_chars AS DOUBLE), p_lo), p_hi) AS clipped_chars,
        |  (n_chars < p_lo OR n_chars > p_hi) AS was_clipped
        |FROM documents d JOIN b ON d.source = b.source""".stripMargin,
    "q32_token_stats" ->
      """WITH toks AS (
        |  SELECT doc_id, text, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents)
        |SELECT doc_id,
        |  CAST(len(t) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(t)) AS INTEGER) AS n_distinct_tokens,
        |  CAST(length(text) AS INTEGER) AS char_len,
        |  CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / CAST(len(t) AS INTEGER) AS avg_token_len
        |FROM toks""".stripMargin,
    "q33_lang_id" ->
      """SELECT doc_id, h_en, h_de, h_fr, h_es, h_zh,
        |  CASE WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es AND h_en >= h_zh THEN 'en'
        |       WHEN h_de >= h_fr AND h_de >= h_es AND h_de >= h_zh THEN 'de'
        |       WHEN h_fr >= h_es AND h_fr >= h_zh THEN 'fr'
        |       WHEN h_es >= h_zh THEN 'es' ELSE 'zh' END AS pred_lang
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|of|and|to|in)\b')) AS INTEGER) AS h_en,
        |    CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|ist|nicht)\b')) AS INTEGER) AS h_de,
        |    CAST(len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b')) AS INTEGER) AS h_fr,
        |    CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|que|una)\b')) AS INTEGER) AS h_es,
        |    CAST(len(regexp_extract_all(text, '[一-鿿]')) AS INTEGER) AS h_zh
        |  FROM documents)""".stripMargin,
    "q34_quality_score" -> qualityScoreOracle,
    // fixed-constant phase cuts over the q34 score (bit-identical doubles
    // on both engines, so the boundary comparisons cannot disagree)
    "q80_curriculum" ->
      s"""SELECT doc_id, quality_score,
         |  CASE WHEN quality_score >= 0.7 THEN 3
         |       WHEN quality_score >= 0.5 THEN 2
         |       ELSE 1 END AS phase
         |FROM ($qualityScoreOracle) q""".stripMargin,
    "q35_fingerprint" ->
      "SELECT doc_id, md5(text) AS fp_md5 FROM documents",
    "q53_token_bpe" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    regexp_extract_all(text, '[A-Za-z]+') AS words,
        |    len(regexp_extract_all(text, '[0-9]')) AS n_digit_tokens,
        |    len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_other_tokens
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(words) AS INTEGER) AS n_words,
        |  CAST(n_digit_tokens AS INTEGER) AS n_digit_tokens,
        |  CAST(n_other_tokens AS INTEGER) AS n_other_tokens,
        |  CAST(COALESCE(list_sum(list_transform(words, w -> (length(w) + 3) // 4)), 0)
        |       + n_digit_tokens + n_other_tokens AS BIGINT) AS n_bpe_est
        |FROM base""".stripMargin,
    "q54_rolling_fingerprint" ->
      s"""WITH codes AS (
         |  SELECT doc_id,
         |    list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT)) AS cs
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, ${rollingFpsSql("cs")} AS fps
         |  FROM codes)
         |SELECT doc_id,
         |  CAST(len(fps) AS INTEGER) AS n_grams,
         |  list_min(fps) AS min_fp,
         |  list_max(fps) AS max_fp,
         |  CAST(len(list_distinct(fps)) AS INTEGER) AS n_distinct_fp
         |FROM g""".stripMargin,
    "q55_top_terms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT t.doc_id, t.term, t.tf, d.df, CAST(t.tf AS DOUBLE) / d.df AS score
        |  FROM tf t JOIN df d USING (term)),
        |r AS (
        |  SELECT doc_id, term, tf, df, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        |  FROM scored)
        |SELECT doc_id, CAST(rn AS INTEGER) AS rank, term, tf, df, score
        |FROM r WHERE rn <= 3""".stripMargin,
    // single divisions of exact integer counts → bit-identical doubles
    "q61_repetition" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents),
         |g AS (
         |  SELECT doc_id, unnest(list_transform(range(0, len(t) - 1),
         |    i -> t[i+1] || ' ' || t[i+2])) AS g
         |  FROM toks WHERE len(t) >= 2),
         |c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
         |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT) AS top_gram_frac,
         |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
         |    / CAST(sum(c) AS BIGINT) AS dup_gram_frac
         |FROM c GROUP BY doc_id""".stripMargin,
    // regex dialect kept to the Java/RE2-common subset; DuckDB standard
    // strings treat backslash literally, so '\.' is the escaped-dot regex
    // counts per cascade stage, matching piiRedact (each category counted
    // on the previous pass's output)
    "q65_pii_redact" ->
      s"""WITH r AS (
         |  SELECT doc_id, text,
         |    regexp_replace(text,
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g')
         |      AS after_email
         |  FROM documents),
         |r2 AS (
         |  SELECT doc_id, text, after_email,
         |    regexp_replace(after_email,
         |      '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g') AS after_ip
         |  FROM r)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
         |  CAST(len(regexp_extract_all(after_email,
         |    '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS INTEGER) AS n_ips,
         |  CAST(len(regexp_extract_all(after_ip, '[0-9]{7,}')) AS INTEGER) AS n_long_nums,
         |  md5(regexp_replace(after_ip, '[0-9]{7,}', '<NUM>', 'g')) AS redacted_md5
         |FROM r2""".stripMargin,
    // funnel predicates are the q34 oracle's twins (identical expression
    // trees → identical doubles → identical boundary comparisons)
    "q67_filter_funnel" ->
      """WITH toks AS (
        |  SELECT text, n_chars, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |f AS (
        |  SELECT n_chars >= 200 AS p1,
        |    CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) >= 0.4 AS p2,
        |    CAST(len(regexp_extract_all(lower(text),
        |      '\b(the|of|and|to|in|der|die|und|ist|nicht|le|la|et|les|des)\b')) AS DOUBLE)
        |      / CAST(len(t) AS DOUBLE) >= 0.02 AS p3
        |  FROM toks),
        |c AS (SELECT count(*) AS n0, count(*) FILTER (p1) AS n1,
        |  count(*) FILTER (p1 AND p2) AS n2,
        |  count(*) FILTER (p1 AND p2 AND p3) AS n3 FROM f)
        |SELECT '1_length' AS stage, n0 AS docs_in, n1 AS survivors, n0 - n1 AS dropped FROM c
        |UNION ALL SELECT '2_repetition', n1, n2, n1 - n2 FROM c
        |UNION ALL SELECT '3_language', n2, n3, n2 - n3 FROM c""".stripMargin,
    "q68_ngram_diversity" ->
      s"""WITH toks AS (
         |  SELECT source, string_split_regex(lower(trim(text)), '\\s+') AS t
         |  FROM documents),
         |g AS (
         |  SELECT source,
         |    unnest(list_transform(range(0, len(t) - 2),
         |      i -> ${md5Prefix32Sql("array_to_string(t[i+1:i+3], ' ')")})) AS g
         |  FROM toks WHERE len(t) >= 3)
         |SELECT source, count(*) AS n_grams, count(DISTINCT g) AS n_distinct,
         |  CAST(count(DISTINCT g) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS distinct_ratio
         |FROM g GROUP BY source""".stripMargin,
    "q69_source_overlap" ->
      s"""WITH toks AS (
         |  SELECT source, string_split_regex(lower(trim(text)), '\\s+') AS t
         |  FROM documents),
         |g0 AS (
         |  SELECT source,
         |    unnest(list_transform(range(0, len(t) - 7),
         |      i -> ${md5Prefix32Sql("array_to_string(t[i+1:i+8], ' ')")})) AS g
         |  FROM toks WHERE len(t) >= 8),
         |g AS (SELECT DISTINCT source, g FROM g0)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  count(DISTINCT a.g) AS n_shared_grams
         |FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
         |GROUP BY 1, 2""".stripMargin,
    // md5-of-text parity with the q35 fingerprint oracle
    "q78_snapshot_diff" ->
      """WITH v1 AS (
        |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 <> 0),
        |v2 AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 13 = 0 THEN text || ' [v2]' ELSE text END) AS h
        |  FROM documents WHERE doc_id % 11 <> 0)
        |SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN v1.h IS NULL THEN 'added'
        |       WHEN v2.h IS NULL THEN 'removed'
        |       WHEN v1.h = v2.h THEN 'unchanged'
        |       ELSE 'modified' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id""".stripMargin,
    "q76_top_ngrams" ->
      """WITH toks AS (
        |  SELECT string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
        |g AS (
        |  SELECT unnest(list_transform(range(0, len(t) - 1),
        |    i -> array_to_string(t[i+1:i+2], ' '))) AS gram
        |  FROM toks WHERE len(t) >= 2)
        |SELECT gram, count(*) AS n_occurrences FROM g GROUP BY gram
        |ORDER BY n_occurrences DESC, gram LIMIT 50""".stripMargin,
    // same deterministic (count desc, token asc) top-1000 vocabulary;
    // the count division is exact-integer → double on both engines
    "q145_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |vocab AS (
        |  SELECT tok FROM (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1)
        |  ORDER BY cnt DESC, tok ASC LIMIT 1000)
        |SELECT t.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
        |    AS oov_rate
        |FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        |GROUP BY 1""".stripMargin,
    "q72_boilerplate" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
         |  FROM documents),
         |w AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(0, CAST(ceil(len(t) / 32.0) AS BIGINT)),
         |      c -> ${md5Prefix32Sql("array_to_string(t[c*32+1 : c*32+32], ' ')")})) AS g
         |  FROM toks)
         |SELECT g, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences,
         |  min(doc_id) AS first_doc
         |FROM w GROUP BY g HAVING count(*) > 1""".stripMargin,
    // same aligned-unnest segment build; string_agg ORDER BY sid mirrors
    // the sort_array re-assembly, coalesce('') covers all-removed docs
    "q116_segment_dedup" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
         |  FROM documents),
         |seg AS (
         |  SELECT doc_id,
         |    unnest(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT))) AS sid,
         |    unnest(list_transform(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT)),
         |      c -> array_to_string(t[c*8+1 : c*8+8], ' '))) AS seg
         |  FROM toks),
         |hseg AS (
         |  SELECT doc_id, sid, seg, ${md5Prefix32Sql("seg")} AS g FROM seg),
         |dup AS (SELECT g, count(DISTINCT doc_id) AS n_docs FROM hseg GROUP BY 1),
         |j AS (
         |  SELECT h.doc_id, h.sid, h.seg,
         |    CAST(len(string_split(h.seg, ' ')) AS BIGINT) AS n_tok,
         |    d.n_docs < 3 AS keep
         |  FROM hseg h JOIN dup d USING (g))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_seg,
         |  CAST(coalesce(sum(CASE WHEN NOT keep THEN 1 END), 0) AS BIGINT) AS n_removed,
         |  CAST(coalesce(sum(CASE WHEN keep THEN n_tok END), 0) AS BIGINT) AS kept_tokens,
         |  ${md5Prefix32Sql("coalesce(string_agg(CASE WHEN keep THEN seg END, ' ' ORDER BY sid), '')")} AS kept_hash
         |FROM j GROUP BY doc_id""".stripMargin,
    "q70_quote_hits" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |p AS (
        |  SELECT doc_id AS probe_doc_id, array_to_string(t[9:20], ' ') AS probe
        |  FROM toks WHERE doc_id % 97 = 0 AND len(t) >= 20),
        |n AS (SELECT doc_id, array_to_string(t, ' ') AS norm FROM toks)
        |SELECT n.doc_id AS doc_id, p.probe_doc_id AS probe_doc_id
        |FROM n JOIN p ON contains(n.norm, p.probe)""".stripMargin,
    "q64_winnowing" ->
      s"""WITH codes AS (
         |  SELECT doc_id,
         |    list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT)) AS cs
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, ${rollingFpsSql("cs")} AS fps
         |  FROM codes)
         |SELECT doc_id,
         |  unnest(list_distinct(list_transform(range(0, len(fps) - 3),
         |    i -> list_min(fps[i+1:i+4])))) AS fp
         |FROM g WHERE len(fps) >= 4""".stripMargin,
    // q72's window hashes kept per doc, occurrence-count join back,
    // same >=2 shared rule and ppm floor
    "q244_doc_span_share" ->
      s"""WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
        |  FROM documents),
        |w AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(0, CAST(ceil(len(t) / 32.0) AS BIGINT)),
        |      c -> ${md5Prefix32Sql("array_to_string(t[c*32+1 : c*32+32], ' ')")})) AS g
        |  FROM toks),
        |df AS (SELECT g, CAST(count(*) AS BIGINT) AS occ FROM w GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
        |  CAST(COALESCE(sum(CASE WHEN occ >= 2 THEN 1 END), 0) AS BIGINT)
        |    AS n_shared,
        |  CAST(COALESCE(sum(CASE WHEN occ >= 2 THEN 1 END), 0) AS BIGINT)
        |    * 1000000 // CAST(count(*) AS BIGINT) AS shared_ppm
        |FROM w JOIN df USING (g) GROUP BY 1""".stripMargin,
    // same (n_chars, doc_id) rank order, same floor cut, same milli mean
    "q273_trimmed_mean" ->
      """WITH r AS (
        |  SELECT source, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS BIGINT) AS rk,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM documents)
        |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS kept_chars,
        |  CAST(sum(n_chars) * 1000 // count(*) AS BIGINT)
        |    AS trimmed_mean_milli
        |FROM r WHERE rk > n * 100 // 1000 AND rk <= n - n * 100 // 1000
        |GROUP BY 1""".stripMargin,
    // same two runs off the same tf table, same top-20 + rank windows,
    // same integer-floor reciprocal contributions, NULL-rank = 0
    "q258_rrf_fusion" ->
      """WITH stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_dl
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, n_chars AS dl,
        |          unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |        FROM documents)
        |  WHERE tok IN ('dup', 'spark', 'window', 'batch')
        |  GROUP BY 1, 2, 3),
        |idf AS (
        |  SELECT tok, CAST(len(bin(n_docs // df)) AS BIGINT) AS idf2
        |  FROM (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1)
        |  CROSS JOIN stats),
        |sc AS (
        |  SELECT doc_id, CAST(sum(idf2 * (CAST(22 AS HUGEINT) * tf.tf * total_dl * 1000000
        |      // (CAST(10 AS HUGEINT) * tf.tf * total_dl
        |          + CAST(3 AS HUGEINT) * total_dl
        |          + CAST(9 AS HUGEINT) * dl * n_docs)))
        |      AS BIGINT) AS score_micro
        |  FROM tf JOIN idf ON tf.tok = idf.tok CROSS JOIN stats
        |  GROUP BY 1),
        |bm AS (
        |  SELECT doc_id, CAST(row_number() OVER
        |      (ORDER BY score_micro DESC, doc_id) AS BIGINT) AS r_bm25
        |  FROM (SELECT * FROM sc ORDER BY score_micro DESC, doc_id LIMIT 20)),
        |dn AS (
        |  SELECT doc_id, CAST(row_number() OVER
        |      (ORDER BY density_micro DESC, doc_id) AS BIGINT) AS r_density
        |  FROM (SELECT doc_id, tf_sum * 1000000 // dl AS density_micro
        |        FROM (SELECT doc_id, dl, CAST(sum(tf) AS BIGINT) AS tf_sum
        |              FROM tf GROUP BY 1, 2)
        |        ORDER BY density_micro DESC, doc_id LIMIT 20))
        |SELECT COALESCE(bm.doc_id, dn.doc_id) AS doc_id, r_bm25, r_density,
        |  COALESCE(1000000000 // (60 + r_bm25), 0)
        |    + COALESCE(1000000000 // (60 + r_density), 0) AS rrf_e9
        |FROM bm FULL OUTER JOIN dn ON bm.doc_id = dn.doc_id""".stripMargin,
    // same tokenization, same multiset 3-gram counts, same ppm floor
    "q259_repetition_score" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, CAST(len(t) - 2 AS BIGINT) AS n_grams,
        |    unnest(list_transform(range(0, len(t) - 2),
        |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
        |  FROM toks WHERE len(t) >= 3),
        |c AS (
        |  SELECT doc_id, n_grams, g, CAST(count(*) AS BIGINT) AS c
        |  FROM g GROUP BY 1, 2, 3)
        |SELECT doc_id, n_grams, CAST(max(c) AS BIGINT) AS max_rep,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(max(c) * 1000000 // n_grams AS BIGINT) AS rep_ppm
        |FROM c GROUP BY 1, 2""".stripMargin,
    // same cross-multiplied integer-log2 ratio weights, same -64 cap,
    // same token-keyed score join
    "q260_importance_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |  FROM documents),
        |cs AS (SELECT t, CAST(count(*) AS BIGINT) AS n_s FROM toks GROUP BY 1),
        |ts AS (SELECT t, CAST(count(*) AS BIGINT) AS n_t FROM toks
        |  WHERE lang = 'en' GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS big_n_s,
        |    CAST(COALESCE(sum(CASE WHEN lang = 'en' THEN 1 END), 0) AS BIGINT)
        |      AS big_n_t
        |  FROM toks),
        |w AS (
        |  SELECT cs.t,
        |    CASE WHEN ts.n_t IS NULL THEN CAST(-64 AS BIGINT)
        |    WHEN CAST(ts.n_t AS HUGEINT) * big_n_s
        |         >= CAST(cs.n_s AS HUGEINT) * big_n_t
        |    THEN CAST(len(bin(CAST(CAST(ts.n_t AS HUGEINT) * big_n_s
        |      // (CAST(cs.n_s AS HUGEINT) * big_n_t) AS BIGINT))) AS BIGINT)
        |    ELSE -CAST(len(bin(CAST(CAST(cs.n_s AS HUGEINT) * big_n_t
        |      // (CAST(ts.n_t AS HUGEINT) * big_n_s) AS BIGINT))) AS BIGINT)
        |    END AS w
        |  FROM cs LEFT JOIN ts ON cs.t = ts.t CROSS JOIN tot)
        |SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_toks,
        |  CAST(sum(w.w) AS BIGINT) AS dsir_score
        |FROM toks JOIN w ON toks.t = w.t
        |GROUP BY 1, 2""".stripMargin,
    // same q33 predictions, same confusion rollup, same cleared ppm
    // floors with explicit zero-denominator classes
    "q267_langid_eval" ->
      """WITH pred AS (
        |  SELECT doc_id,
        |    CASE WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es AND h_en >= h_zh THEN 'en'
        |         WHEN h_de >= h_fr AND h_de >= h_es AND h_de >= h_zh THEN 'de'
        |         WHEN h_fr >= h_es AND h_fr >= h_zh THEN 'fr'
        |         WHEN h_es >= h_zh THEN 'es' ELSE 'zh' END AS pred_lang
        |  FROM (
        |    SELECT doc_id,
        |      len(regexp_extract_all(lower(text), '\b(the|of|and|to|in)\b')) AS h_en,
        |      len(regexp_extract_all(lower(text), '\b(der|die|und|ist|nicht)\b')) AS h_de,
        |      len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b')) AS h_fr,
        |      len(regexp_extract_all(lower(text), '\b(el|los|las|que|una)\b')) AS h_es,
        |      len(regexp_extract_all(text, '[一-鿿]')) AS h_zh
        |    FROM documents)),
        |cm AS (
        |  SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents d JOIN pred p ON d.doc_id = p.doc_id
        |  GROUP BY 1, 2),
        |cls AS (SELECT DISTINCT lang AS cls FROM cm
        |  UNION SELECT DISTINCT pred_lang FROM cm),
        |tp AS (SELECT lang AS cls, n AS tp FROM cm WHERE lang = pred_lang),
        |tt AS (SELECT lang AS cls, CAST(sum(n) AS BIGINT) AS n_truth
        |  FROM cm GROUP BY 1),
        |pt AS (SELECT pred_lang AS cls, CAST(sum(n) AS BIGINT) AS n_pred
        |  FROM cm GROUP BY 1),
        |j AS (
        |  SELECT cls.cls, COALESCE(tp.tp, 0) AS tp,
        |    COALESCE(pt.n_pred, 0) - COALESCE(tp.tp, 0) AS fp,
        |    COALESCE(tt.n_truth, 0) - COALESCE(tp.tp, 0) AS fn
        |  FROM cls LEFT JOIN tp ON cls.cls = tp.cls
        |  LEFT JOIN tt ON cls.cls = tt.cls
        |  LEFT JOIN pt ON cls.cls = pt.cls)
        |SELECT cls, tp, fp, fn,
        |  CASE WHEN tp + fp = 0 THEN 0
        |    ELSE tp * 1000000 // (tp + fp) END AS precision_ppm,
        |  CASE WHEN tp + fn = 0 THEN 0
        |    ELSE tp * 1000000 // (tp + fn) END AS recall_ppm,
        |  CASE WHEN 2 * tp + fp + fn = 0 THEN 0
        |    ELSE 2 * tp * 1000000 // (2 * tp + fp + fn) END AS f1_ppm
        |FROM j""".stripMargin,
    // same confusion seam, same cleared kappa ratio, Spark's
    // toward-zero div mirrored with the q229 sign-split
    "q268_langid_kappa" ->
      """WITH pred AS (
        |  SELECT doc_id,
        |    CASE WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es AND h_en >= h_zh THEN 'en'
        |         WHEN h_de >= h_fr AND h_de >= h_es AND h_de >= h_zh THEN 'de'
        |         WHEN h_fr >= h_es AND h_fr >= h_zh THEN 'fr'
        |         WHEN h_es >= h_zh THEN 'es' ELSE 'zh' END AS pred_lang
        |  FROM (
        |    SELECT doc_id,
        |      len(regexp_extract_all(lower(text), '\b(the|of|and|to|in)\b')) AS h_en,
        |      len(regexp_extract_all(lower(text), '\b(der|die|und|ist|nicht)\b')) AS h_de,
        |      len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b')) AS h_fr,
        |      len(regexp_extract_all(lower(text), '\b(el|los|las|que|una)\b')) AS h_es,
        |      len(regexp_extract_all(text, '[一-鿿]')) AS h_zh
        |    FROM documents)),
        |cm AS (
        |  SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents d JOIN pred p ON d.doc_id = p.doc_id
        |  GROUP BY 1, 2),
        |nn AS (SELECT CAST(sum(n) AS BIGINT) AS n_docs FROM cm),
        |dg AS (SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS n_agree
        |  FROM cm WHERE lang = pred_lang),
        |pe AS (
        |  SELECT CAST(COALESCE(sum(rt * ct), 0) AS BIGINT) AS pe_num FROM
        |    (SELECT lang, CAST(sum(n) AS BIGINT) AS rt FROM cm GROUP BY 1) r
        |  JOIN (SELECT pred_lang AS lang, CAST(sum(n) AS BIGINT) AS ct
        |    FROM cm GROUP BY 1) c ON r.lang = c.lang)
        |SELECT n_docs, n_agree, pe_num,
        |  CAST(CASE WHEN n_docs * n_docs = pe_num THEN 1000000
        |    WHEN n_docs * n_agree - pe_num < 0
        |    THEN -((pe_num - n_docs * n_agree) * 1000000
        |      // (n_docs * n_docs - pe_num))
        |    ELSE (n_docs * n_agree - pe_num) * 1000000
        |      // (n_docs * n_docs - pe_num) END AS BIGINT) AS kappa_ppm
        |FROM nn CROSS JOIN dg CROSS JOIN pe""".stripMargin,
    // same sentence/word/vowel-group regex counts, same two milli floors
    "q249_readability" ->
      """SELECT doc_id,
        |  CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
        |    AS n_sentences,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
        |    AS n_words,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |    AS n_syllables,
        |  CAST(CASE WHEN len(regexp_extract_all(lower(text), '[a-z]+')) > 0
        |    THEN 206835
        |      - (1015 * len(regexp_extract_all(lower(text), '[a-z]+')))
        |        // GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
        |      - (84600 * len(regexp_extract_all(lower(text), '[aeiouy]+')))
        |        // len(regexp_extract_all(lower(text), '[a-z]+'))
        |    END AS BIGINT) AS fre_milli
        |FROM documents""".stripMargin,
    // char-class profile: same regex classes, same integer-product Simpson
    // index (single division -> bit-identical doubles)
    "q94_charclass_profile" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS INTEGER) AS n_letters,
        |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS INTEGER) AS n_digits,
        |    CAST(length(text) - length(regexp_replace(text, '\s', '', 'g')) AS INTEGER) AS n_spaces,
        |    CAST(length(text) AS INTEGER) AS n
        |  FROM documents WHERE length(text) > 0),
        |cls AS (
        |  SELECT doc_id, n_letters, n_digits, n_spaces,
        |    n - n_letters - n_digits - n_spaces AS n_other
        |  FROM base)
        |SELECT doc_id, n_letters, n_digits, n_spaces, n_other,
        |  1.0 - CAST(n_letters * n_letters + n_digits * n_digits
        |      + n_spaces * n_spaces + n_other * n_other AS DOUBLE)
        |    / CAST((n_letters + n_digits + n_spaces + n_other)
        |      * (n_letters + n_digits + n_spaces + n_other) AS DOUBLE) AS class_diversity
        |FROM cls""".stripMargin,
    // HLL twin: same md5-prefix32 hash, register split, and scaled-integer
    // harmonic sum; bin()/conv(_,10,2) agree on minimal binary strings, and
    // the single float op is the final division by the folded constant
    "q102_hll_cardinality" ->
      s"""WITH $packedGramsSql,
        |regs AS (
        |  SELECT source, h % 256 AS reg,
        |    max(CASE WHEN (h // 256) = 0 THEN 25
        |             ELSE 25 - length(bin(h // 256)) END) AS rho
        |  FROM hashed GROUP BY 1, 2),
        |sk AS (
        |  SELECT source,
        |    CAST(sum(1::BIGINT << (40 - rho)) AS BIGINT)
        |      + (256 - CAST(count(*) AS BIGINT)) * 1099511627776 AS s_scaled,
        |    CAST(count(*) AS BIGINT) AS occupied
        |  FROM regs GROUP BY 1),
        |ex AS (
        |  SELECT source, CAST(count(DISTINCT g) AS BIGINT) AS n_exact
        |  FROM hashed GROUP BY 1)
        |SELECT ex.source, ex.n_exact, sk.occupied, sk.s_scaled,
        |  5.175699493294551e16 / CAST(sk.s_scaled AS DOUBLE) AS est
        |FROM ex JOIN sk USING (source)""".stripMargin,
    // same gram hash and register algebra as q102, computed twice: once
    // through per-source shard registers then merged by max, once directly
    // over the union — the graded row carries both plus the equality proof
    "q147_hll_merge" ->
      s"""WITH $packedGramsSql,
        |rho AS (
        |  SELECT source, h % 256 AS reg,
        |    CASE WHEN (h // 256) = 0 THEN 25
        |         ELSE 25 - length(bin(h // 256)) END AS rho
        |  FROM hashed),
        |shard AS (
        |  SELECT source, reg, max(rho) AS rho FROM rho GROUP BY 1, 2),
        |merged AS (
        |  SELECT reg, max(rho) AS rho FROM shard GROUP BY 1),
        |msk AS (
        |  SELECT CAST(sum(1::BIGINT << (40 - rho)) AS BIGINT)
        |      + (256 - CAST(count(*) AS BIGINT)) * 1099511627776 AS s_merged,
        |    CAST(count(*) AS BIGINT) AS occ_merged
        |  FROM merged),
        |direct AS (
        |  SELECT reg, max(rho) AS rho FROM rho GROUP BY 1),
        |dsk AS (
        |  SELECT CAST(sum(1::BIGINT << (40 - rho)) AS BIGINT)
        |      + (256 - CAST(count(*) AS BIGINT)) * 1099511627776 AS s_direct,
        |    CAST(count(*) AS BIGINT) AS occ_direct
        |  FROM direct),
        |ex AS (
        |  SELECT CAST(count(DISTINCT g) AS BIGINT) AS n_exact,
        |    CAST(count(DISTINCT source) AS BIGINT) AS n_shards
        |  FROM hashed)
        |SELECT n_shards, n_exact, occ_merged, s_merged, occ_direct, s_direct,
        |  s_merged = s_direct AND occ_merged = occ_direct AS merge_eq_direct,
        |  5.175699493294551e16 / CAST(s_merged AS DOUBLE) AS est
        |FROM ex CROSS JOIN msk CROSS JOIN dsk""".stripMargin,
    // same register algebra pairwise: scaled harmonic sums as exact
    // BIGINTs, the estimate evaluated in the same (a + b) - union order
    "q157_hll_intersection" ->
      s"""WITH $packedGramsSql,
        |regs AS (
        |  SELECT source, h % 256 AS reg,
        |    max(CASE WHEN (h // 256) = 0 THEN 25
        |             ELSE 25 - length(bin(h // 256)) END) AS rho
        |  FROM hashed GROUP BY 1, 2),
        |single AS (
        |  SELECT source,
        |    CAST(sum(1::BIGINT << (40 - rho)) AS BIGINT)
        |      + (256 - CAST(count(*) AS BIGINT)) * 1099511627776 AS s
        |  FROM regs GROUP BY 1),
        |pr AS (
        |  SELECT x.source AS sa, y.source AS sb
        |  FROM (SELECT DISTINCT source FROM regs) x
        |  JOIN (SELECT DISTINCT source FROM regs) y ON x.source < y.source),
        |un AS (
        |  SELECT pr.sa, pr.sb, r.reg, max(r.rho) AS rho
        |  FROM pr JOIN regs r ON r.source = pr.sa OR r.source = pr.sb
        |  GROUP BY 1, 2, 3),
        |usk AS (
        |  SELECT sa, sb,
        |    CAST(sum(1::BIGINT << (40 - rho)) AS BIGINT)
        |      + (256 - CAST(count(*) AS BIGINT)) * 1099511627776 AS s_union
        |  FROM un GROUP BY 1, 2),
        |dg AS (SELECT DISTINCT source, g FROM hashed),
        |ex AS (
        |  SELECT a.source AS sa, b.source AS sb,
        |    CAST(count(*) AS BIGINT) AS n_inter_exact
        |  FROM dg a JOIN dg b ON a.g = b.g AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT u.sa, u.sb,
        |  COALESCE(ex.n_inter_exact, 0) AS n_inter_exact,
        |  a.s AS s_a, b.s AS s_b, u.s_union,
        |  (5.175699493294551e16 / CAST(a.s AS DOUBLE)
        |     + 5.175699493294551e16 / CAST(b.s AS DOUBLE))
        |    - 5.175699493294551e16 / CAST(u.s_union AS DOUBLE) AS est_inter
        |FROM usk u
        |JOIN single a ON a.source = u.sa
        |JOIN single b ON b.source = u.sb
        |LEFT JOIN ex ON ex.sa = u.sa AND ex.sb = u.sb""".stripMargin,
    // same tokenizer, same overlapping pair positions, same greedy
    // replace-shrinkage count (replace is left-to-right in both engines)
    "q167_bpe_merge" ->
      """WITH wt AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |  FROM documents),
        |w2 AS (SELECT w FROM wt WHERE length(w) >= 2),
        |p AS (
        |  SELECT unnest(list_transform(range(1, length(w)),
        |    i -> substring(w, CAST(i AS INTEGER), 2))) AS pair
        |  FROM w2),
        |top AS (
        |  SELECT pair, CAST(count(*) AS BIGINT) AS n_pair
        |  FROM p GROUP BY 1 ORDER BY n_pair DESC, pair LIMIT 10)
        |SELECT t.pair, t.n_pair,
        |  CAST(sum(length(w2.w) - length(replace(w2.w, t.pair, chr(1))))
        |    AS BIGINT) AS n_applied
        |FROM w2 CROSS JOIN top t
        |GROUP BY 1, 2""".stripMargin,
    // same tokenizer; bigrams from list adjacency (positionally equal to
    // the Spark side's postings self-join), same (count, phrase) top-3
    "q169_phrase_search" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |    i -> t[CAST(i AS INTEGER)] || ' ' || t[CAST(i + 1 AS INTEGER)])) AS phrase
        |  FROM toks)
        |SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM bg GROUP BY 1
        |ORDER BY n_occurrences DESC, phrase LIMIT 3""".stripMargin,
    // same (source, value) grid, same scaled CDF-difference integers,
    // same max/sum-by-gap aggregates and single divisions
    "q172_ks_drift" ->
      """WITH vc AS (
        |  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |vals AS (SELECT DISTINCT v FROM vc),
        |srcs AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM vc GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n FROM srcs),
        |gv AS (SELECT v, CAST(sum(c) AS BIGINT) AS g FROM vc GROUP BY 1),
        |grid AS (
        |  SELECT s.source, s.n_s, va.v, COALESCE(vc.c, 0) AS c
        |  FROM srcs s CROSS JOIN vals va
        |  LEFT JOIN vc ON vc.source = s.source AND vc.v = va.v),
        |cum AS (
        |  SELECT grid.source, grid.n_s, grid.v, gv.g, tot.n,
        |    CAST(sum(grid.c) OVER (PARTITION BY grid.source ORDER BY grid.v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cs,
        |    CAST(sum(gv.g) OVER (PARTITION BY grid.source ORDER BY grid.v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cg,
        |    COALESCE(lead(grid.v) OVER (PARTITION BY grid.source ORDER BY grid.v)
        |      - grid.v, 0) AS gap
        |  FROM grid JOIN gv ON gv.v = grid.v CROSS JOIN tot),
        |d AS (
        |  SELECT source, n_s, n,
        |    abs(CAST(cs AS HUGEINT) * (n - n_s)
        |      - CAST(cg - cs AS HUGEINT) * n_s) AS diff, gap
        |  FROM cum)
        |SELECT source, n_s, n - n_s AS n_rest,
        |  CAST(max(diff) * 1000000
        |    // (CAST(n_s AS HUGEINT) * (n - n_s)) AS BIGINT) AS d_ppm,
        |  CAST(sum(diff * gap) * 1000000
        |    // (CAST(n_s AS HUGEINT) * (n - n_s)) AS BIGINT) AS w1_micro
        |FROM d GROUP BY 1, 2, n""".stripMargin,
    // same tokenizer, same count-of-counts fold, same guarded one-
    // expression Chao1 and floored Good-Turing ppm
    "q176_vocab_richness" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |  FROM documents),
        |tc AS (
        |  SELECT source, t, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY 1, 2),
        |cc AS (
        |  SELECT source, c, CAST(count(*) AS BIGINT) AS f
        |  FROM tc GROUP BY 1, 2),
        |m AS (
        |  SELECT source,
        |    CAST(sum(c * f) AS BIGINT) AS n_tokens,
        |    CAST(sum(f) AS BIGINT) AS d_types,
        |    CAST(COALESCE(sum(CASE WHEN c = 1 THEN f END), 0) AS BIGINT) AS f1,
        |    CAST(COALESCE(sum(CASE WHEN c = 2 THEN f END), 0) AS BIGINT) AS f2
        |  FROM cc GROUP BY 1)
        |SELECT source, n_tokens, d_types, f1, f2,
        |  f1 * 1000000 // n_tokens AS gt_unseen_ppm,
        |  CASE WHEN f2 > 0
        |    THEN CAST(d_types AS DOUBLE)
        |      + CAST(f1 * f1 AS DOUBLE) / CAST(2 * f2 AS DOUBLE)
        |    ELSE CAST(d_types AS DOUBLE) END AS chao1
        |FROM m""".stripMargin,
    // same distinct postings, same (df DESC, tok) top-20, same binary-
    // length varint formula and exact ppm ratio
    "q178_postings_compression" ->
      """WITH p AS (
        |  SELECT DISTINCT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok,
        |    doc_id
        |  FROM documents),
        |top AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS df
        |  FROM p GROUP BY 1 ORDER BY df DESC, tok LIMIT 20),
        |g AS (
        |  SELECT p.tok, top.df,
        |    COALESCE(p.doc_id - lag(p.doc_id) OVER
        |      (PARTITION BY p.tok ORDER BY p.doc_id), p.doc_id + 1) AS gap
        |  FROM p JOIN top USING (tok)),
        |v AS (
        |  SELECT tok, df,
        |    CAST((length(bin(gap)) + 6) // 7 AS BIGINT) AS vb
        |  FROM g)
        |SELECT tok, df, df * 8 AS raw_bytes,
        |  CAST(sum(vb) AS BIGINT) AS varint_bytes,
        |  CAST(sum(vb) AS BIGINT) * 1000000 // (df * 8) AS ratio_ppm
        |FROM v GROUP BY 1, 2""".stripMargin,
    // same distinct (source, token) table, the same three unrolled
    // greedy rounds with (gain DESC, source) argmax and NOT EXISTS
    // freshness — MATERIALIZED for the q151 inlining reason
    "q185_greedy_coverage" ->
      s"""WITH $packedGramsSql,
        |st AS MATERIALIZED (SELECT DISTINCT source, g AS t FROM sh),
        |g1 AS (SELECT source, CAST(count(*) AS BIGINT) AS gain FROM st GROUP BY 1),
        |p1 AS MATERIALIZED (
        |  SELECT source, gain FROM g1 ORDER BY gain DESC, source LIMIT 1),
        |c1 AS MATERIALIZED (
        |  SELECT DISTINCT t FROM st JOIN p1 USING (source)),
        |g2 AS (
        |  SELECT s.source, CAST(count(*) AS BIGINT) AS gain FROM st s
        |  WHERE NOT EXISTS (SELECT 1 FROM c1 WHERE c1.t = s.t)
        |    AND s.source NOT IN (SELECT source FROM p1)
        |  GROUP BY 1),
        |p2 AS MATERIALIZED (
        |  SELECT source, gain FROM g2 ORDER BY gain DESC, source LIMIT 1),
        |c2 AS MATERIALIZED (
        |  SELECT t FROM c1 UNION SELECT t FROM st JOIN p2 USING (source)),
        |g3 AS (
        |  SELECT s.source, CAST(count(*) AS BIGINT) AS gain FROM st s
        |  WHERE NOT EXISTS (SELECT 1 FROM c2 WHERE c2.t = s.t)
        |    AND s.source NOT IN (SELECT source FROM p1)
        |    AND s.source NOT IN (SELECT source FROM p2)
        |  GROUP BY 1),
        |p3 AS MATERIALIZED (
        |  SELECT source, gain FROM g3 ORDER BY gain DESC, source LIMIT 1),
        |c3 AS MATERIALIZED (
        |  SELECT t FROM c2 UNION SELECT t FROM st JOIN p3 USING (source))
        |SELECT CAST(1 AS BIGINT) AS round, source, gain,
        |  (SELECT CAST(count(*) AS BIGINT) FROM c1) AS covered_total FROM p1
        |UNION ALL
        |SELECT 2, source, gain,
        |  (SELECT CAST(count(*) AS BIGINT) FROM c2) FROM p2
        |UNION ALL
        |SELECT 3, source, gain,
        |  (SELECT CAST(count(*) AS BIGINT) FROM c3) FROM p3""".stripMargin,
    // same integer rank arithmetic; the global order statistic is
    // tie-insensitive, so row_number's arbitrary tie order is safe
    "q186_quantile_normalize" ->
      """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
        |s AS (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n_s
        |  FROM d),
        |tot AS (SELECT count(*) AS n FROM d),
        |g AS (
        |  SELECT n_chars AS gv,
        |    row_number() OVER (ORDER BY n_chars) AS gpos
        |  FROM d)
        |SELECT s.doc_id, s.source, s.n_chars,
        |  CAST(s.rn AS BIGINT) AS rank_in_source,
        |  g.gv AS norm_chars
        |FROM s CROSS JOIN tot
        |JOIN g ON g.gpos = (s.rn * tot.n + s.n_s - 1) // s.n_s""".stripMargin,
    // same cleared-denominator integer BM25, same micro floors, same
    // (score DESC, doc_id) top-20
    "q224_bm25_search" ->
      """WITH stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_dl
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, n_chars AS dl,
        |          unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |        FROM documents)
        |  WHERE tok IN ('dup', 'spark', 'window', 'batch')
        |  GROUP BY 1, 2, 3),
        |idf AS (
        |  SELECT tok, CAST(len(bin(n_docs // df)) AS BIGINT) AS idf2
        |  FROM (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1)
        |  CROSS JOIN stats),
        |sc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_matched,
        |    CAST(sum(idf2 * (CAST(22 AS HUGEINT) * tf.tf * total_dl * 1000000
        |      // (CAST(10 AS HUGEINT) * tf.tf * total_dl
        |          + CAST(3 AS HUGEINT) * total_dl
        |          + CAST(9 AS HUGEINT) * dl * n_docs)))
        |      AS BIGINT) AS score_micro
        |  FROM tf JOIN idf ON tf.tok = idf.tok CROSS JOIN stats
        |  GROUP BY 1)
        |SELECT doc_id, n_terms_matched, score_micro FROM sc
        |ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin,
    // same (source, token) counts, same integer-log2 source-idf weight,
    // same (score DESC, tok) top-5 per source
    "q217_source_keywords" ->
      """WITH tf AS (
        |  SELECT source, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT source,
        |          unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |s AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_sources FROM tf),
        |sc AS (
        |  SELECT tf.source, tf.tok, tf.tf, df.df,
        |    tf.tf * CAST(len(bin(n_sources // df.df)) AS BIGINT) AS score
        |  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN s)
        |SELECT source, tok, tf, df, score, CAST(rank AS BIGINT) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY score DESC, tok) AS rank
        |  FROM sc) WHERE rank <= 5""".stripMargin,
    // same word/digit/other decomposition as q53, same per-language sums
    // and milli floors
    "q219_token_fertility" ->
      """WITH base AS (
        |  SELECT lang, n_chars,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS nw,
        |    CAST(COALESCE(list_sum(list_transform(
        |        regexp_extract_all(text, '[A-Za-z]+'), w -> (length(w) + 3) // 4)), 0)
        |      + len(regexp_extract_all(text, '[0-9]'))
        |      + len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS nb
        |  FROM documents),
        |ag AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |    CAST(sum(nw) AS BIGINT) AS total_words,
        |    CAST(sum(nb) AS BIGINT) AS total_bpe
        |  FROM base GROUP BY 1)
        |SELECT lang, n_docs, total_chars, total_words, total_bpe,
        |  total_bpe * 1000 // total_words AS fertility_milli,
        |  total_chars * 1000 // total_bpe AS chars_per_token_milli
        |FROM ag WHERE total_words > 0 AND total_bpe > 0""".stripMargin,
    // same char split, same floor-log2 entropy numerator, same milli floor
    "q211_char_entropy" ->
      """WITH cc AS (
        |  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch
        |        FROM documents)
        |  WHERE ch <> '' GROUP BY 1, 2),
        |ag AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars_counted,
        |    CAST(count(*) AS BIGINT) AS n_distinct_chars,
        |    CAST(sum(c * (len(bin(c)) - 1)) AS BIGINT) AS sum_c_log
        |  FROM cc GROUP BY 1)
        |SELECT doc_id, n_chars_counted, n_distinct_chars, sum_c_log,
        |  (n_chars_counted * (len(bin(n_chars_counted)) - 1) - sum_c_log)
        |    * 1000 // n_chars_counted AS entropy_milli_bits
        |FROM ag""".stripMargin,
    // same tokenization, same integer-log2 surprisal bits, same final
    // milli floor division
    "q207_lm_surprisal" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id,
        |          unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |vocab AS (SELECT tok, CAST(sum(c) AS BIGINT) AS ct FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS n_total FROM vocab),
        |bits AS (
        |  SELECT tok, CAST(len(bin(n_total // ct)) AS BIGINT) AS b
        |  FROM vocab CROSS JOIN tot)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(sum(c * b) AS BIGINT) AS surprisal_bits,
        |  CAST(sum(c * b) AS BIGINT) * 1000 // CAST(sum(c) AS BIGINT)
        |    AS bits_per_token_milli
        |FROM tf JOIN bits USING (tok) GROUP BY 1""".stripMargin,
    // same (metric, doc_id) tie-broken per-source ranks, exact d² sums,
    // the same fixed IEEE rho expression
    "q202_spearman" ->
      """WITH t AS (
        |  SELECT source, doc_id, n_chars,
        |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |rk AS (
        |  SELECT source,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r1,
        |    row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS r2
        |  FROM t),
        |ag AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum((r1 - r2) * (r1 - r2)) AS BIGINT) AS sum_d2
        |  FROM rk GROUP BY 1)
        |SELECT source, n_docs, sum_d2,
        |  CASE WHEN n_docs > 1 THEN
        |    1.0 - (6.0 * CAST(sum_d2 AS DOUBLE))
        |      / (CAST(n_docs AS DOUBLE) * CAST(n_docs * n_docs - 1 AS DOUBLE))
        |  ELSE NULL END AS rho
        |FROM ag""".stripMargin,
    // same tokenizer, same IN-list term filter, same integer-log2 idf via
    // binary length, same (score DESC, doc_id) top-20 total order
    "q197_tfidf_search" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |qt AS (
        |  SELECT doc_id, tok FROM toks
        |  WHERE tok IN ('dup', 'spark', 'window', 'batch')),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |tf AS (
        |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM qt GROUP BY 1, 2),
        |idf AS (
        |  SELECT tok,
        |    CAST(length(bin((SELECT n_docs FROM n) // count(*))) AS BIGINT) AS idf2
        |  FROM tf GROUP BY tok),
        |sc AS (
        |  SELECT tf.doc_id, CAST(count(*) AS BIGINT) AS n_terms_matched,
        |    CAST(sum(tf.tf * idf.idf2) AS BIGINT) AS score
        |  FROM tf JOIN idf USING (tok) GROUP BY 1)
        |SELECT doc_id, n_terms_matched, score FROM (
        |  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rn FROM sc)
        |WHERE rn <= 20""".stripMargin,
    // same tokenizer, HUGEINT count-squared products, identical division
    // order for the two reported ratios
    "q153_token_diversity" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY 1, 2),
        |m AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    CAST(sum(CAST(c AS HUGEINT) * (c - 1)) AS BIGINT) AS rep_pairs
        |  FROM c GROUP BY 1)
        |SELECT source, n_tokens, n_types, rep_pairs,
        |  CAST(rep_pairs AS DOUBLE)
        |    / CAST(CAST(n_tokens AS HUGEINT) * (n_tokens - 1) AS DOUBLE) AS simpson,
        |  CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr
        |FROM m""".stripMargin,
    // same integer bucket/threshold/edge algebra; the exact side is the
    // (n_chars, doc_id)-ordered row_number probe at rank t
    "q109_hist_quantiles" ->
      """WITH mm AS (
        |  SELECT source, min(n_chars) AS lo, max(n_chars) AS hi,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |hist AS (
        |  SELECT source, ((n_chars - lo) * 256) // (hi - lo + 1) AS b, count(*) AS c
        |  FROM documents JOIN mm USING (source) GROUP BY 1, 2),
        |cum AS (
        |  SELECT source, b, sum(c) OVER (PARTITION BY source ORDER BY b) AS cm FROM hist),
        |th AS (
        |  SELECT source, lo, hi, n, p, (p * n + 99) // 100 AS t
        |  FROM mm, unnest([50, 90, 99]) AS u(p)),
        |est AS (
        |  SELECT th.source, th.p, th.lo, th.hi, min(cum.b) AS eb
        |  FROM th JOIN cum ON th.source = cum.source AND cum.cm >= th.t
        |  GROUP BY 1, 2, 3, 4),
        |ranked AS (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn
        |  FROM documents),
        |ex AS (
        |  SELECT th.source, th.p, r.n_chars AS exact_v
        |  FROM th JOIN ranked r ON th.source = r.source AND r.rn = th.t)
        |SELECT e.source, e.p, ex.exact_v,
        |  e.lo + ((e.eb + 1) * (e.hi - e.lo + 1)) // 256 - 1 AS est_v,
        |  (e.lo + ((e.eb + 1) * (e.hi - e.lo + 1)) // 256 - 1) - ex.exact_v AS err
        |FROM est e JOIN ex USING (source, p)""".stripMargin,
    // collocation lift: exact integer products, one double division each
    "q95_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
        |uni AS (SELECT unnest(t) AS term FROM toks),
        |uc AS (SELECT term, count(*) AS c FROM uni GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM uc),
        |bg AS (
        |  SELECT unnest(list_transform(range(0, len(t) - 1),
        |    i -> t[i+1] || ' ' || t[i+2])) AS bigram
        |  FROM toks WHERE len(t) >= 2),
        |bc AS (SELECT bigram, count(*) AS c_xy FROM bg GROUP BY 1 HAVING count(*) >= 5),
        |sp AS (
        |  SELECT bigram, c_xy,
        |    string_split(bigram, ' ')[1] AS t1, string_split(bigram, ' ')[2] AS t2
        |  FROM bc),
        |j AS (
        |  SELECT sp.bigram, sp.c_xy, u1.c AS c1, u2.c AS c2,
        |    CAST(sp.c_xy * tot.n_total AS DOUBLE) / CAST(u1.c * u2.c AS DOUBLE) AS lift
        |  FROM sp JOIN uc u1 ON sp.t1 = u1.term JOIN uc u2 ON sp.t2 = u2.term CROSS JOIN tot)
        |SELECT bigram, c_xy, c1, c2, lift FROM j
        |ORDER BY lift DESC, bigram LIMIT 50""".stripMargin,
    // z-scores from exact integer sums: Var = (n*ss - s*s) / n^2, one
    // division + one sqrt -> bit-identical doubles on both engines
    "q99_zscore_norm" ->
      """WITH st AS (
        |  SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS s,
        |         CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
        |  FROM documents GROUP BY 1)
        |SELECT d.doc_id, d.source, d.n_chars,
        |  (CAST(d.n_chars AS DOUBLE) - CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE))
        |    / sqrt(CAST(st.n * st.ss - st.s * st.s AS DOUBLE)
        |      / CAST(st.n * st.n AS DOUBLE)) AS z
        |FROM documents d JOIN st USING (source)""".stripMargin,
  )
}
