package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline over the
  * `documents` table: token stats, language ID, quality scoring, document
  * fingerprinting. All pure codegen'd built-ins — no UDFs on the hot path,
  * so the whole stage stays inside WholeStageCodegen at any scale.
  */
object TextAnalysis {

  /** Whitespace tokenization of lowercased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** First 32 bits of md5 as a non-negative long in [0, 2³²) — the
    * cross-engine hash used wherever a query result must be reproducible
    * outside Spark (murmur3/xxhash64 have no portable twin; md5 is
    * bit-identical in every engine). Codegen'd built-ins only.
    */
  def md5Prefix32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Count of regex word matches (word-boundary alternation) in the PASSED
    * column (not a hard-coded column name).
    */
  private def wordHits(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lower(text), lit(s"\\b(${words.mkString("|")})\\b"), lit(0)))

  private val enWords = Seq("the", "of", "and", "to", "in")
  private val deWords = Seq("der", "die", "und", "ist", "nicht")
  private val frWords = Seq("le", "la", "et", "les", "des")

  /** Token statistics per document: token count, distinct-token count,
    * char length, mean token length (exact integer sums → stable division).
    */
  def tokenStats(documents: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    documents.select(
      col("doc_id"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_distinct_tokens"),
      length(col("text")).as("char_len"),
      (aggregate(transform(t, x => length(x)), lit(0), (acc, x) => acc + x).cast("double")
        / size(t)).as("avg_token_len"))
  }

  /** N-gram-heuristic language ID: stopword-hit counts per candidate
    * language, argmax with fixed priority en > de > fr on ties.
    * (The container ships no language-ID model; this is the classic
    * stopword-profile heuristic, fully deterministic and distributable.)
    */
  def langId(documents: DataFrame): DataFrame = {
    val hEn = wordHits(col("text"), enWords)
    val hDe = wordHits(col("text"), deWords)
    val hFr = wordHits(col("text"), frWords)
    documents.select(
      col("doc_id"),
      hEn.as("h_en"), hDe.as("h_de"), hFr.as("h_fr"),
      when(hEn >= hDe && hEn >= hFr, lit("en"))
        .when(hDe >= hFr, lit("de"))
        .otherwise(lit("fr")).as("pred_lang"))
  }

  /** Heuristic quality score in [0,1]: length credit, moderate punctuation,
    * stopword presence, type-token ratio. Single deterministic expression
    * tree → bit-identical across engines.
    */
  def qualityScore(documents: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val nTok = size(t).cast("double")
    val punct = (length(col("text"))
      - length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("double")
    val stop = wordHits(col("text"), enWords).cast("double")
    val ttr = size(array_distinct(t)).cast("double") / nTok
    val lenCredit = least(nTok / lit(50.0), lit(1.0))
    val punctRatio = punct / length(col("text")).cast("double")
    val stopRatio = stop / nTok
    documents.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      punctRatio.as("punct_ratio"),
      stopRatio.as("stopword_ratio"),
      ttr.as("type_token_ratio"),
      (lit(0.4) * lenCredit + lit(0.2) * least(stopRatio * 5.0, lit(1.0))
        + lit(0.2) * ttr + lit(0.2) * (lit(1.0) - least(punctRatio * 10.0, lit(1.0))))
        .as("quality_score"))
  }

  /** Content fingerprints: md5 (cross-engine canonical) plus a 64-bit
    * xxhash64 for cheap grouping. Both codegen'd.
    */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      md5(col("text").cast("binary")).as("fp_md5"),
      xxhash64(col("text")).as("fp_xx64"))

  /** Word n-gram shingles of a document, distinct: e.g. n=3 →
    * "w1 w2 w3", "w2 w3 w4", ... Used by exact-Jaccard and MinHash dedup.
    * Documents shorter than n tokens yield no shingles (guard keeps
    * element_at in bounds — Spark 4 runs ANSI mode by default).
    */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    // one reference to the token array per lambda element (slice), not n
    // (element_at×n): interpreted higher-order lambdas re-evaluate every
    // referenced subtree per element, so each extra reference re-runs the
    // regex split for every shingle of every row
    when(size(t) >= n,
      array_distinct(
        transform(
          sequence(lit(0), size(t) - n),
          i => array_join(slice(t, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }
}
