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

/** Registry: near-duplicate detection queries — one `queries` entry and one DuckDB
  * `oracles` twin per graded query. Composed into SparkEntry (driver
  * contract); keys must stay globally unique across registries
  * (spec-asserted in EntrySpec).
  */
private[graft] object DedupRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_dedup_exact" -> ((s, dir) => Dedup.exactGroups(Tables.documents(s, dir))),
    "q31_dedup_canonical" -> ((s, dir) => Dedup.dropExactDuplicates(Tables.documents(s, dir))),
    "q36_ngram_jaccard" -> ((s, dir) => jaccardPairs(s, dir)),
    "q39_dedup_minhash" -> ((s, dir) => mhPairs(s, dir)),
    "q40_dedup_simhash" -> ((s, dir) => Dedup.simhashPairs(Tables.documents(s, dir))),
    // end-to-end dedup: LSH pairs -> transitive closure -> cluster labels
    "q45_dedup_clusters" -> ((s, dir) => nearDupClusterLabels(s, dir)),
    // ingestion-time dedup: incoming batch (doc_id%10<3) LSH-checked against
    // the standing corpus (the rest) — no corpus self-join
    "q59_incremental_neardup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.incrementalNearDups(
        docs.where(col("doc_id") % 10 >= 3), docs.where(col("doc_id") % 10 < 3))
    }),
    // benchmark decontamination: train docs sharing any word-8-gram with the
    // held-out test split (doc_id%5==0)
    "q60_contamination" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.crossCorpusContamination(
        docs.where(col("doc_id") % 5 =!= 0), docs.where(col("doc_id") % 5 === 0))
    }),
    // soft dedup: weight 1/|cluster| instead of dropping near-dups;
    // shares the memoized q45 cluster frame (one LSH/CC run per session)
    "q73_dedup_weights" -> ((s, dir) =>
      Dedup.weightsFromClusters(nearDupClusterLabels(s, dir))),
    // leakage-free holdout: split by salted CLUSTER hash, so near-dups of
    // heldout docs can never appear in training (same memoized frame)
    "q88_leakage_split" -> ((s, dir) =>
      TrainingMix.leakageFreeSplit(nearDupClusterLabels(s, dir))),
    // LSH configuration grading: precision/recall of the MinHash candidate
    // set vs the exact n-gram Jaccard truth at the same 0.5 threshold
    "q85_lsh_quality" -> ((s, dir) =>
      Dedup.lshQualityFrom(mhPairs(s, dir).select("a_id", "b_id"),
        jaccardPairs(s, dir).select("a_id", "b_id"))),
    // hashing-trick doc vectors: zero-vocabulary sparse counts, the
    // only fit-free vectorizer at corpus scale (memoized for q262)
    "q261_hashed_vectorizer" -> ((s, dir) => hashedVectors(s, dir)),
    // two-stage near-dup pipeline: MinHash recall -> hashed-vector
    // cos^2 ppm re-rank, |pairs|x64-bounded dot join
    "q262_rerank_candidates" -> ((s, dir) =>
      Dedup.rerankCandidates(mhPairs(s, dir), hashedVectors(s, dir))),
    // sorted-neighborhood blocking (merge/purge): prefix-sorted window
    // candidates verified by exact token Jaccard >= 1/2
    "q104_sorted_neighborhood" -> ((s, dir) =>
      Dedup.sortedNeighborhoodPairs(Tables.documents(s, dir))),
    // prefix-filtered EXACT set-similarity join (PPJoin): q36's pairs
    // from ~1/12th the candidates, rarest-first prefixes as skew guard
    "q106_ppjoin" -> ((s, dir) =>
      Dedup.ppjoinPairsFrom(shingleSets(s, dir))),
    // Levenshtein fuzzy matches over sorted-neighborhood candidates
    // (string-metric family: edits/transpositions token sets miss)
    "q110_edit_distance" -> ((s, dir) =>
      Dedup.editDistancePairs(Tables.documents(s, dir))),
    // asymmetric containment pairs: the quote/subset detector a symmetric
    // Jaccard threshold misses (same inverted-index skeleton as q36)
    "q133_containment" -> ((s, dir) =>
      Dedup.containmentPairsFrom(shingleIndex(s, dir))),
  )

  def oracles: Map[String, String] = Map(
    "q30_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies, md5(text) AS text_md5
        |FROM documents GROUP BY text""".stripMargin,
    "q31_dedup_canonical" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)""".stripMargin,
    "q39_dedup_minhash" -> minhashOracle,
    "q40_dedup_simhash" -> simhashOracle,
    "q45_dedup_clusters" -> nearDupClustersOracle,
    // the q45 cluster labels (recursive-CTE twin) + the salted 0.1 split
    "q88_leakage_split" ->
      s"""WITH cl AS ($nearDupClustersOracle)
         |SELECT doc_id, cluster,
         |  CASE WHEN ${md5Prefix32Sql("'split:v1:' || CAST(cluster AS VARCHAR)")} % 1000 < 100
         |       THEN 'heldout' ELSE 'train' END AS split
         |FROM cl""".stripMargin,
    "q59_incremental_neardup" -> incrementalNearDupOracle,
    "q60_contamination" -> contaminationOracle,
    // the q45 cluster oracle wrapped with a per-cluster count window;
    // 1.0/bigint is a single exact-operand IEEE division on both engines
    "q73_dedup_weights" ->
      s"""SELECT doc_id, cluster,
         |  count(*) OVER (PARTITION BY cluster) AS cluster_size,
         |  CAST(1 AS DOUBLE) / (count(*) OVER (PARTITION BY cluster)) AS weight
         |FROM ($nearDupClustersOracle) base""".stripMargin,
    // shingles are md5-prefix-hashed to BIGINT before the self-join on BOTH
    // sides (narrow shuffle keys in Spark, identical collision behavior in
    // the oracle) — see Dedup.ngramJaccardPairs
    "q36_ngram_jaccard" -> ngramJaccardOracle,
    // LSH quality report card: precision/recall of the q39 candidate set
    // against the q36 exact-Jaccard truth — both sides independently
    // oracled, so the grading query composes their CTEs
    "q85_lsh_quality" ->
      s"""WITH est AS ($minhashOracle),
         |truth AS ($ngramJaccardOracle),
         |h AS (SELECT count(*) AS n_hits FROM est e
         |      JOIN truth t ON e.a_id = t.a_id AND e.b_id = t.b_id),
         |c AS (SELECT count(*) AS n_candidates FROM est),
         |tr AS (SELECT count(*) AS n_truth FROM truth)
         |SELECT c.n_candidates, tr.n_truth, h.n_hits,
         |  CASE WHEN c.n_candidates = 0 THEN CAST(0 AS DOUBLE)
         |       ELSE CAST(h.n_hits AS DOUBLE) / c.n_candidates END AS lsh_precision,
         |  CASE WHEN tr.n_truth = 0 THEN CAST(0 AS DOUBLE)
         |       ELSE CAST(h.n_hits AS DOUBLE) / tr.n_truth END AS lsh_recall
         |FROM c CROSS JOIN tr CROSS JOIN h""".stripMargin,
    // same md5-prefix32 dimension hash, same mod-64 buckets, same counts
    "q261_hashed_vectorizer" ->
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
        |  FROM documents)
        |SELECT doc_id, ${md5Prefix32Sql("t")} % 64 AS dim,
        |  CAST(count(*) AS BIGINT) AS weight
        |FROM toks GROUP BY 1, 2""".stripMargin,
    // same MinHash candidates, same hashed vectors, same cross-
    // multiplied cos^2 ppm
    "q262_rerank_candidates" ->
      s"""WITH $minhashCtes,
        |hv AS (
        |  SELECT doc_id, ${md5Prefix32Sql("tk")} % 64 AS dim,
        |    CAST(count(*) AS BIGINT) AS w
        |  FROM (SELECT doc_id, unnest(t) AS tk FROM toks)
        |  GROUP BY 1, 2),
        |nrm AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS s2
        |  FROM hv GROUP BY 1),
        |dots AS (
        |  SELECT p.a_id, p.b_id, CAST(sum(a.w * b.w) AS BIGINT) AS dot
        |  FROM mh_pairs p
        |  JOIN hv a ON a.doc_id = p.a_id
        |  JOIN hv b ON b.doc_id = p.b_id AND b.dim = a.dim
        |  GROUP BY 1, 2)
        |SELECT d.a_id, d.b_id, d.dot,
        |  CAST(CAST(d.dot AS HUGEINT) * d.dot * 1000000
        |    // (CAST(na.s2 AS HUGEINT) * nb.s2) AS BIGINT) AS cos2_ppm
        |FROM dots d
        |JOIN nrm na ON na.doc_id = d.a_id
        |JOIN nrm nb ON nb.doc_id = d.b_id""".stripMargin,
    // q36's gram index CTEs with asymmetric denominators; both ratios are
    // single divisions of exact integer counts
    "q133_containment" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents),
         |strsh AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(range(0, len(t) - 2),
         |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS shingles
         |  FROM toks WHERE len(t) >= 3),
         |sh AS (
         |  SELECT doc_id,
         |    unnest(list_distinct(list_transform(shingles, s -> ${md5Prefix32Sql("s")}))) AS shingle
         |  FROM strsh),
         |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |shf AS (
         |  SELECT doc_id, shingle FROM (
         |    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM sh)
         |  WHERE df <= 1000),
         |inter AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
         |  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT a_id, b_id, inter, n_a, n_b, c_a_in_b, c_b_in_a FROM (
         |  SELECT i.a_id, i.b_id, i.inter,
         |    sa.n_sh AS n_a, sb.n_sh AS n_b,
         |    CAST(i.inter AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) AS c_a_in_b,
         |    CAST(i.inter AS DOUBLE) / CAST(sb.n_sh AS DOUBLE) AS c_b_in_a
         |  FROM inter i
         |  JOIN sz sa ON sa.doc_id = i.a_id
         |  JOIN sz sb ON sb.doc_id = i.b_id)
         |WHERE greatest(c_a_in_b, c_b_in_a) >= 0.7""".stripMargin,
    // q104's blocked window, levenshtein verify (unit-cost DP on both
    // engines), integer threshold lev*100 <= max_len*20
    "q110_edit_distance" ->
      """WITH d AS (
        |  SELECT doc_id, lower(trim(text)) AS norm FROM documents),
        |k AS (
        |  SELECT doc_id, norm, substring(norm, 1, 4) AS blk,
        |         substring(norm, 1, 16) AS sort_key FROM d),
        |w AS (
        |  SELECT doc_id, norm,
        |    lead(doc_id, 1) OVER win AS nb1, lead(norm, 1) OVER win AS nn1,
        |    lead(doc_id, 2) OVER win AS nb2, lead(norm, 2) OVER win AS nn2
        |  FROM k WINDOW win AS (PARTITION BY blk ORDER BY sort_key, doc_id)),
        |pairs AS (
        |  SELECT doc_id AS a_id, nb1 AS b_id,
        |    CAST(levenshtein(norm, nn1) AS INTEGER) AS lev,
        |    CAST(greatest(length(norm), length(nn1)) AS INTEGER) AS max_len
        |  FROM w WHERE nb1 IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, nb2, CAST(levenshtein(norm, nn2) AS INTEGER),
        |    CAST(greatest(length(norm), length(nn2)) AS INTEGER)
        |  FROM w WHERE nb2 IS NOT NULL)
        |SELECT a_id, b_id, lev, max_len FROM pairs
        |WHERE lev * 100 <= max_len * 20""".stripMargin,
    // q36's shingle CTEs, then rarest-first prefixes ((f, g) total order),
    // prefix self-join, and exact verify via list_intersect
    "q106_ppjoin" ->
      s"""WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents),
        |strsh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(0, len(t) - 2),
        |      i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS shingles
        |  FROM toks WHERE len(t) >= 3),
        |d AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(shingles, s -> ${md5Prefix32Sql("s")})) AS sh
        |  FROM strsh),
        |tok AS (SELECT doc_id, unnest(sh) AS g FROM d),
        |freq AS (SELECT g, count(*) AS f FROM tok GROUP BY 1),
        |ranked AS (
        |  SELECT doc_id, g,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY f, g) AS rn,
        |    count(*) OVER (PARTITION BY doc_id) AS n
        |  FROM tok JOIN freq USING (g)),
        |pref AS (SELECT doc_id, g FROM ranked WHERE rn <= n - (n + 1) // 2 + 1),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM pref a JOIN pref b ON a.g = b.g AND a.doc_id < b.doc_id)
        |SELECT a_id, b_id, inter, un,
        |  CAST(inter AS DOUBLE) / CAST(un AS DOUBLE) AS j
        |FROM (
        |  SELECT a_id, b_id,
        |    CAST(len(list_intersect(da.sh, db.sh)) AS BIGINT) AS inter,
        |    CAST(len(da.sh) + len(db.sh) AS BIGINT)
        |      - CAST(len(list_intersect(da.sh, db.sh)) AS BIGINT) AS un
        |  FROM cand JOIN d da ON da.doc_id = a_id JOIN d db ON db.doc_id = b_id)
        |WHERE 2 * inter >= un""".stripMargin,
    // same blocked window via WINDOW ... PARTITION BY; list_intersect on
    // distinct tokens mirrors array_intersect; len() cast to Spark's INT
    "q104_sorted_neighborhood" ->
      """WITH d AS (
        |  SELECT doc_id, lower(trim(text)) AS norm FROM documents),
        |k AS (
        |  SELECT doc_id, substring(norm, 1, 4) AS blk,
        |    substring(norm, 1, 16) AS sort_key,
        |    list_distinct(string_split_regex(norm, '\s+')) AS toks
        |  FROM d),
        |w AS (
        |  SELECT doc_id, toks,
        |    lead(doc_id, 1) OVER win AS nb1, lead(toks, 1) OVER win AS nt1,
        |    lead(doc_id, 2) OVER win AS nb2, lead(toks, 2) OVER win AS nt2
        |  FROM k WINDOW win AS (PARTITION BY blk ORDER BY sort_key, doc_id)),
        |pairs AS (
        |  SELECT doc_id AS a_id, nb1 AS b_id,
        |    CAST(len(list_intersect(toks, nt1)) AS INTEGER) AS inter,
        |    CAST(len(toks) + len(nt1) - len(list_intersect(toks, nt1)) AS INTEGER) AS un
        |  FROM w WHERE nb1 IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, nb2,
        |    CAST(len(list_intersect(toks, nt2)) AS INTEGER),
        |    CAST(len(toks) + len(nt2) - len(list_intersect(toks, nt2)) AS INTEGER)
        |  FROM w WHERE nb2 IS NOT NULL)
        |SELECT a_id, b_id, inter, un,
        |  CAST(inter AS DOUBLE) / CAST(un AS DOUBLE) AS j
        |FROM pairs WHERE 2 * inter >= un""".stripMargin,
  )
}
