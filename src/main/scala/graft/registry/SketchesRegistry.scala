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

/** Registry: probabilistic-sketch queries — one `queries` entry and one DuckDB
  * `oracles` twin per graded query. Composed into SparkEntry (driver
  * contract); keys must stay globally unique across registries
  * (spec-asserted in EntrySpec).
  */
private[graft] object SketchesRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CMS sketch-delta change detection: per-half sketches, exact top
    // movers as graded truth, one-sided bounds on both probes
    "q275_cms_movers" -> ((s, dir) =>
      Sketches.cmsTopMovers(Tables.events(s, dir))),
    // KMV bottom-k distinct sketch per source over the memoized gram
    // stream, graded against the exact distinct count (q102 pattern)
    "q194_kmv_sketch" -> ((s, dir) =>
      Sketches.kmvCardinality(hllGrams(s, dir))),
    // Bloom filter built over purchasers, probed with non-purchasers —
    // observed FPR in exact ppm (measure-the-mechanism, q187 pattern)
    "q196_bloom_fpr" -> ((s, dir) =>
      Sketches.bloomFprReport(Tables.events(s, dir))),
    // CMS inner-product estimate of |clicks x purchases on user_id|,
    // graded against the exact join size (optimizer statistics)
    "q113_join_size_sketch" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      Sketches.cmsJoinSize(
        ev.where("event_type = 'click'"),
        ev.where("event_type = 'purchase'"), "user_id")
    }),
    // exact distinct users per (type, day) from OR-folded 63-bit bitmap
    // words + popcount — the index-structure distinct (vs q102's HLL)
    "q122_bitmap_distinct" -> ((s, dir) =>
      Sketches.bitmapDistinct(Tables.events(s, dir))),
    // exact trailing-7-day active users per observed day: sliding
    // distinct via per-(day, word) bitmaps — the W-day fan-out replicates
    // the collapsed word table, never the event scan
    "q125_rolling_wau" -> ((s, dir) =>
      Sketches.rollingActiveUsers(Tables.events(s, dir))),
    "q93_cms_heavyhitters" -> ((s, dir) =>
      Sketches.cmsHeavyHitters(Tables.events(s, dir))),
  )

  def oracles: Map[String, String] = Map(
    // same per-half bucket counts, same probe algebra, same top movers
    "q275_cms_movers" ->
      s"""WITH hashed AS (
         |  SELECT user_id, ${md5Prefix32Sql("'cms:' || CAST(user_id AS VARCHAR)")} AS h,
         |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 < 19738 AS is_a
         |  FROM events),
         |perm AS (SELECT unnest(range(0, 4)) AS j),
         |bk AS (
         |  SELECT is_a, j,
         |    ((h % 2147483647) * ((2654435761 * (j + 1)) % 2147483647)
         |      + (1000003 * (j + 1)) % 2147483647) % 2147483647 % 1024 AS b,
         |    count(*) AS c
         |  FROM hashed CROSS JOIN perm GROUP BY 1, 2, 3),
         |movers AS (
         |  SELECT user_id, h,
         |    CAST(COALESCE(sum(CASE WHEN is_a THEN 1 END), 0) AS BIGINT) AS cnt_a,
         |    CAST(COALESCE(sum(CASE WHEN NOT is_a THEN 1 END), 0) AS BIGINT) AS cnt_b
         |  FROM hashed GROUP BY 1, 2
         |  ORDER BY abs(cnt_b - cnt_a) DESC, user_id LIMIT 20),
         |probe AS (
         |  SELECT user_id, cnt_a, cnt_b, j,
         |    ((h % 2147483647) * ((2654435761 * (j + 1)) % 2147483647)
         |      + (1000003 * (j + 1)) % 2147483647) % 2147483647 % 1024 AS b
         |  FROM movers CROSS JOIN perm)
         |SELECT p.user_id, p.cnt_a, p.cnt_b, p.cnt_b - p.cnt_a AS delta,
         |  CAST(min(COALESCE(ba.c, 0)) AS BIGINT) AS est_a,
         |  CAST(min(COALESCE(bb.c, 0)) AS BIGINT) AS est_b,
         |  CAST(min(COALESCE(ba.c, 0)) AS BIGINT) >= p.cnt_a
         |    AND CAST(min(COALESCE(bb.c, 0)) AS BIGINT) >= p.cnt_b AS bounds_ok
         |FROM probe p
         |LEFT JOIN bk ba ON ba.is_a AND ba.j = p.j AND ba.b = p.b
         |LEFT JOIN bk bb ON NOT bb.is_a AND bb.j = p.j AND bb.b = p.b
         |GROUP BY 1, 2, 3, 4""".stripMargin,
    // CMS twin: rebuild every (row j, bucket) counter with the same
    // permutation algebra as CountMinSketchAgg (h reduced mod p before the
    // multiply — products < 2^62), then probe the exact top-20 heads
    "q93_cms_heavyhitters" ->
      s"""WITH hashed AS (
         |  SELECT user_id, ${md5Prefix32Sql("'cms:' || CAST(user_id AS VARCHAR)")} AS h
         |  FROM events),
         |perm AS (SELECT unnest(range(0, 4)) AS j),
         |buckets AS (
         |  SELECT j,
         |    ((h % 2147483647) * ((2654435761 * (j + 1)) % 2147483647)
         |      + (1000003 * (j + 1)) % 2147483647) % 2147483647 % 1024 AS b,
         |    count(*) AS c
         |  FROM hashed CROSS JOIN perm GROUP BY 1, 2),
         |heads AS (
         |  SELECT user_id, h, count(*) AS exact_cnt FROM hashed GROUP BY 1, 2
         |  ORDER BY exact_cnt DESC, user_id LIMIT 20),
         |probe AS (
         |  SELECT user_id, exact_cnt, j,
         |    ((h % 2147483647) * ((2654435761 * (j + 1)) % 2147483647)
         |      + (1000003 * (j + 1)) % 2147483647) % 2147483647 % 1024 AS b
         |  FROM heads CROSS JOIN perm)
         |SELECT p.user_id, p.exact_cnt, CAST(min(bk.c) AS BIGINT) AS cms_est
         |FROM probe p JOIN buckets bk ON bk.j = p.j AND bk.b = p.b
         |GROUP BY 1, 2""".stripMargin,
    // same gram hash stream, bottom-64 DISTINCT hashes per source, the
    // same (k-1)·2^32/h_k estimate and exact-side grading division
    "q194_kmv_sketch" ->
      s"""WITH $packedGramsSql,
        |dh AS (SELECT DISTINCT source, h FROM hashed),
        |rn AS (
        |  SELECT source, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h) AS r
        |  FROM dh),
        |sk AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |    CAST(max(h) AS BIGINT) AS h_k
        |  FROM rn WHERE r <= 64 GROUP BY 1),
        |ex AS (
        |  SELECT source, CAST(count(DISTINCT g) AS BIGINT) AS exact_grams
        |  FROM hashed GROUP BY 1),
        |est AS (
        |  SELECT source, CAST(64 AS BIGINT) AS k, n_kept, h_k,
        |    CASE WHEN n_kept < 64 THEN n_kept
        |         ELSE CAST(270582939648 // h_k AS BIGINT) END AS est,
        |    exact_grams
        |  FROM sk JOIN ex USING (source))
        |SELECT source, k, n_kept, h_k, est, exact_grams,
        |  CAST(abs(est - exact_grams) * 1000000 // exact_grams AS BIGINT)
        |    AS err_ppm
        |FROM est""".stripMargin,
    // same member/probe split, same kh md5 bit draws, same 63-bit word
    // bit_or filter, all-bits-set false-positive test, exact ppm
    "q196_bloom_fpr" ->
      s"""WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS is_member
        |  FROM events GROUP BY 1),
        |mpos AS (
        |  SELECT DISTINCT
        |    ${md5Prefix32Sql("'bf:' || CAST(j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")} % 8192 AS pos
        |  FROM u CROSS JOIN (SELECT unnest(range(0, 3)) AS j) js
        |  WHERE is_member = 1),
        |words AS (
        |  SELECT pos // 63 AS word, bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER)) AS bits
        |  FROM mpos GROUP BY 1),
        |ppos AS (
        |  SELECT user_id,
        |    ${md5Prefix32Sql("'bf:' || CAST(j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")} % 8192 AS pos
        |  FROM u CROSS JOIN (SELECT unnest(range(0, 3)) AS j) js
        |  WHERE is_member = 0),
        |probe AS (
        |  SELECT p.user_id,
        |    min(CASE WHEN (w.bits & (CAST(1 AS BIGINT) << CAST(p.pos % 63 AS INTEGER))) <> 0
        |             THEN 1 ELSE 0 END) AS all_hit
        |  FROM ppos p LEFT JOIN words w ON w.word = p.pos // 63
        |  GROUP BY 1),
        |pa AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_probes,
        |    CAST(sum(all_hit) AS BIGINT) AS n_false_pos
        |  FROM probe),
        |ma AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_members FROM u WHERE is_member = 1),
        |wa AS (SELECT CAST(sum(bit_count(bits)) AS BIGINT) AS bits_set FROM words)
        |SELECT CAST(8192 AS BIGINT) AS m_bits, CAST(3 AS BIGINT) AS k_hashes,
        |  n_members, bits_set, n_probes, n_false_pos,
        |  CAST(n_false_pos * 1000000 // n_probes AS BIGINT) AS fpr_ppm
        |FROM pa CROSS JOIN ma CROSS JOIN wa""".stripMargin,
    // 63-bit words keep 1<<bit off the sign bit (DuckDB raises overflow
    // at 1<<63); bit_count is TINYINT there, INT in Spark -> cast the sum
    "q122_bitmap_distinct" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    user_id
        |  FROM events),
        |words AS (
        |  SELECT event_type, day_num, user_id // 63 AS word_idx,
        |    bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INTEGER)) AS bits
        |  FROM ev GROUP BY 1, 2, 3)
        |SELECT event_type, day_num,
        |  CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(bit_count(bits)) AS BIGINT) AS distinct_users
        |FROM words GROUP BY 1, 2""".stripMargin,
    // the range join re-derives the same trailing-window membership the
    // bitmap OR computes; COUNT(DISTINCT) over it is the graded truth
    "q125_rolling_wau" ->
      """WITH ev AS (
        |  SELECT DISTINCT
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
        |    user_id
        |  FROM events),
        |days AS (SELECT DISTINCT day_num FROM ev)
        |SELECT d.day_num,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
        |FROM days d JOIN ev e ON e.day_num BETWEEN d.day_num - 6 AND d.day_num
        |GROUP BY 1""".stripMargin,
    // q93's bucket algebra on both sides; inner product per permutation
    // row via a (j, bucket) equi-join (zero cells contribute nothing)
    "q113_join_size_sketch" ->
      s"""WITH ca AS (
        |  SELECT user_id, ${md5Prefix32Sql("'cms:' || CAST(user_id AS VARCHAR)")} AS h
        |  FROM events WHERE event_type = 'click'),
        |cb AS (
        |  SELECT user_id, ${md5Prefix32Sql("'cms:' || CAST(user_id AS VARCHAR)")} AS h
        |  FROM events WHERE event_type = 'purchase'),
        |perm AS (SELECT unnest(range(0, 4)) AS j),
        |ba AS (
        |  SELECT j,
        |    ((h % 2147483647) * ((2654435761 * (j + 1)) % 2147483647)
        |      + (1000003 * (j + 1)) % 2147483647) % 2147483647 % 1024 AS b,
        |    count(*) AS c
        |  FROM ca CROSS JOIN perm GROUP BY 1, 2),
        |bb AS (
        |  SELECT j,
        |    ((h % 2147483647) * ((2654435761 * (j + 1)) % 2147483647)
        |      + (1000003 * (j + 1)) % 2147483647) % 2147483647 % 1024 AS b,
        |    count(*) AS c
        |  FROM cb CROSS JOIN perm GROUP BY 1, 2),
        |ip AS (
        |  SELECT ba.j, CAST(sum(ba.c * bb.c) AS BIGINT) AS s
        |  FROM ba JOIN bb ON ba.j = bb.j AND ba.b = bb.b GROUP BY 1),
        |est AS (SELECT min(s) AS est_join FROM ip),
        |ex AS (
        |  SELECT CAST(COALESCE(sum(x.c * y.c), 0) AS BIGINT) AS exact_join
        |  FROM (SELECT user_id, count(*) AS c FROM ca GROUP BY 1) x
        |  JOIN (SELECT user_id, count(*) AS c FROM cb GROUP BY 1) y USING (user_id)),
        |n AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM ca) AS n_left,
        |         (SELECT CAST(count(*) AS BIGINT) FROM cb) AS n_right)
        |SELECT n_left, n_right, exact_join, est_join,
        |  est_join - exact_join AS overest
        |FROM n, ex, est""".stripMargin,
  )
}
