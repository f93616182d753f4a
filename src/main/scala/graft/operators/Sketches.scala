package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Sketch-backed frequency estimation over unbounded key spaces.
  *
  * At 100 TB, per-key exact counts (per-URL, per-user, per-n-gram) shuffle
  * O(distinct keys) rows; the Count-Min sketch
  * ([[org.apache.spark.sql.graft.CountMinSketchAgg]]) replaces that with a
  * constant d·w counter matrix, merged elementwise across executors —
  * map-side partial aggregation ships ONE matrix per task into the final
  * merge, independent of row count or key cardinality.
  *
  * Reference analog: the hand-rolled per-product sum/count loop in
  * `flink/flink-psd/src/main/java/batch/ProductReviewAggregation.java:43-47`
  * keeps exact per-key aggregates in one reduce group; a corpus-scale
  * engine needs the sketched form wherever an ε-approximate count
  * (ε = e/w, δ = e^−d) suffices.
  */
object Sketches {

  private val P = 2147483647L // 2^31 - 1, shared with MinHashSignature / CMS

  /** CMS bucket index for permutation row `j` (a Column): the same algebra
    * `CountMinSketchAgg.update` applies — kept in lockstep so the probe side
    * reads the exact counters the build side incremented.
    */
  private def bucket(h: Column, j: Column, w: Int): Column =
    (pmod(h, lit(P)) * pmod(lit(2654435761L) * (j + 1), lit(P))
      + pmod(lit(1000003L) * (j + 1), lit(P))) % P % w

  /** Heavy-hitter report card: build one CMS over `events.user_id`, take the
    * exact top-`topK` users (TakeOrderedAndProject — no global sort), and
    * probe the sketch for each. Output `(user_id, exact_cnt, cms_est)` with
    * cms_est ≥ exact_cnt always (one-sided error); the gap IS the report —
    * it grades the (d, w) configuration against ground truth at a small
    * scale before the sketch replaces exact counting at 100 TB, the same
    * measure-the-approximation pattern as q83 (ANN recall) and q85 (LSH
    * quality).
    *
    * Scale shape: one scan builds the sketch (constant-size partials), one
    * aggregation finds the exact heads, and the probe joins `topK` rows
    * against a BROADCAST single-row sketch — no shuffle grows with the
    * corpus.
    */
  def cmsHeavyHitters(events: DataFrame, d: Int = 4, w: Int = 1024,
                      topK: Int = 20): DataFrame = {
    val hashed = events.select(
      col("user_id"),
      TextAnalysis.md5Prefix32(concat(lit("cms:"), col("user_id").cast("string"))).as("h"))

    val sketchCol = org.apache.spark.sql.graft.shim.column(
      org.apache.spark.sql.graft.CountMinSketchAgg(
        org.apache.spark.sql.graft.shim.expression(col("h")), d, w)
        .toAggregateExpression())
    val sketch = hashed.agg(sketchCol.as("sk"))

    val heads = hashed.groupBy("user_id", "h")
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("user_id"))
      .limit(topK)

    heads.join(broadcast(sketch))
      .withColumn("cms_est",
        array_min(transform(sequence(lit(0), lit(d - 1)),
          j => element_at(col("sk"), (j * w + bucket(col("h"), j, w)).cast("int") + 1))))
      .select(col("user_id"), col("exact_cnt"), col("cms_est"))
  }

  /** Sketch-based equi-join cardinality estimation — the statistic a
    * query optimizer (or a capacity planner) needs BEFORE running the
    * join: |A ⋈ B| = Σ_k f_A(k)·f_B(k) is estimated by the CMS inner
    * product, est = min_j Σ_b cA[j][b]·cB[j][b] (Cormode & Muthukrishnan
    * 2005, §4.2) — one-sided, always ≥ the true size (hash collisions
    * only ADD cross terms). The report carries the exact size so the
    * (d, w) configuration is graded, like q93's point estimates.
    *
    * At 100 TB each side reduces to ONE d·w matrix with map-side partials
    * (no shuffle grows with the data), the inner product is driver-side
    * arithmetic on two broadcast singletons, and the exact side — a full
    * per-key count + join — exists only as the graded truth. All integer
    * arithmetic: counts ≤ 2³², per-row products sum < 2⁶³ up to ~10⁹-row
    * sides at w = 1024.
    *
    * @return one row (n_left, n_right, exact_join, est_join, overest)
    */
  def cmsJoinSize(left: DataFrame, right: DataFrame, keyCol: String,
                  d: Int = 4, w: Int = 1024): DataFrame = {
    def hashed(df: DataFrame) = df.select(
      col(keyCol).as("k"),
      TextAnalysis.md5Prefix32(concat(lit("cms:"), col(keyCol).cast("string"))).as("h"))
    def sketchOf(df: DataFrame, as: String) = {
      val agg = org.apache.spark.sql.graft.shim.column(
        org.apache.spark.sql.graft.CountMinSketchAgg(
          org.apache.spark.sql.graft.shim.expression(col("h")), d, w)
          .toAggregateExpression())
      hashed(df).agg(agg.as(as))
    }
    val counts = hashed(left).agg(count(lit(1)).as("n_left"))
      .crossJoin(hashed(right).agg(count(lit(1)).as("n_right")))
    val exact = hashed(left).groupBy("k").agg(count(lit(1)).as("ca"))
      .join(hashed(right).groupBy("k").agg(count(lit(1)).as("cb")), "k")
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("exact_join"))
    val est = sketchOf(left, "ska").crossJoin(sketchOf(right, "skb"))
      .select(array_min(transform(sequence(lit(0), lit(d - 1)), j =>
        aggregate(sequence(lit(0), lit(w - 1)), lit(0L), (acc, i) =>
          acc + element_at(col("ska"), (j * w + i).cast("int") + 1)
            * element_at(col("skb"), (j * w + i).cast("int") + 1))))
        .as("est_join"))
    counts.crossJoin(exact).crossJoin(est)
      .select(col("n_left"), col("n_right"), col("exact_join"), col("est_join"),
        (col("est_join") - col("exact_join")).as("overest"))
  }

  /** CMS heavy-hitter change detection (q275) — the sketch-delta pattern
    * production monitoring runs when two full per-key counts would not
    * fit: build ONE count-min sketch per half of the window (before /
    * after `splitDay`), and for the top-k exact movers (largest
    * |after − before|) probe both sketches. The graded output carries
    * the exact per-half counts beside the estimates with the one-sided
    * bound (est ≥ exact on BOTH halves) as `bounds_ok` — the q93
    * measure-the-approximation pattern extended to change detection,
    * where the production form diffs the two d·w matrices alone.
    *
    * Scale shape: two constant-size sketch aggregates off one barriered
    * scan, one exact per-user count (the graded truth), a top-k heap,
    * and a broadcast probe of two 1-row sketches. A user absent from a
    * half probes that half's counters at ≥ 0 — still one-sided.
    *
    * @return top-k rows: (user_id, cnt_a, cnt_b, delta, est_a, est_b,
    *         bounds_ok)
    */
  def cmsTopMovers(events: DataFrame, splitDay: Long = 19738L,
      d: Int = 4, w: Int = 1024, topK: Int = 20): DataFrame = {
    val tagged = events.select(col("user_id"),
        TextAnalysis.md5Prefix32(concat(lit("cms:"), col("user_id").cast("string")))
          .as("h"),
        (expr("unix_micros(ts) div 86400000000") < splitDay).as("is_a"))
      .transform(graft.barrier) // read by both sketch builds + the exact pass
    val sketchCol = org.apache.spark.sql.graft.shim.column(
      org.apache.spark.sql.graft.CountMinSketchAgg(
        org.apache.spark.sql.graft.shim.expression(col("h")), d, w)
        .toAggregateExpression())
    val skA = tagged.where(col("is_a")).agg(sketchCol.as("sk_a"))
    val skB = tagged.where(!col("is_a")).agg(sketchCol.as("sk_b"))
    // coalesce(…, 0): a half with zero rows (splitDay outside the data
    // range) aggregates to a NULL sketch — its probe must degrade to
    // est 0 (and bounds_ok true against cnt 0) like the oracle's
    // COALESCE path, not propagate NULL
    def probe(sk: String): Column =
      coalesce(array_min(transform(sequence(lit(0), lit(d - 1)),
        j => element_at(col(sk), (j * w + bucket(col("h"), j, w)).cast("int") + 1))),
        lit(0L))
    tagged.groupBy(col("user_id"), col("h"))
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("cnt_a"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("cnt_b"))
      .withColumn("delta", col("cnt_b") - col("cnt_a"))
      .orderBy(abs(col("delta")).desc, col("user_id"))
      .limit(topK)
      .join(broadcast(skA)).join(broadcast(skB))
      .select(col("user_id"), col("cnt_a"), col("cnt_b"), col("delta"),
        probe("sk_a").as("est_a"), probe("sk_b").as("est_b"))
      .withColumn("bounds_ok",
        col("est_a") >= col("cnt_a") && col("est_b") >= col("cnt_b"))
  }

  /** Rolling W-day active users (the WAU curve): for every observed day,
    * the EXACT count of distinct users active in the trailing `windowDays`
    * window — the sliding-distinct problem, which has no per-window
    * mergeable counter (distinct is not sum-decomposable across sliding
    * windows).
    *
    * Scale shape — the [[bitmapDistinct]] machinery makes it mergeable:
    * events first collapse to per-(day, word) 63-bit membership masks
    * (map-side-combined `bit_or`, the only event-wide shuffle), and the
    * W-day replication then fans out the tiny WORD table — ≤ |days| ×
    * max_id/63 rows — not the raw events, W× . Per-(window-end, word) OR
    * plus summed popcounts give the exact count. At 100 TB the event scan
    * dominates and runs once; everything after is proportional to user
    * cardinality / 63.
    *
    * @return (day_num, active_users) for each day with events, counting
    *         the trailing `windowDays`-day window ending that day
    */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame =
    rollingFromWords(dailyWords(events), windowDays)

  /** The incremental stage of [[rollingActiveUsers]]: per-(day, word)
    * membership masks — the bitmap state a view-maintenance pipeline
    * keeps live (words from disjoint batches merge by OR). The streaming
    * twin is [[graft.streaming.RealTime.dailyWordsStream]].
    */
  def dailyWords(events: DataFrame): DataFrame = events.select(
      expr("unix_micros(ts) div 86400000000").as("day_num"),
      expr("user_id div 63").as("word_idx"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))").as("bit"))
    .groupBy(col("day_num"), col("word_idx"))
    .agg(expr("bit_or(bit)").as("bits"))

  /** The window stage of [[rollingActiveUsers]] over an
    * already-materialized word table (from [[dailyWords]] or its
    * streaming twin).
    */
  def rollingFromWords(words: DataFrame, windowDays: Int = 7): DataFrame = {
    // day d participates in the windows ending at d .. d+W-1; windows
    // whose end is not an observed day are dropped (the dashboard rows
    // are the observed days), via a broadcast semi-join on the day list
    val fanned = words.select(col("day_num"), col("word_idx"), col("bits"),
        explode(expr(s"sequence(0, ${windowDays - 1})")).as("off"))
      .select((col("day_num") + col("off")).as("day_num"),
        col("word_idx"), col("bits"))
    val days = words.select(col("day_num")).distinct()
    fanned.join(broadcast(days), Seq("day_num"), "left_semi")
      .groupBy(col("day_num"), col("word_idx"))
      .agg(expr("bit_or(bits)").as("bits"))
      .groupBy(col("day_num"))
      .agg(sum(expr("bit_count(bits)")).as("active_users"))
  }

  /** Exact distinct users per (event_type, day) via packed bitmap words —
    * the index-structure alternative to `count(DISTINCT)`: user ids map to
    * (word = id div 63, bit = id mod 63), a `bit_or` aggregate folds each
    * word's membership mask, and summed popcounts give the exact
    * cardinality. 63-bit (not 64-bit) words keep the single-bit shift off
    * the sign bit, which ANSI engines reject as overflow.
    *
    * Scale shape: the word-level aggregate is the only wide shuffle and
    * its `bit_or` map-side-combines, so each partition ships at most one
    * word per (group, id-range) regardless of row count; the second
    * aggregate collapses ≤ max_id/63 words per group. This is the
    * roaring-bitmap shape (minus run-length refinement), and unlike the
    * HLL estimate (q102) the answer is EXACT — and incremental: words
    * from disjoint batches merge by OR, making this the
    * view-maintenance-friendly form of distinct.
    */
  def bitmapDistinct(events: DataFrame): DataFrame = {
    events.select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day_num"),
        expr("user_id div 63").as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))").as("bit"))
      .groupBy(col("event_type"), col("day_num"), col("word_idx"))
      .agg(expr("bit_or(bit)").as("bits"))
      .groupBy(col("event_type"), col("day_num"))
      .agg(count(lit(1)).as("n_words"),
        sum(expr("bit_count(bits)")).as("distinct_users"))
  }

  /** KMV (k-minimum-values) distinct-count sketch per source (q194) —
    * the third cardinality sketch beside HLL (q102/q147/q157) and the
    * exact bitmap (q122), and the one whose state is just `k` hashes:
    * keep the k smallest distinct 32-bit gram hashes; if the kth
    * smallest is h_k, the estimate is (k−1)·2³² / h_k (Bar-Yossef et al.
    * 2002). Mergeable by min-merging the kept sets, exact below k.
    *
    * The kept set comes from the ExactTopK heap over the DISTINCT
    * (source, h) stream (score −h — duplicates of one h would fill the
    * heap with copies and bias h_k down, so the distinct pass is load-
    * bearing), giving bounded per-partition state like every sketch
    * here. The estimate is one exact BIGINT division ((k−1)·2³² < 2³⁸);
    * the graded row carries the exact distinct GRAM count next to it
    * (the q102 pattern), so err_ppm includes 32-bit hash-collision noise
    * — that honesty is the point of the report card.
    *
    * @param sh the hashed-gram stream from [[Corpus.hashedGrams]]
    *           (source, g, h) — the session-memoized seam
    * @return (source, k, n_kept, h_k, est, exact_grams, err_ppm)
    */
  def kmvCardinality(sh: DataFrame, k: Int = 64): DataFrame = {
    val minK = org.apache.spark.sql.graft.shim.column(
      org.apache.spark.sql.graft.ExactTopK(
        org.apache.spark.sql.graft.shim.expression((-col("h")).cast("double")),
        org.apache.spark.sql.graft.shim.expression(col("h")),
        k).toAggregateExpression())
    val sk = sh.select(col("source"), col("h")).distinct()
      .groupBy("source")
      .agg(minK.as("mins"))
      .select(col("source"),
        expr("CAST(size(mins) AS BIGINT)").as("n_kept"),
        expr("array_max(transform(mins, x -> x.payload))").as("h_k"))
    val ex = sh.groupBy("source").agg(count_distinct(col("g")).as("exact_grams"))
    sk.join(ex, "source")
      .withColumn("est",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"CAST(${(k - 1).toLong * 4294967296L} div h_k AS BIGINT)")))
      .select(col("source"), lit(k.toLong).as("k"), col("n_kept"), col("h_k"),
        col("est"), col("exact_grams"),
        expr("abs(est - exact_grams) * 1000000 div exact_grams").as("err_ppm"))
  }

  /** Bloom-filter false-positive report card (q196) — build an m-bit
    * filter over the users who purchased, probe it with the users who
    * did not, and grade the observed false-positive rate: the
    * measure-the-mechanism pattern (q83 ANN recall, q85 LSH quality,
    * q187 reshard movement) applied to the filter every shuffle-pruning
    * join (q58) leans on.
    *
    * The filter itself is the q122 bitmap shape: each member key sets
    * `kh` md5-derived bit positions, positions collapse to 63-bit words
    * with a map-combinable `bit_or`, and the whole filter is ⌈m/63⌉
    * rows — BROADCAST back to the probe side, so probing is a map-side
    * lookup join at any corpus size. A probe is a false positive iff
    * ALL `kh` of its bits are set (min over hit flags). Pure integer
    * arithmetic end to end.
    *
    * @return one row (m_bits, k_hashes, n_members, bits_set, n_probes,
    *         n_false_pos, fpr_ppm)
    */
  def bloomFprReport(events: DataFrame, m: Int = 8192, kh: Int = 3): DataFrame = {
    val users = events.groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("is_member"))
      .transform(graft.barrier) // read twice: member build + probe side
    def positions(c: Column) = array((0 until kh).map(j =>
      TextAnalysis.md5Prefix32(concat(lit(s"bf:$j:"), c.cast("string"))) % m): _*)
    val words = users.where(col("is_member") === 1L)
      .select(explode(positions(col("user_id"))).as("pos"))
      .select(expr("pos div 63").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").as("bit"))
      .groupBy("word").agg(expr("bit_or(bit)").as("bits"))
    val probeAgg = users.where(col("is_member") === 0L)
      .select(col("user_id"), explode(positions(col("user_id"))).as("pos"))
      .select(col("user_id"), expr("pos div 63").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").as("bit"))
      .join(broadcast(words), Seq("word"), "left")
      .withColumn("hit",
        when(col("bits").isNotNull &&
          (col("bits").bitwiseAND(col("bit")) =!= 0L), 1L).otherwise(0L))
      .groupBy("user_id").agg(min(col("hit")).as("all_hit"))
      .agg(count(lit(1)).as("n_probes"), sum(col("all_hit")).as("n_false_pos"))
    val memberAgg = users.where(col("is_member") === 1L)
      .agg(count(lit(1)).as("n_members"))
    val wordAgg = words.agg(sum(expr("bit_count(bits)")).as("bits_set"))
    probeAgg.crossJoin(broadcast(memberAgg)).crossJoin(broadcast(wordAgg))
      .select(lit(m.toLong).as("m_bits"), lit(kh.toLong).as("k_hashes"),
        col("n_members"), col("bits_set"), col("n_probes"), col("n_false_pos"),
        expr("n_false_pos * 1000000 div n_probes").as("fpr_ppm"))
  }
}
