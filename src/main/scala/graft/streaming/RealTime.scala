package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming rebuild of J3 — RealTimeRecommendations
  * (`streaming/RealTimeRecommendations.java:34-71`).
  *
  * Transport mapping (SURVEY.md §1.1): the reference moves JSON `Review`
  * events over Kafka and keeps state in Redis. This container has no Kafka
  * connector jar, and external KV state is an anti-pattern on Spark anyway —
  * so: file-stream JSON source with the reference's exact `Review` schema,
  * parquet tables instead of Redis keys, file JSON sink instead of the
  * output topic. On a real cluster the same code binds to
  * `format("kafka")` by swapping the source/sink lines only.
  *
  * Scale notes:
  *  - The reference does 2 synchronous Redis RPCs *per event* on the hot
  *    path (`RealTimeRecommendations.java:96-104`). Here enrichment is a
  *    per-micro-batch stream–static join: the 20-row `topProducts` side is
  *    broadcast, the `userRecommendations` side is a regular shuffle (or
  *    broadcast when it fits), amortizing lookups over the whole batch.
  *  - Exactly-once: checkpointed file sink; the reference has no delivery
  *    guarantee at all.
  */
object RealTime {

  /** The reference's wire schema — `streaming/models/Review.java:6-11`,
    * JSON envelope per `kafka_stream_generator.py:28-31`.
    */
  val reviewSchema: StructType = StructType(Seq(
    StructField("userId", LongType),
    StructField("productId", LongType),
    StructField("review", DoubleType),
    StructField("timestamp", LongType)))

  /** [[reviewSchema]] plus a corrupt-record capture column, for the
    * PERMISSIVE-with-audit parse mode.
    */
  val reviewSchemaWithCorrupt: StructType =
    reviewSchema.add(StructField("_corrupt_record", StringType))

  /** Streaming source — stand-in for the Kafka `Reviews` topic
    * (`RealTimeRecommendations.java:40-48`).
    *
    * `format`/`options` are first-class so the Kafka binding really is one
    * config change (`format = "kafka"`, bootstrap/topic options, empty
    * `path`), not a code edit. Parse strictness surfaces through `options`
    * (the reference's deserializer throws on bad JSON —
    * `ReviewDeserialization.java:14-27`):
    *   - Map("mode" -> "FAILFAST")  → reject the batch on corrupt input;
    *   - schema = [[reviewSchemaWithCorrupt]] + Map("columnNameOfCorruptRecord"
    *     -> "_corrupt_record") → keep going, quarantine bad lines.
    */
  def readReviews(spark: SparkSession, path: String, format: String = "json",
                  options: Map[String, String] = Map.empty,
                  schema: StructType = reviewSchema): DataFrame = {
    val reader = spark.readStream.format(format).schema(schema).options(options)
    if (path.nonEmpty) reader.load(path) else reader.load()
  }

  /** Sink #1 — state update (`RealTimeRecommendations.java:49,72-88`:
    * `SADD userRatings:{uid}` per event). Here: append the micro-batch to
    * the ratings parquet table the batch jobs read.
    *
    * Exactly-once: the checkpoint alone only guarantees at-least-once for
    * a foreachBatch sink — a crash BETWEEN the sink write and the
    * checkpoint commit replays that batch on restart, and a blind
    * `append` would duplicate it. Each batch therefore lands in its own
    * `batch_id=N` partition under dynamic partition-overwrite: a replay
    * rewrites partition N in place instead of appending a second copy,
    * making the write idempotent per batch (the Kafka-era
    * transactional-sink pattern, expressed as a partitioned table).
    * StreamingSpec proves it by deleting the last checkpoint commit —
    * the crash window above — restarting, and comparing multisets.
    */
  def updateRatings(reviews: DataFrame, ratingsDir: String, checkpointDir: String): StreamingQuery =
    reviews.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.select(
          col("userId"), col("productId"), col("review").as("rating"), col("timestamp"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(ratingsDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The enrichment transform (`RealTimeRecommendations.java:50-56,89-124`):
    * per event, look up the user's precomputed recommendations; cold-start
    * fallback to global topProducts; cap at `cap` items
    * (`MAX_RECOMMENDATION_SIZE = 20` at `:35`).
    *
    * Pure LogicalPlan transform — works identically on a batch or streaming
    * `reviews` DataFrame (that equivalence is what lets the batch twin be
    * DuckDB-oracled while the streaming path is spec-tested).
    *
    * @param userRecs static (userId Long, recommendedProducts Array[Long])
    * @param topProducts static (productId Long, ...) — the J1 result
    */
  def enrich(reviews: DataFrame, userRecs: DataFrame, topProducts: DataFrame, cap: Int = 20): DataFrame = {
    // 20-row side → single-row array literal, broadcast to every task
    // (replaces the per-event `SMEMBERS topProducts` at `:101-105`).
    val topArr = broadcast(
      topProducts.agg(
        sort_array(collect_list(col("productId"))).as("fallbackProducts")))
    reviews
      .join(userRecs, Seq("userId"), "left")
      .crossJoin(topArr)
      .select(
        col("userId"),
        slice(
          transform(
            when(size(col("recommendedProducts")) > 0, col("recommendedProducts"))
              .otherwise(col("fallbackProducts")),
            x => x.cast("string")),
          1, cap).as("recommendedProducts"))
  }

  /** Streaming exact deduplication — the streaming twin of
    * [[graft.operators.Dedup.dropExactDuplicates]]: drop re-deliveries of
    * the same (userId, productId) review across micro-batches, with state
    * bounded by the event-time watermark (`dropDuplicatesWithinWatermark`
    * evicts keys once they age past it — unbounded-state-safe, unlike a
    * plain `dropDuplicates` on a stream).
    *
    * @param reviews streaming frame with an event-time `ts` timestamp column
    */
  def dedupReviews(reviews: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    reviews
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("userId", "productId")

  /** Streaming twin of
    * [[graft.operators.TimeWindows.sessionSequences]] (q77): the SAME
    * groupBy/aggregate expressions behind `withWatermark` — one code path
    * for the batch corpus build and the live event feed, the q50 pattern.
    * A session's sequence row emits (append mode) once the watermark
    * passes the session's close, so each fingerprint is final when it
    * appears; state per open session is bounded by session length (the
    * gap closes idle sessions) and the watermark evicts closed-session
    * state. StreamingSpec asserts the emitted hashes equal the batch
    * form's on the same event slice.
    *
    * @param events streaming frame with `ts` (timestamp), `user_id`,
    *               `event_id`, `event_type`
    */
  def sessionSequencesStream(events: DataFrame, gap: String = "5 minutes",
                             watermarkDelay: String = "10 minutes"): DataFrame =
    graft.operators.TimeWindows.sessionSequences(
      events.withWatermark("ts", watermarkDelay), gap)

  /** Streaming twin of [[graft.operators.TimeWindows.trendingUsers]]: the
    * per-window leaderboard emits (append mode) once the watermark closes
    * the window. The ExactTopK aggregate runs unchanged inside the
    * streaming aggregation — state per open window is the per-user counts
    * plus one ≤k-entry heap, evicted with the window. StreamingSpec
    * asserts the streamed leaderboard equals the batch form's on the same
    * closed slice.
    */
  def trendingUsersStream(events: DataFrame, k: Int = 3, width: String = "15 minutes",
                          watermarkDelay: String = "10 minutes"): DataFrame =
    graft.operators.TimeWindows.trendingUsers(
      events.withWatermark("ts", watermarkDelay), k, width)

  /** Streaming twin of the incremental stage of
    * [[graft.operators.TimeWindows.dailyVolumeAnomalies]] (q103): live
    * per-(type, day) counts as 1-day tumbling event-time windows. A day's
    * count emits (append mode) once the watermark passes its close, so
    * every emitted row is final; state is one counter per open (type,
    * day), evicted with the window. The UTC epoch-day key matches the
    * batch `unix_micros div 86400000000` exactly (1-day windows align to
    * the epoch). The z-flag pass
    * ([[graft.operators.TimeWindows.volumeAnomaliesFromDaily]]) then runs
    * as a tiny batch query over whatever horizon of closed days the
    * caller grades — mean/σ over a type's full history is not an
    * incremental per-window quantity, so the twin keeps the count table
    * live and the verdict on demand, one shared code path for both.
    */
  def dailyCountsStream(events: DataFrame,
                        watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(col("event_type"), window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("event_type"),
        expr("unix_micros(w.start) div 86400000000").as("day_num"), col("cnt"))

  /** Streaming twin of the per-(user, type) timestamp-extremes stage of
    * [[graft.operators.TimeWindows.sequentialPairs]] (q213): a
    * complete-mode min/max aggregate — state is one 2-long row per
    * (user, type) pair, bounded by |users|·|types| regardless of event
    * volume, and min/max never retract so late data folds in exactly.
    * `TimeWindows.sequentialPairsFromExtremes` closes the precedence
    * report over the maintained table (spec-asserted equal to batch on
    * a closed input).
    */
  def userTypeExtremes(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"), col("event_type"))
      .agg(min(expr("unix_micros(ts)")).as("first_us"),
        max(expr("unix_micros(ts)")).as("last_us"))

  /** Streaming twin of the (user, day) stage of
    * [[graft.operators.TimeWindows.engagementCurve]] (q271): per-user
    * 1-day tumbling event counts under a watermark — state is one count
    * per (user, OPEN day) and a window closes for good once the
    * watermark passes it, so the emitted append-mode rows are final.
    * `TimeWindows.engagementCurveFromUserDays` closes the L28 histogram
    * over the emitted horizon (spec-asserted equal to the batch curve
    * on a closed input — the dailyCountsStream twin pattern).
    */
  def userDayCountsStream(events: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        expr("unix_micros(w.start) div 86400000000").as("day_num"),
        col("n_events"))

  /** Streaming twin of the daily-actives stage of
    * [[graft.operators.TimeWindows.userReach]] (q112): per-day distinct
    * active users as a watermarked dedup on (user, epoch-day) chained
    * into a 1-day tumbling count — the dedup evicts a key once the
    * watermark passes its day, so state is one entry per (user, day)
    * only for OPEN days. Emits final (day_num, n_active) rows in append
    * mode; [[graft.operators.TimeWindows.reachFromDaily]] closes the
    * report over the emitted horizon.
    */
  def dailyActivesStream(events: DataFrame,
                         watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .withColumn("day_num", expr("unix_micros(ts) div 86400000000"))
      .dropDuplicatesWithinWatermark("user_id", "day_num")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_active"))
      .select(expr("unix_micros(w.start) div 86400000000").as("day_num"),
        col("n_active"))

  /** Streaming twin of the new-users stage of
    * [[graft.operators.TimeWindows.userReach]]: first-EVER appearance
    * per user (plain dropDuplicates — deliberately unbounded state, one
    * key per user ever seen, the growth-accounting ledger any reach
    * pipeline carries) counted into the 1-day window of the user's first
    * ARRIVAL. Matches the batch min-day attribution whenever each user's
    * events arrive in event-time order (the q50 first-arrival-vs-min
    * delta, documented there); StreamingSpec feeds day-ordered batches.
    */
  def newUsersStream(events: DataFrame,
                     watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicates("user_id")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_new"))
      .select(expr("unix_micros(w.start) div 86400000000").as("day_num"),
        col("n_new"))

  /** Streaming twin of the word stage of
    * [[graft.operators.Sketches.rollingActiveUsers]] (q125): per-(day,
    * 63-bit word) membership masks as a watermarked 1-day-window
    * `bit_or` aggregate — OR is algebraic, so partial masks merge across
    * micro-batches and a day's words emit final (append mode) once the
    * watermark closes the day. State per open day is ≤ max_user/63
    * longs. The rolling-window OR + popcount
    * ([[graft.operators.Sketches.rollingFromWords]]) then closes the WAU
    * curve over the emitted horizon — same split as
    * [[dailyCountsStream]]/`volumeAnomaliesFromDaily`.
    */
  def dailyWordsStream(events: DataFrame,
                       watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 day").as("w"),
        expr("user_id div 63").as("word_idx"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT)))")
        .as("bits"))
      .select(expr("unix_micros(w.start) div 86400000000").as("day_num"),
        col("word_idx"), col("bits"))

  /** Batch twin of [[dedupReviews]] (whole-table horizon): the one surviving
    * row per key set, chosen deterministically as the EARLIEST event time
    * (tie-broken on `tieCol`) — where the streaming form keeps the first
    * *arrival*, arrival order isn't defined for a batch table, so min event
    * time is the canonical batch equivalent. One hash aggregate with
    * map-side combine (`min(struct(ts, tie))` is an argmin, no sort, no
    * window) — the 100-TB-safe shape.
    */
  def dedupFirstArrival(events: DataFrame, keys: Seq[String], tsCol: String,
                        tieCol: String): DataFrame =
    events
      .groupBy(keys.map(col): _*)
      .agg(min(struct(col(tsCol), col(tieCol))).as("first"))
      .select(keys.map(col) ++
        Seq(col(s"first.$tsCol").as("first_ts"), col(s"first.$tieCol").as("first_id")): _*)

  /** Ingestion-time near-dup gate — the streaming form of
    * [[graft.operators.Dedup.incrementalNearDups]]: every arriving
    * micro-batch of documents is LSH-checked against the standing corpus,
    * and the flags (doc_id, n_matches, best_est, dup_of_min) append to
    * `flagsDir` for the admission decision downstream.
    *
    * The corpus side of the band join is the expensive, *static* part —
    * signatures + banding over the whole corpus — so it is computed once
    * here (eagerly, via the operator's internal checkpoint barriers) and
    * reused by every micro-batch; per batch the work is O(|batch|)
    * signature maps plus one bucket join, the same incremental shape as
    * the batch operator. On a cluster the corpus index would be a
    * persisted bucketed table; a restart recomputes it from the corpus
    * (deterministic), so exactly-once of the flags is still carried by the
    * streaming checkpoint.
    *
    * SINK LAYOUT (consumer-facing): flags land in `batch=<id>`
    * subdirectories, so `spark.read.parquet(flagsDir)` sees an extra
    * partition column `batch` alongside the flag columns. This replaced an
    * earlier flat-append layout (the partitioning is what makes crash
    * replay idempotent — see below); the two layouts cannot mix, so point
    * the query at a FRESH flagsDir when migrating from a pre-partitioned
    * directory.
    *
    * @param docs   streaming frame with `doc_id` (long) and `text`
    * @param corpus static standing corpus with the same two columns
    */
  def flagNearDups(docs: DataFrame, corpus: DataFrame, flagsDir: String,
                   checkpointDir: String): StreamingQuery = {
    // build the corpus band index ONCE, outside the micro-batch loop —
    // bandIndex's localCheckpoint already materializes it, so every
    // batch's bucket join reads the same stored blocks (no extra cache()
    // to leak past query termination)
    val index = graft.operators.Dedup.bandIndex(corpus)
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // overwrite the batchId-keyed partition: a replayed batch after a
        // crash rewrites its own partition instead of appending duplicate
        // flag rows — this is what makes the sink idempotent and the
        // output exactly-once under the streaming checkpoint
        graft.operators.Dedup.incrementalNearDupsIndexed(index, batch)
          .write.mode("overwrite").parquet(s"$flagsDir/batch=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming Count-Min sketch: maintain a running d×w frequency sketch
    * over an unbounded key stream with ZERO per-key state — each
    * micro-batch aggregates its own constant-size sketch
    * ([[org.apache.spark.sql.graft.CountMinSketchAgg]], map-side partials)
    * and overwrites its batchId-keyed partition; readers merge the batch
    * sketches by elementwise sum. Because the merge is associative and
    * commutative and a replayed batch REWRITES its own partition, the
    * merged sketch is exactly-once under the streaming checkpoint — the
    * same idempotency contract as [[flagNearDups]]'s flag sink.
    *
    * This is how per-URL / per-user frequency tracking survives an
    * unbounded stream at 100 TB: the state is O(d·w) per batch regardless
    * of key cardinality, where any exact per-key streaming aggregate
    * grows without bound.
    *
    * @param keyed stream with a `key` string column
    */
  def cmsSketchStream(keyed: DataFrame, sketchDir: String, checkpointDir: String,
                      d: Int = 4, w: Int = 1024): StreamingQuery = {
    val sketchCol = org.apache.spark.sql.graft.shim.column(
      org.apache.spark.sql.graft.CountMinSketchAgg(
        org.apache.spark.sql.graft.shim.expression(
          graft.functions.TextAnalysis.md5Prefix32(concat(lit("cms:"), col("key")))), d, w)
        .toAggregateExpression())
    keyed.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.agg(sketchCol.as("sk"))
          .write.mode("overwrite").parquet(s"$sketchDir/batch=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Merge every per-batch sketch under `sketchDir` into the single running
    * sketch (elementwise sum — order-independent, so replayed/compacted
    * batch layouts all merge to the same array). One narrow shuffle keyed
    * by counter position; d·w rows total regardless of stream length.
    */
  def mergedCmsSketch(spark: SparkSession, sketchDir: String): DataFrame =
    spark.read.parquet(sketchDir)
      .select(posexplode(col("sk")))
      .groupBy("pos").agg(sum(col("col")).as("c"))
      .agg(sort_array(collect_list(struct(col("pos"), col("c")))).as("e"))
      .select(transform(col("e"), x => x.getField("c")).as("sk"))

  /** Streaming literal-quote gate: drop arriving documents that contain any
    * probe string verbatim (whitespace-normalized) — the ingestion-time
    * form of [[graft.operators.Corpus.quoteHits]]'s decontamination.
    *
    * Implementation is a stream-static LEFT ANTI join against the
    * broadcast probe set: zero streaming state, no watermark, no
    * foreachBatch — the probe set is static and the predicate is per-row,
    * so every micro-batch pays only map-side `Contains` work. Returns a
    * streaming frame, composable with any downstream sink.
    *
    * @param docs   streaming frame with `doc_id` (long) and `text`
    * @param probes static frame with a `probe` string column (tiny — a
    *               benchmark suite is KBs; Spark broadcasts it)
    */
  def dropQuotingDocs(docs: DataFrame, probes: DataFrame): DataFrame = {
    // normalize BOTH sides identically (lowercase, whitespace-collapsed) —
    // a raw probe with capitalization or irregular spacing could otherwise
    // never match the normalized document text
    val normProbes = probes.select(
      array_join(graft.functions.TextAnalysis.tokens(col("probe")), " ").as("probe"))
    docs
      .withColumn("norm",
        array_join(graft.functions.TextAnalysis.tokens(col("text")), " "))
      .join(broadcast(normProbes), contains(col("norm"), col("probe")), "left_anti")
      .drop("norm")
  }

  /** Streaming repetition gate — q259's degenerate-text filter at
    * ingestion time. A document's repetition score is BATCH-LOCAL by
    * construction (all of a doc's 3-grams live in its own row), so the
    * streaming form closes through the batch operator inside
    * foreachBatch: each micro-batch runs
    * [[graft.operators.Corpus.repetitionScore]] and lands the ADMITTED
    * documents idempotently in a `batch_id` partition (the
    * [[updateRatings]] exactly-once pattern — a replayed batch rewrites
    * its partition instead of duplicating it). Zero cross-batch state,
    * no watermark: the gate's answer for a document can never change,
    * which is exactly what makes foreachBatch the right seam here
    * rather than a stateful operator.
    *
    * Docs too short to form a 3-gram are admitted (they cannot loop).
    *
    * @param docs streaming frame with `doc_id` (long) and `text`
    */
  def repetitionGateStream(docs: DataFrame, outDir: String,
      checkpointDir: String, maxRepPpm: Long = 500000L): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val flagged = graft.operators.Corpus.repetitionScore(batch)
          .where(col("rep_ppm") > maxRepPpm).select(col("doc_id"))
        batch.join(flagged, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("text"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stream–stream interval join — the real-time twin of
    * [[graft.operators.TimeWindows.clickViewPairs]]: each arriving click
    * joins ALL of the same user's views from the preceding
    * `horizonMinutes`, across micro-batches. Both sides carry a
    * watermark and the join condition carries the time range, which is
    * what lets Spark BOUND the join state: a buffered view is evicted as
    * soon as the click-side watermark passes `view_ts + horizon`, so
    * state is (event rate × (horizon + watermark delay)) per side — O(1)
    * in stream length. Without the range predicate the inner join would
    * buffer both streams forever; this is the canonical shape from the
    * Structured Streaming join docs.
    *
    * Inputs are pre-filtered streams with schema
    * (user_id, event_id, ts): `clicks` and `views` — in production two
    * topics, in tests two MemoryStreams. Output matches the batch twin:
    * (user_id, click_id, view_id, gap_us), spec-asserted equal on a
    * closed input ([[graft.StreamingSpec]]).
    *
    * `joinType = "left_outer"` keeps orphan clicks (the "view-less click"
    * audit): the null-padded row for an unmatched click is emitted only
    * once the watermark proves no in-horizon view can still arrive —
    * eviction-driven completion, the semantics unique to stream–stream
    * outer joins (spec: the orphan appears only after BOTH inputs'
    * watermarks pass the horizon).
    */
  def clickViewPairsStream(clicks: DataFrame, views: DataFrame,
                           horizonMinutes: Int = 30,
                           watermarkDelay: String = "10 minutes",
                           joinType: String = "inner"): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    val v = views
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermarkDelay)
    c.join(v,
        col("user_id") === col("v_user_id") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") - expr(s"INTERVAL $horizonMinutes MINUTES"),
        joinType)
      .select(col("user_id"), col("click_id"), col("view_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts"))).as("gap_us"))
  }

  /** Streaming maintainer of the q139 table checksum
    * ([[graft.operators.Relational.tableChecksum]]): because the checksum
    * is a COMMUTATIVE sum of per-row hashes, the stream maintains it
    * exactly with a Complete-mode global aggregate whose state is two
    * numbers — replication can be verified continuously instead of by
    * rescanning the table. Shares [[graft.operators.Relational.rowHash]]
    * with the batch form, so a closed input yields the identical value
    * (spec-asserted).
    */
  def checksumStream(rows: DataFrame, cols: Seq[String]): DataFrame =
    rows.select(graft.operators.Relational.rowHash(cols).as("h"))
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("checksum"))

  /** Streaming near-dup candidates — the MinHash+LSH band join (q39's
    * [[graft.operators.Dedup.minhashPairs]]) run as a watermarked
    * stream-stream SELF-join: each arriving document's band-content keys
    * meet every in-horizon document sharing a band, and the signature
    * agreement fraction estimates Jaccard exactly as in batch. This is
    * the ingest-time "have we already crawled this page" gate; the
    * horizon bounds both join buffers (state = doc rate × bands ×
    * (horizon + delay)), so it runs forever.
    *
    * Emits one row per AGREEING band (a closed-input replay equals the
    * batch pair set after `dropDuplicates(a_id, b_id)` — spec-asserted);
    * downstream consumers dedup or count bands as they need.
    *
    * Input schema: (doc_id, ts, text).
    */
  def nearDupPairsStream(docs: DataFrame, horizonMinutes: Int = 60,
                         watermarkDelay: String = "10 minutes",
                         n: Int = 3, k: Int = 64, bands: Int = 16,
                         minEstJaccard: Double = 0.5): DataFrame = {
    // COMPACT banded form (sig32 + 64-bit band keys): the join must BUFFER
    // every in-horizon (doc, band) row on both sides, and the batch form's
    // content-string keys + array<long> sigs measured ~1.9 KB of state per
    // row — state-commit volume, not join compute, was the gate's measured
    // per-batch cost floor. The compact row is ~350 B for the same
    // semantics (see bandedSignaturesStreamCompact's scaladoc).
    val rowsPerBand = k / bands
    val banded = graft.operators.Dedup.bandedSignaturesStreamCompact(docs, n, k, bands)
    val a = banded.select(col("doc_id").as("a_id"), col("ts").as("a_ts"),
        col("band").as("a_band"), col("key").as("a_key"), col("sig32").as("sig_a"))
      .withWatermark("a_ts", watermarkDelay)
    val b = banded.select(col("doc_id").as("b_id"), col("ts").as("b_ts"),
        col("band").as("b_band"), col("key").as("b_key"), col("sig32").as("sig_b"))
      .withWatermark("b_ts", watermarkDelay)
    // `a_id < b_id` cannot live in the join condition: Spark's
    // StreamingJoinHelper probes every `<` predicate for a state
    // watermark and throws on non-time attributes. Join on ≠ instead
    // (skipped by the helper) and canonicalize the order in the output —
    // each pair then arrives once per direction; distinct() collapses.
    a.join(b,
        col("a_band") === col("b_band") && col("a_key") === col("b_key") &&
          col("a_id") =!= col("b_id") &&
          col("b_ts") >= col("a_ts") - expr(s"INTERVAL $horizonMinutes MINUTES") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"))
      // exactness restored post-join: the 64-bit band key can collide where
      // the batch form's content key cannot, so re-verify the band CONTENT
      // from the sig32 slices both sides already carry (int equality ⇔
      // long equality: minhash values are < 2³¹−1 from the Mersenne-prime
      // reduction, so the int cast is lossless). A collision costs only a
      // discarded candidate here — never a wrong emit — keeping the
      // closed-input replay exactly equal to batch minhashPairs.
      .where(slice(col("sig_a"), col("a_band") * rowsPerBand + 1, lit(rowsPerBand)) ===
        slice(col("sig_b"), col("a_band") * rowsPerBand + 1, lit(rowsPerBand)))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), v => v))
          .cast("double") / k)
      .where(col("est_jaccard") >= minEstJaccard)
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"),
        col("a_band").as("band"), col("est_jaccard"))
  }

  /** Sink #2 — JSON output, stand-in for the Kafka `Output` topic
    * (`RealTimeRecommendations.java:58-68`, `KafkaOutputSerialization.java:9-19`).
    * Schema matches `KafkaOutput {userId, recommendedProducts: Set<String>}`.
    *
    * `format`/`options` mirror [[readReviews]] — the Kafka binding is
    * `format = "kafka"`, `options = kafkaSinkOptions(bootstrap)`,
    * `outDir = ""` (Kafka takes no path). The `value` column IS the wire
    * payload either way; see [[kafkaSinkOptions]] for the pinned contract.
    */
  def writeOutput(enriched: DataFrame, outDir: String, checkpointDir: String,
                  format: String = "text",
                  options: Map[String, String] = Map.empty)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    val w = enriched
      .select(to_json(struct(col("userId"), col("recommendedProducts"))).as("value"))
      .writeStream
      .format(format) // "kafka" binds here unchanged — the value column is the wire payload
      .options(options)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
    if (outDir.nonEmpty) w.option("path", outDir) else w
  }

  // -------------------------------------------------------------------------
  // Kafka binding contract (`RealTimeRecommendations.java:40-48,58-68`)
  //
  // The environment ships no spark-sql-kafka connector jar and dependencies
  // are offline, so these cannot START here — but they pin the EXACT option
  // set and value projection a real cluster flips to, and the projections
  // themselves are batch-testable (StreamingSpec "kafka binding contract").
  // -------------------------------------------------------------------------

  /** Source options for the reference's consumer: topic `Reviews`, read
    * from the earliest offset (the reference replays the whole stream
    * partition — `kafka_stream_generator.py:20-41` feeds it from offset 0).
    */
  def kafkaSourceOptions(bootstrapServers: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> "Reviews",
    "startingOffsets" -> "earliest")

  /** Sink options for the reference's producer: topic `Output`. */
  def kafkaSinkOptions(bootstrapServers: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "topic" -> "Output")

  /** The Kafka-source value projection: the raw source exposes a fixed
    * (key, value, topic, partition, offset, timestamp, …) schema — the
    * `Review` fields come from `from_json` over the value bytes, exactly
    * the Jackson decode at `ReviewDeserialization.java:14-27`. Applied to
    * a Kafka read this replaces [[readReviews]]'s `.schema(...)` (the
    * Kafka source rejects user schemas):
    *
    *   decodeKafkaValue(spark.readStream.format("kafka")
    *     .options(kafkaSourceOptions(bootstrap)).load())
    *
    * Pure projection — batch-testable without the connector.
    */
  def decodeKafkaValue(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast("string"), reviewSchema).as("r"))
      .select(col("r.userId"), col("r.productId"), col("r.review"),
        col("r.timestamp"))
}
