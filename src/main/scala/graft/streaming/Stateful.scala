package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: per-user running review statistics via
  * `mapGroupsWithState` — the KeyValueGroupedDataset state seam the
  * reference externalizes to Redis (`SADD userRatings:{uid}` per event,
  * `streaming/RealTimeRecommendations.java:72-88`). Keeping the state in
  * Spark's state store makes it fault-tolerant (checkpointed), local to the
  * shuffle partition (no per-event network RPC), and scales with the number
  * of partitions, not users.
  *
  * State BOUNDS: at 100-TB user cardinality a `NoTimeout` state store
  * grows forever, so every path below offers TTL eviction
  * (`state.remove()`). [[statsWithTTL]] is the production form — eviction
  * driven by the event-time watermark, fully deterministic (spec-asserted)
  * and free of the empty-batch re-triggering that processing-time timeouts
  * cause. The simpler forms take an opt-in wall-clock TTL for
  * bounded-cardinality / interactive use.
  */
object Stateful {

  /** The reference's wire record (`streaming/models/Review.java:6-11`). */
  case class Review(userId: Long, productId: Long, review: Double, timestamp: Long)

  /** [[Review]] plus the derived event-time column the watermark rides on. */
  case class TimedReview(userId: Long, productId: Long, review: Double, timestamp: Long,
                         eventTime: java.sql.Timestamp)

  /** Running per-user aggregate carried across micro-batches. */
  case class UserStats(userId: Long, nReviews: Long, sumRating: Double, meanRating: Double,
                       lastTimestamp: Long)

  /** [[UserStats]] transition row; `evicted = true` marks the final flush
    * emitted when the user's state times out and is removed.
    */
  case class UserStatsEvent(userId: Long, nReviews: Long, sumRating: Double, meanRating: Double,
                            lastTimestamp: Long, evicted: Boolean)

  private def fold(userId: Long, events: Iterator[Review],
                   state: GroupState[UserStats]): UserStats = {
    val prev = state.getOption.getOrElse(UserStats(userId, 0L, 0.0, 0.0, Long.MinValue))
    var n = prev.nReviews
    var sum = prev.sumRating
    var lastTs = prev.lastTimestamp
    events.foreach { e =>
      n += 1; sum += e.review; if (e.timestamp > lastTs) lastTs = e.timestamp
    }
    val next = UserStats(userId, n, sum, if (n == 0) 0.0 else sum / n, lastTs)
    state.update(next)
    next
  }

  /** Streaming form: one updated UserStats row per user per micro-batch.
    *
    * With `ttl = Some(duration)`, users idle longer than `ttl` (wall clock)
    * have their state evicted; the eviction emits the final stats row once
    * more (a flush, harmless to an update-mode sink keyed on userId).
    * CAVEAT: processing-time timeouts make Spark re-trigger empty
    * micro-batches continuously to evaluate them — pair with an explicit
    * `Trigger.ProcessingTime` interval, and note
    * `StreamingQuery.processAllAvailable` never drains such a query (why
    * the spec asserts eviction on [[statsWithTTL]], the event-time form).
    * `ttl = None` keeps state forever — only for bounded key cardinality;
    * at 100-TB user counts use a TTL form.
    */
  def runningUserStats(spark: SparkSession, reviews: Dataset[Review],
                       ttl: Option[String] = None): Dataset[UserStats] = {
    import spark.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    reviews
      .groupByKey(_.userId)
      .mapGroupsWithState[UserStats, UserStats](timeoutConf) {
        (userId, events, state) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val next = fold(userId, events, state)
            ttl.foreach(state.setTimeoutDuration)
            next
          }
      }
  }

  /** Append-mode variant emitting every state transition (flatMap seam —
    * the shape session/cart analytics needs), same opt-in processing-time
    * TTL eviction (and the same caveats) as [[runningUserStats]].
    */
  def statsTransitions(spark: SparkSession, reviews: Dataset[Review],
                       ttl: Option[String] = None): Dataset[UserStats] = {
    import spark.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    reviews
      .groupByKey(_.userId)
      .flatMapGroupsWithState[UserStats, UserStats](OutputMode.Append, timeoutConf) {
        (userId: Long, events: Iterator[Review], state: GroupState[UserStats]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator.single(last)
          } else {
            val next = fold(userId, events, state)
            ttl.foreach(state.setTimeoutDuration)
            Iterator.single(next)
          }
      }
  }

  /** Event-time-TTL form: state for a user is evicted once the watermark
    * passes (last event time + ttlMs); the eviction emits a final
    * `evicted = true` row. Deterministic (driven by the watermark, not wall
    * clock), so eviction is spec-assertable — and the exact shape a 100-TB
    * session store needs: state size is bounded by the number of users
    * active within one TTL horizon, not the all-time user count.
    *
    * @param reviews streaming frame with [[Review]]'s columns; `timestamp`
    *                is epoch millis and becomes the watermark column.
    */
  def statsWithTTL(spark: SparkSession, reviews: DataFrame,
                   watermarkDelay: String = "10 minutes",
                   ttlMs: Long = 30L * 60 * 1000): Dataset[UserStatsEvent] = {
    import spark.implicits._
    reviews
      .withColumn("eventTime", timestamp_millis(col("timestamp")))
      .withWatermark("eventTime", watermarkDelay)
      .as[TimedReview]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[UserStats, UserStatsEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, events: Iterator[TimedReview], state: GroupState[UserStats]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator.single(UserStatsEvent(userId, last.nReviews, last.sumRating,
              last.meanRating, last.lastTimestamp, evicted = true))
          } else {
            val next = fold(userId,
              events.map(t => Review(t.userId, t.productId, t.review, t.timestamp)), state)
            // a timeout timestamp at-or-before the current watermark is
            // rejected by Spark — late stragglers clamp to watermark + 1ms
            // (their state then evicts on the next batch, as it should)
            state.setTimeoutTimestamp(
              math.max(next.lastTimestamp + ttlMs, state.getCurrentWatermarkMs() + 1))
            Iterator.single(UserStatsEvent(userId, next.nReviews, next.sumRating,
              next.meanRating, next.lastTimestamp, evicted = false))
          }
      }
  }

  /** One raw event for streaming funnel tracking. `timestamp` is epoch
    * millis in the TTL form (it becomes the watermark column).
    */
  case class FunnelEvent(userId: Long, eventType: String, timestamp: Long)

  /** [[FunnelEvent]] plus the derived event-time column for the TTL form. */
  case class TimedFunnelEvent(userId: Long, eventType: String, timestamp: Long,
                              eventTime: java.sql.Timestamp)

  /** TTL-form state: the stage reached plus the last event time that arms
    * the eviction timer.
    */
  case class FunnelState(stage: Int, lastTs: Long)

  /** TTL-form output row; `evicted = true` marks the final flush emitted
    * when a user's state times out (stage/timestamp are the last reached).
    */
  case class FunnelAdvanceEvent(userId: Long, stage: Int, stageName: String,
                                timestamp: Long, evicted: Boolean)

  /** Emitted once per stage ADVANCE: the user reached `stage` at
    * `timestamp`.
    */
  case class FunnelAdvance(userId: Long, stage: Int, stageName: String, timestamp: Long)

  /** Input row for the streaming transition counter; `eventId` breaks
    * same-timestamp ordering ties exactly like the batch window's
    * (ts, event_id) sort key.
    */
  case class TransitionEvent(userId: Long, eventId: Long, eventType: String, timestamp: Long)

  /** One observed adjacency: the user moved from `fromType` to `toType`
    * at `timestamp`.
    */
  case class Transition(userId: Long, fromType: String, toType: String, timestamp: Long)

  /** Streaming twin of [[graft.operators.TimeWindows.transitionMatrix]]'s
    * adjacency extraction: per user, state is ONE string (the last event
    * type seen) and every arriving event emits the (prev → current)
    * transition. Counting/normalizing into the matrix is a downstream
    * stateless aggregate — the state here stays O(1) per user regardless
    * of history length, where a collect-the-sequence design would grow
    * without bound.
    *
    * In-batch disorder is folded in (timestamp, eventId) order, matching
    * the batch window's total order, so a closed input replayed through
    * this stream yields EXACTLY the batch twin's adjacency multiset
    * (spec-asserted). NoTimeout form — for 100-TB user cardinality add
    * event-time TTL eviction exactly as [[statsWithTTL]] does; an evicted
    * user restarts with no previous type, dropping only the single
    * adjacency that spans the idle gap.
    */
  def transitions(spark: SparkSession, events: Dataset[TransitionEvent]): Dataset[Transition] = {
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[String, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[TransitionEvent], state: GroupState[String]) =>
          var prev = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          batch.toSeq.sortBy(e => (e.timestamp, e.eventId)).foreach { e =>
            prev.foreach(p => out += Transition(userId, p, e.eventType, e.timestamp))
            prev = Some(e.eventType)
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  /** Input row for the streaming gap extractor (micros timestamps;
    * `eventId` is the same tiebreak as the batch window's sort key).
    */
  case class GapEvent(userId: Long, eventId: Long, eventType: String, timestamp: Long)

  /** The last event a user was seen at — the O(1) state behind
    * [[interArrivalGaps]].
    */
  case class LastSeen(ts: Long, tpe: String)

  /** One inter-arrival observation, typed by the FROM event (matching
    * the batch histogram's attribution).
    */
  case class Gap(userId: Long, eventType: String, gapUs: Long)

  /** Streaming twin of [[graft.operators.Relational.latencyHistogram]]'s
    * gap extraction: per user, state is the last (timestamp, type) pair
    * and every arriving event emits one gap row typed by the previous
    * event — the [[transitions]] scaffold carrying a measurement instead
    * of an adjacency. Closing the emitted gaps through
    * `Relational.histogramFromGaps` reproduces the batch histogram
    * exactly on closed inputs (spec-asserted).
    *
    * In-batch disorder folds in (timestamp, eventId) order like every
    * stateful op here; state is O(1) per user (NoTimeout form — add
    * event-time TTL as [[statsWithTTL]] for unbounded key cardinality).
    */
  def interArrivalGaps(spark: SparkSession, events: Dataset[GapEvent]): Dataset[Gap] = {
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[LastSeen, Gap](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[GapEvent], state: GroupState[LastSeen]) =>
          var prev = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[Gap]
          batch.toSeq.sortBy(e => (e.timestamp, e.eventId)).foreach { e =>
            prev.foreach(p => out += Gap(userId, p.tpe, e.timestamp - p.ts))
            prev = Some(LastSeen(e.timestamp, e.eventType))
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  /** Streaming conversion funnel — the stateful real-time twin of
    * [[graft.operators.TimeWindows.conversionFunnel]]: per user, a tiny
    * state machine (current stage int) advances only on the NEXT stage's
    * event type, and every advance emits one [[FunnelAdvance]] row. Events
    * inside a micro-batch are sorted by timestamp before folding, so
    * in-batch disorder cannot skip or reorder stages; cross-batch disorder
    * is bounded by the source's delivery guarantees exactly like every
    * mapGroupsWithState consumer.
    *
    * State is ONE int per user ever seen in the funnel — the smallest
    * possible CEP state. This NoTimeout form keeps state forever and is
    * for bounded key cardinality / interactive use; the production form at
    * 100-TB user cardinality is [[funnelAdvancesWithTTL]], which bounds
    * state to the users active within one TTL horizon.
    *
    * @param stages ordered event types, default view → click → purchase
    */
  def funnelAdvances(spark: SparkSession, events: Dataset[FunnelEvent],
                     stages: Seq[String] = Seq("view", "click", "purchase")): Dataset[FunnelAdvance] = {
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[Int, FunnelAdvance](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[FunnelEvent], state: GroupState[Int]) =>
          var stage = state.getOption.getOrElse(0)
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelAdvance]
          // tie-break same-timestamp events by funnel stage index (NOT by
          // event-type string, which for view/click/purchase sorts in
          // reverse funnel order): a view and click sharing one timestamp
          // must fold view-first so the user advances to stage 2, matching
          // the batch twin's `ts >= t_prev` semantics
          batch.toSeq.sortBy(e => (e.timestamp, stages.indexOf(e.eventType))).foreach { e =>
            if (stage < stages.length && e.eventType == stages(stage)) {
              stage += 1
              out += FunnelAdvance(userId, stage, stages(stage - 1), e.timestamp)
            }
          }
          // don't allocate state for users who never entered the funnel —
          // at 100-TB cardinality most users never produce the first stage,
          // and a stage-0 entry would still cost a state-store row each
          if (stage > 0 || state.exists) state.update(stage)
          out.iterator
      }
  }

  /** Production form of [[funnelAdvances]]: the same per-user stage machine
    * with event-time-TTL eviction, mirroring [[statsWithTTL]]. A user idle
    * longer than `ttlMs` (by the watermark, not wall clock — deterministic
    * and spec-assertable) has their state evicted with one final
    * `evicted = true` flush row carrying the last stage reached; an event
    * arriving after eviction restarts the user at stage 0. State size is
    * bounded by the users active within one TTL horizon, not the all-time
    * user count.
    *
    * @param events streaming frame with [[FunnelEvent]]'s columns;
    *               `timestamp` is epoch millis and drives the watermark
    * @param stages ordered event types, default view → click → purchase
    */
  def funnelAdvancesWithTTL(spark: SparkSession, events: DataFrame,
                            stages: Seq[String] = Seq("view", "click", "purchase"),
                            watermarkDelay: String = "10 minutes",
                            ttlMs: Long = 30L * 60 * 1000): Dataset[FunnelAdvanceEvent] = {
    import spark.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("timestamp")))
      .withWatermark("eventTime", watermarkDelay)
      .as[TimedFunnelEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, FunnelAdvanceEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[TimedFunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator.single(FunnelAdvanceEvent(userId, last.stage,
              if (last.stage > 0) stages(last.stage - 1) else "", last.lastTs, evicted = true))
          } else {
            val prev = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            var stage = prev.stage
            var lastTs = prev.lastTs
            val out = scala.collection.mutable.ArrayBuffer.empty[FunnelAdvanceEvent]
            // same in-batch ordering contract as the NoTimeout form: by
            // (timestamp, stage index) so simultaneous events fold in
            // funnel order, matching the batch twin's >= semantics
            batch.toSeq.sortBy(e => (e.timestamp, stages.indexOf(e.eventType))).foreach { e =>
              if (e.timestamp > lastTs) lastTs = e.timestamp
              if (stage < stages.length && e.eventType == stages(stage)) {
                stage += 1
                out += FunnelAdvanceEvent(userId, stage, stages(stage - 1), e.timestamp,
                  evicted = false)
              }
            }
            // the same no-allocation guard as the NoTimeout form; armed
            // state clamps its timer past the watermark like statsWithTTL
            if (stage > 0 || state.exists) {
              state.update(FunnelState(stage, lastTs))
              state.setTimeoutTimestamp(
                math.max(lastTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** Input row for the streaming EWMA baseline: one typed event with an
    * epoch-millis timestamp plus the derived event-time column (the
    * watermark column, as in [[statsWithTTL]]).
    */
  case class VolumeEvent(eventType: String, timestamp: Long)
  case class TimedVolumeEvent(eventType: String, timestamp: Long,
                              eventTime: java.sql.Timestamp)

  /** Per-type EWMA state: counts for days the watermark has not passed
    * yet, plus the already-folded recurrence. `openDays` is bounded by
    * the watermark delay (≈ delay/1 day entries); the folded scalars are
    * O(1) — the total state is |event types| × a handful of numbers.
    */
  case class EwmaState(openDays: Map[Long, Long], nDays: Long,
                       lastDay: Long, ewma: Double)

  /** Snapshot emitted after every fold: the live report row. The LAST
    * snapshot per type over a closed input equals the batch
    * [[graft.operators.TimeWindows.ewmaDailyVolume]] row (spec-asserted).
    */
  case class EwmaSnapshot(eventType: String, nDays: Long, lastDay: Long,
                          ewma: Double, openDayCount: Int)

  private val DayMs = 86400000L

  /** Streaming twin of [[graft.operators.TimeWindows.ewmaDailyVolume]]
    * (q132) — the stateful FLOAT recurrence the batch op folds over its
    * ordered daily array, maintained incrementally: per event type, open
    * days accumulate counts until the watermark passes their end, then
    * fold in day order through `ewma = cnt + ewma / 2` (identical IEEE
    * op order to the batch `aggregate` lambda, so the doubles agree
    * bit-for-bit on a closed input).
    *
    * A chained design (daily windowed agg → stateful fold) is
    * unsupported — Spark rejects mapGroupsWithState downstream of a
    * streaming aggregation — so the day counting lives INSIDE the state:
    * one map entry per OPEN day per type, evicted the moment the
    * recurrence consumes it. Event-time timeouts re-fire the close even
    * when a type goes quiet, so a stalled type still folds its last days.
    */
  def ewmaVolumeStream(spark: SparkSession, events: DataFrame,
                       watermarkDelay: String = "10 minutes"): Dataset[EwmaSnapshot] = {
    import spark.implicits._

    def close(st: EwmaState, wmMs: Long): EwmaState = {
      val (ripe, open) = st.openDays.partition { case (d, _) => (d + 1) * DayMs <= wmMs }
      var (n, last, ewma) = (st.nDays, st.lastDay, st.ewma)
      ripe.toSeq.sortBy(_._1).foreach { case (d, cnt) =>
        ewma = if (n == 0) cnt.toDouble else cnt.toDouble + ewma / 2.0
        n += 1; last = d
      }
      EwmaState(open, n, last, ewma)
    }
    def nextTimeout(st: EwmaState, wmMs: Long): Option[Long] =
      st.openDays.keys.reduceOption(_ min _).map(d => math.max((d + 1) * DayMs, wmMs + 1))

    events
      .withColumn("eventTime", timestamp_millis(col("timestamp")))
      .withWatermark("eventTime", watermarkDelay)
      .as[TimedVolumeEvent]
      .groupByKey(_.eventType)
      .flatMapGroupsWithState[EwmaState, EwmaSnapshot](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (eventType: String, batch: Iterator[TimedVolumeEvent], state: GroupState[EwmaState]) =>
          val prev = state.getOption.getOrElse(EwmaState(Map.empty, 0L, -1L, 0.0))
          val wm = state.getCurrentWatermarkMs()
          val merged =
            if (state.hasTimedOut) prev
            else {
              val arrivals = batch.foldLeft(Map.empty[Long, Long]) { (m, e) =>
                val d = e.timestamp / DayMs
                m.updated(d, m.getOrElse(d, 0L) + 1L)
              }
              // a day at-or-under the folded frontier would re-fold out of
              // order — watermark semantics already exclude it; drop it
              val fresh = arrivals.filter { case (d, _) => prev.nDays == 0 || d > prev.lastDay }
              prev.copy(openDays = fresh.foldLeft(prev.openDays) {
                case (m, (d, c)) => m.updated(d, m.getOrElse(d, 0L) + c)
              })
            }
          val next = close(merged, wm)
          state.update(next)
          nextTimeout(next, wm).foreach(state.setTimeoutTimestamp)
          Iterator.single(EwmaSnapshot(eventType, next.nDays, next.lastDay,
            next.ewma, next.openDays.size))
      }
  }

  /** Wire record for [[scdIntervalsStream]]: one CDC event with its
    * event-time column for the watermark.
    */
  case class ScdEvent(userId: Long, eventId: Long, tsUs: Long,
                      eventType: String, eventTime: java.sql.Timestamp)

  /** Per-user SCD fold state: events the watermark has not finalized yet
    * (bounded by the watermark delay), plus the open interval — three
    * scalars. Total state per user = O(events inside the delay horizon).
    */
  case class ScdState(buffer: List[(Long, Long, String)], curAttr: Option[String],
                      curFromUs: Long, version: Long)

  /** One CLOSED validity interval — the Append-mode emission unit. */
  case class ScdClosed(userId: Long, version: Long, attrValue: String,
                       validFromUs: Long, validToUs: Long)

  /** Streaming twin of [[graft.operators.TimeWindows.scdIntervals]]
    * (q146) — the CDC-stream → dimension-history fold, maintained live:
    * per user, arrivals buffer until the watermark passes their event
    * time (late/out-of-order data within the delay reorders correctly),
    * then fold in (ts, event_id) order; a value change CLOSES the open
    * interval and emits it. Append mode can only emit finalized rows, so
    * the stream emits closed intervals — on a closed input they equal
    * exactly the batch rows with `is_current = false` (spec-asserted);
    * the open interval lives in state, queryable as the current
    * dimension row.
    *
    * Event-time timeouts re-fire the fold when a user goes quiet, so
    * buffered events still finalize without new arrivals. Like the
    * reference's Redis user-state (SURVEY §2 row 3.3), the open interval
    * per user persists indefinitely — that is SCD semantics; a
    * production deployment bounds USER cardinality, not interval
    * lifetime.
    */
  def scdIntervalsStream(spark: SparkSession, events: DataFrame,
                         watermarkDelay: String = "10 minutes"): Dataset[ScdClosed] = {
    import spark.implicits._
    events
      .select(col("user_id").as("userId"), col("event_id").as("eventId"),
        unix_micros(col("ts")).as("tsUs"), col("event_type").as("eventType"),
        col("ts").as("eventTime"))
      .withWatermark("eventTime", watermarkDelay)
      .as[ScdEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[ScdState, ScdClosed](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[ScdEvent], state: GroupState[ScdState]) =>
          val prev = state.getOption.getOrElse(ScdState(Nil, None, 0L, 0L))
          val buffered =
            if (state.hasTimedOut) prev
            else prev.copy(buffer = prev.buffer ++
              batch.map(e => (e.tsUs, e.eventId, e.eventType)))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ripe, open) = buffered.buffer.partition(_._1 < wmUs)
          var cur = buffered.curAttr
          var from = buffered.curFromUs
          var ver = buffered.version
          val out = scala.collection.mutable.ListBuffer.empty[ScdClosed]
          ripe.sortBy { case (ts, eid, _) => (ts, eid) }.foreach {
            case (ts, _, attr) =>
              cur match {
                case Some(a) if a == attr => () // run continues
                case Some(a) =>
                  out += ScdClosed(userId, ver, a, from, ts)
                  ver += 1; cur = Some(attr); from = ts
                case None =>
                  ver = 1L; cur = Some(attr); from = ts
              }
          }
          val next = ScdState(open, cur, from, ver)
          state.update(next)
          open.map(_._1).reduceOption(_ min _)
            .foreach(ts => state.setTimeoutTimestamp(ts / 1000L + 1L))
          out.iterator
      }
  }

  /** One (band, key) group member of the near-dup gate's banded stream. */
  case class BandRow(doc_id: Long, ts: java.sql.Timestamp, band: Int,
                     key: Long, sig32: Array[Int])

  /** One buffered in-horizon document inside a band bucket. */
  case class BandEntry(docId: Long, tsUs: Long, sig: Array[Int])

  /** Custom-state PRODUCTION form of the streaming near-dup gate
    * ([[RealTime.nearDupPairsStream]] is the declarative stream-stream
    * join twin; spec-asserted pair-set-equal on closed inputs). Why a
    * `flatMapGroupsWithState` keyed on the LSH band bucket beats the
    * symmetric join FOR THIS SHAPE, all measured at sf1.0:
    *
    *   - ONE state row per (doc, band): the self-join buffers both sides
    *     of the same stream — every row twice — and keeps 4 state stores
    *     per partition (keyToNumValues + keyWithIndexToValue per side) vs
    *     this operator's 1; state bytes and per-batch commit work drop
    *     ~4×.
    *   - ONE source subtree: a stream-stream self-join evaluates the
    *     banded-signature map once PER SIDE; here the map runs once.
    *   - per-GROUP eviction: the join's `b_ts >= a_ts - horizon` range
    *     lives on a VALUE column, so eviction scans every buffered row
    *     every batch (removeByValueCondition); here each bucket prunes
    *     its own few entries when touched or timed out.
    *
    * Bucket state stays tiny by construction (max bucket population 38 at
    * sf1.0 across 753k buckets — LSH's whole point), so the per-group
    * pair loop is bounded; the emitted pair set is EXACTLY the join
    * form's after `distinct()` (one canonical row per agreeing band vs
    * the join's one per direction).
    */
  def nearDupPairsStatefulStream(spark: SparkSession, docs: DataFrame,
                                 horizonMinutes: Int = 60,
                                 watermarkDelay: String = "10 minutes",
                                 n: Int = 3, k: Int = 64, bands: Int = 16,
                                 minEstJaccard: Double = 0.5): DataFrame = {
    import spark.implicits._
    val rowsPerBand = k / bands
    val horizonUs = horizonMinutes * 60L * 1000000L
    graft.operators.Dedup.bandedSignaturesStreamCompact(docs, n, k, bands)
      .withWatermark("ts", watermarkDelay)
      .as[BandRow]
      .groupByKey(r => (r.band, r.key))
      .flatMapGroupsWithState[Array[BandEntry], (Long, Long, Int, Double)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bk: (Int, Long), batch: Iterator[BandRow],
         state: GroupState[Array[BandEntry]]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // an entry can still pair with a future (≥ watermark) doc only
          // while ts >= wm - horizon — the same bound the join form's
          // state watermark derives from its time-range condition
          val live = state.getOption.getOrElse(Array.empty[BandEntry])
            .filter(_.tsUs >= wmUs - horizonUs)
          val buf = scala.collection.mutable.ArrayBuffer(live: _*)
          val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Int, Double)]
          if (!state.hasTimedOut) {
            val lo = bk._1 * rowsPerBand
            batch.foreach { d =>
              val tsUs = d.ts.getTime * 1000L +
                (d.ts.getNanos / 1000L) % 1000L
              var i = 0
              while (i < buf.length) {
                val e = buf(i)
                if (e.docId != d.doc_id &&
                    math.abs(e.tsUs - tsUs) <= horizonUs) {
                  // 64-bit key collision re-check: band CONTENT equality
                  var j = 0
                  var bandEq = true
                  while (bandEq && j < rowsPerBand) {
                    bandEq = e.sig(lo + j) == d.sig32(lo + j); j += 1
                  }
                  if (bandEq) {
                    var agree = 0
                    j = 0
                    while (j < k) {
                      if (e.sig(j) == d.sig32(j)) agree += 1; j += 1
                    }
                    val est = agree.toDouble / k
                    if (est >= minEstJaccard)
                      out += ((math.min(e.docId, d.doc_id),
                        math.max(e.docId, d.doc_id), bk._1, est))
                  }
                }
                i += 1
              }
              buf += BandEntry(d.doc_id, tsUs, d.sig32)
            }
          }
          if (buf.isEmpty) state.remove()
          else {
            state.update(buf.toArray)
            // next pruning point: the earliest entry ages out of the
            // horizon (must be strictly beyond the current watermark)
            val minTs = buf.iterator.map(_.tsUs).min
            state.setTimeoutTimestamp(
              math.max((minTs + horizonUs) / 1000L + 1L,
                state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
      .toDF("a_id", "b_id", "band", "est_jaccard")
  }
}
