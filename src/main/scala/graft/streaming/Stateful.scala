package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: per-user running review statistics via
  * `mapGroupsWithState` — the KeyValueGroupedDataset state seam the
  * reference externalizes to Redis (`SADD userRatings:{uid}` per event,
  * `streaming/RealTimeRecommendations.java:72-88`). Keeping the state in
  * Spark's state store makes it fault-tolerant (checkpointed), local to the
  * shuffle partition (no per-event network RPC), and scales with the number
  * of partitions, not users.
  */
object Stateful {

  /** The reference's wire record (`streaming/models/Review.java:6-11`). */
  case class Review(userId: Long, productId: Long, review: Double, timestamp: Long)

  /** Running per-user aggregate carried across micro-batches. */
  case class UserStats(userId: Long, nReviews: Long, sumRating: Double, meanRating: Double,
                       lastTimestamp: Long)

  private def update(userId: Long, events: Iterator[Review],
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

  /** Streaming form: one updated UserStats row per user per micro-batch. */
  def runningUserStats(spark: SparkSession, reviews: Dataset[Review]): Dataset[UserStats] = {
    import spark.implicits._
    reviews
      .groupByKey(_.userId)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout)(update)
  }

  /** Append-mode variant emitting every state transition (flatMap seam —
    * the shape session/cart analytics needs).
    */
  def statsTransitions(spark: SparkSession, reviews: Dataset[Review]): Dataset[UserStats] = {
    import spark.implicits._
    reviews
      .groupByKey(_.userId)
      .flatMapGroupsWithState[UserStats, UserStats](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, events: Iterator[Review], state: GroupState[UserStats]) =>
          Iterator.single(update(userId, events, state))
      }
  }
}
