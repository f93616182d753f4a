package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by synchronous label propagation.
  *
  * Reference: Gelly `new LabelPropagation<>(5)` at
  * `batch/Recommendations.java:100-106` — each superstep every vertex adopts
  * the most frequent label among its neighbors, ties broken toward the
  * larger label; vertices with no neighbors keep their label. Initial label
  * = vertex id (equivalent up to relabeling to the reference's
  * `zipWithUniqueId` at `Recommendations.java:108-114`, since labels are
  * arbitrary identifiers — using the id keeps the algorithm deterministic
  * and engine-independent).
  *
  * Implementation: a driver-side loop of `iters` DataFrame rounds, i.e. the
  * same superstep structure Gelly/Pregel runs, expressed relationally:
  *   join(edges, labels on src) → groupBy(dst, label).count
  *   → argmax per dst (row_number over count DESC, label DESC) → update.
  *
  * Scale notes:
  *  - Each round shuffles |E| rows on dst, then |V| on the update join —
  *    identical to a Pregel superstep's message shuffle; nothing driver-side.
  *  - `localCheckpoint` after each round truncates lineage so the plan does
  *    not grow O(iters) deep (on a cluster, `checkpoint` to reliable storage
  *    would be used instead; the cut-lineage semantics are the same).
  *  - Iteration count is fixed (5 in the reference), so cost is bounded and
  *    predictable: 5 × (one co-partitioned join + one aggregate).
  */
object LabelPropagation {

  /** @param edges undirected edge list with `src`,`dst` Long columns (both
    *              directions present — see [[graft.operators.Reco.undirected]]).
    * @return DataFrame of (`id` Long, `label` Long).
    */
  def run(edges: DataFrame, iters: Int = 5, eager: Boolean = true): DataFrame = {
    // Materialize the edge list once: every round references it, and without
    // this the upstream plan (e.g. the co-rating self-join) would re-execute
    // per superstep — O(iters) scans instead of one.
    val e = if (eager) edges.select("src", "dst").transform(graft.barrier)
            else edges.select("src", "dst")
    var labels = e.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
    for (_ <- 1 to iters) {
      val neighborLabels = e.join(labels, e("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
      // argmax via max(struct(cnt, label)): lexicographic struct ordering is
      // exactly the (most-frequent, then max-label) Gelly tiebreak, and a
      // hash aggregate beats sorting every (id) partition for row_number
      val best = neighborLabels
        .groupBy("id", "label").agg(count(lit(1)).as("cnt"))
        .groupBy("id")
        .agg(max(struct(col("cnt"), col("label"))).getField("label").as("newLabel"))
      val updated = labels.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("newLabel"), col("label")).as("label"))
      labels = if (eager) updated.transform(graft.barrier) else updated
    }
    labels
  }
}
