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
  * Implementation: a driver-side loop of DataFrame rounds, i.e. the
  * same superstep structure Gelly/Pregel runs, expressed relationally:
  *   join(edges, labels on src) → groupBy(dst, label).count
  *   → argmax per dst (max over (cnt, label) structs) → update.
  *
  * Scale notes:
  *  - Each round shuffles |E| rows on dst, then |V| on the update join —
  *    identical to a Pregel superstep's message shuffle; nothing driver-side.
  *  - `localCheckpoint` after each round truncates lineage so the plan does
  *    not grow O(iters) deep (on a cluster, `checkpoint` to reliable storage
  *    would be used instead; the cut-lineage semantics are the same).
  *  - [[run]] matches the reference exactly: a fixed iteration count
  *    (5), bounded and predictable. [[runUntilConverged]] is the scale
  *    extension (the kCore fixpoint pattern): a no-op round ends the
  *    loop early — at 100× scale a converged-early LP saves real
  *    shuffles, at the price of one tiny `changed`-count action per
  *    round (computed on the SAME materialization barrier the loop
  *    already takes, so no extra pass over the data).
  */
object LabelPropagation {

  /** One synchronous superstep: every vertex adopts the most frequent
    * neighbor label (ties to the larger label); isolated vertices keep
    * theirs. Shared by the fixed-round and fixpoint drivers.
    *
    * argmax via max(struct(cnt, label)): lexicographic struct ordering is
    * exactly the (most-frequent, then max-label) Gelly tiebreak, and a
    * hash aggregate beats sorting every (id) partition for row_number.
    */
  private def superstep(e: DataFrame, labels: DataFrame): DataFrame = {
    val neighborLabels = e.join(labels, e("src") === labels("id"))
      .select(col("dst").as("id"), col("label"))
    val best = neighborLabels
      .groupBy("id", "label").agg(count(lit(1)).as("cnt"))
      .groupBy("id")
      .agg(max(struct(col("cnt"), col("label"))).getField("label").as("newLabel"))
    labels.join(best, Seq("id"), "left")
      .select(col("id"), col("label").as("prev"),
        coalesce(col("newLabel"), col("label")).as("label"))
  }

  private def initLabels(e: DataFrame): DataFrame =
    e.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))

  /** Materialize the edge list once: every round references it, and without
    * this the upstream plan (e.g. the co-rating self-join) would re-execute
    * per superstep — O(iters) scans instead of one.
    */
  private def edgeSeam(edges: DataFrame, eager: Boolean): DataFrame =
    if (eager) edges.select("src", "dst").transform(graft.barrier)
    else edges.select("src", "dst")

  /** Reference-faithful fixed-round form (Gelly's `LabelPropagation(5)`).
    *
    * @param edges undirected edge list with `src`,`dst` Long columns (both
    *              directions present — see [[graft.operators.Reco.undirected]]).
    * @return DataFrame of (`id` Long, `label` Long).
    */
  def run(edges: DataFrame, iters: Int = 5, eager: Boolean = true): DataFrame = {
    val e = edgeSeam(edges, eager)
    var labels = initLabels(e)
    for (_ <- 1 to iters) {
      val updated = superstep(e, labels).select("id", "label")
      labels = if (eager) updated.transform(graft.barrier) else updated
    }
    labels
  }

  /** Fixpoint form: iterate until a superstep changes no label (or
    * `maxIters`, the oscillation bound — synchronous LP can 2-cycle on
    * bipartite structures, so an unconditional fixpoint loop would hang).
    *
    * @return (labels, roundsRun) — roundsRun counts executed supersteps
    *         INCLUDING the final no-op one that proved convergence.
    */
  def runUntilConverged(edges: DataFrame, maxIters: Int = 50): (DataFrame, Int) = {
    val e = edgeSeam(edges, eager = true)
    var labels = initLabels(e)
    var rounds = 0
    var changed = 1L
    while (rounds < maxIters && changed > 0) {
      // one barrier materializes the round; the changed-count action then
      // reads the materialized blocks, not the plan
      val updated = superstep(e, labels)
        .select(col("id"), col("label"), (col("label") =!= col("prev")).as("chg"))
        .transform(graft.barrier)
      changed = updated.where(col("chg")).count()
      labels = updated.select("id", "label")
      rounds += 1
    }
    (labels, rounds)
  }
}
