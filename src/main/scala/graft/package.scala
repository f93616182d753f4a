import org.apache.spark.sql.DataFrame

/** Root package of the graft engine.
  *
  * ==Materialization barriers (the one central note)==
  *
  * Several operators place an eager materialization barrier inside their
  * plan via [[graft.barrier]]:
  *
  *  - '''Iteration''' (label propagation, connected components): each
  *    round's output is materialized so round k+1's plan doesn't re-run
  *    rounds 1..k (lineage otherwise grows exponentially).
  *  - '''Lambda-inlining stops''' (winnowing, chunking, n-gram indexes):
  *    Catalyst's CollapseProject inlines a producer expression into every
  *    use inside higher-order-function lambdas; a barrier makes the
  *    consumer read a materialized attribute instead of re-evaluating a
  *    quadratic expression per element.
  *  - '''Shared subplans''' (LSH band index read by both join sides,
  *    IVF assignment read by probe and corpus sides): one materialization
  *    instead of two executions.
  *
  * The default implementation is `Dataset.localCheckpoint()`: blocks are
  * stored on the executors that computed them, NOT replicated or written
  * to a reliable filesystem. That is the right default for this harness
  * (single-JVM local mode — no executor can be "lost" independently) and
  * for interactive iteration, but it is '''non-fault-tolerant''': on a
  * real multi-executor cluster a lost executor makes the job fail instead
  * of recomputing the lost partitions.
  *
  * The production swaps, in preference order:
  *  1. set `SPARK_GRAFT_CHECKPOINT_DIR` — [[graft.barrier]] then uses
  *     reliable `Dataset.checkpoint()` into that directory (HDFS/object
  *     store), which survives executor loss;
  *  2. materialize the intermediate as a real table (parquet write +
  *     re-read) when the artifact is reused across jobs anyway — e.g. the
  *     corpus band index of `RealTime.flagNearDups`, which a cluster
  *     deployment would maintain as a bucketed table.
  *
  * Callers should not call `localCheckpoint()` directly in operator code —
  * route through [[graft.barrier]] so the policy stays swappable in one
  * place. (Specialized uses — lazy checkpoints inside bounded loops — may
  * still call the Dataset API directly and say why.)
  */
package object graft {

  /** Eager materialization barrier — see the package doc above for when
    * operators need one and what the production deployment swaps in.
    * Default: executor-local checkpoint (fast, non-fault-tolerant); with
    * `SPARK_GRAFT_CHECKPOINT_DIR` set: reliable checkpoint to that
    * directory.
    */
  def barrier(df: DataFrame): DataFrame =
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR") match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
}
