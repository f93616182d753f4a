package graft

import org.apache.spark.sql.SparkSession

/** Isolated-timing profiler for local plan/perf iteration:
  *   runMain graft.Profile <sfDir> <queryName>[,name2,...]|all [explain]
  *
  * Unlike Bench (the graded suite artifact), this runs each named query in
  * sequence in one session and prints per-query isolated timings; with
  * SPARK_GRAFT_PROFILE_OUT=<file> it also writes them as one JSON object —
  * the per-round `profile_rNN.json` sidecar that lets later rounds
  * distinguish a real regression from a host steal window without
  * re-deriving isolated numbers.
  *
  * "Isolated" is made real by two warmups: one untimed query first (JIT +
  * codegen + classloading — without it the first profiled query absorbs
  * ~2.5 s of compiler time), and a [[Bench.warmPageCache]] re-warm BEFORE
  * EACH timed query. The re-warm matters on long `all` runs: /dev/shm
  * shuffle blocks from earlier queries squeeze the page cache, so late
  * queries silently pay cold parquet reads under this VM's block-IO
  * throttle — round-5 profiled q58 at 20.2 s isolated vs 2.7 s in-bench
  * from exactly that (3.1 s once warm), and a round-6 all-run reproduced
  * it mid-sequence (10.1 s) until the per-query re-warm.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    Bench.warmPageCache(sfDir)
    val names =
      if (args(1) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(1).split(",").toSeq
    val doExplain = args.length > 2 && args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // Shuffle partitions default to core count (the suite's sf0.1 shape)
    // but MUST scale with the data when profiling scale derivations:
    // q36's sf100 probe aggregates a 3.4e9-row candidate stream, and at
    // 24 partitions one hash-aggregate partition holds ~140M pair rows —
    // the kernel OOM-killed a 90g heap before AQE could help (AQE only
    // coalesces down; it never raises the initial partition count).
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-graft"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed JIT/codegen warmup so the first profiled query isn't charged
    // for compiler time (mirrors Bench's warmup discipline)
    try SparkEntry.queries("q01_top_products")(spark, sfDir).count()
    catch { case e: Throwable => System.err.println(s"[profile] warmup failed: ${e.getMessage}") }
    val times = names.map { name =>
      Bench.warmPageCache(sfDir) // re-warm: earlier queries evict pages
      // Time CONSTRUCTION + count, like Bench: graft.barrier is an EAGER
      // localCheckpoint, so seam/barrier materialization runs while the
      // query builder executes — timing only count() undercounted every
      // barrier-using query (q102 read 0.7 s isolated vs its true 3.6 s)
      // and made bench totals look inflated when they were simply right.
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val cnt = df.count()
      val t = (System.nanoTime() - t0) / 1e9
      if (doExplain) df.explain("formatted")
      println(f"[profile] $name: $cnt rows in $t%.2f s")
      name -> t
    }
    sys.env.get("SPARK_GRAFT_PROFILE_OUT").foreach { path =>
      val qs = times.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
        s"""{"queries":$qs,"sf":"$sfDir","cpus":"$cpus"}""" + "\n")
    }
    spark.stop()
  }
}
