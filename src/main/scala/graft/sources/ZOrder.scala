package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout: interleave the bits of two range-
  * normalized columns so that sorting by ONE value clusters the data in
  * BOTH dimensions at once. This is the multi-dimensional data-skipping
  * layout (Delta/Iceberg `OPTIMIZE ZORDER BY`, here from first
  * principles): per-file or per-bucket min/max stats become tight
  * RECTANGLES, so a reader pruning on either column — or both — skips
  * most of the data, where a linear sort clusters only its leading
  * column and leaves the second dimension's span at ~100% per file.
  *
  * Everything is exact integer bit arithmetic (shifts, masks, one
  * integer division per dimension for the grid scaling) — deterministic
  * across engines, codegen-friendly, no UDF.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to the even bit positions of a 32-bit
    * value (the standard mask-doubling ladder: 8-4-2-1).
    */
  private def spread16(v: Column): Column = {
    val a = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of two 16-bit grid cells: x on even bits, y on odd.
    * Precondition: 0 ≤ x, y < 2¹⁶ (use [[zOrderProfile]]'s range scaling
    * to map arbitrary key domains onto the grid).
    */
  def zValue(x: Column, y: Column): Column =
    spread16(x.cast("long")).bitwiseOR(shiftleft(spread16(y.cast("long")), 1))

  /** The z-layout profile that proves the skipping story: range-normalize
    * both key columns to the 2¹⁶ grid (one tiny min/max aggregate,
    * broadcast back — the detail side never reshuffles for it),
    * interleave, split the curve into `buckets` equal z-ranges, and
    * report each bucket's row count and min/max envelope on BOTH
    * dimensions. Tight rectangles in the output = effective pruning for
    * predicates on either column; this aggregate is exactly the stats a
    * file reader consults, so the report is the layout's skipping power.
    *
    * Grid scaling is integer floor division — exact on both engines; a
    * constant column degenerates to cell 0.
    *
    * @return (bucket, n, min_x, max_x, min_y, max_y)
    */
  def zOrderProfile(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets > 0 && (1L << 32) % buckets == 0,
      "buckets must divide 2^32 so z-ranges are equal-width")
    val mm = df.agg(
      min(col(xCol)).as("xmin"), max(col(xCol)).as("xmax"),
      min(col(yCol)).as("ymin"), max(col(yCol)).as("ymax"))
    df.select(col(xCol).as("x"), col(yCol).as("y"))
      .join(broadcast(mm))
      .withColumn("x16", when(col("xmax") > col("xmin"),
        expr("((x - xmin) * 65535) div (xmax - xmin)")).otherwise(lit(0L)))
      .withColumn("y16", when(col("ymax") > col("ymin"),
        expr("((y - ymin) * 65535) div (ymax - ymin)")).otherwise(lit(0L)))
      .withColumn("z", zValue(col("x16"), col("y16")))
      .groupBy(expr(s"z div ${(1L << 32) / buckets}").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
  }

  /** Write `df` clustered by the z-curve: range-partition on the Morton
    * code (so files tile the curve) and sort within each partition. The
    * parquet footer min/max for BOTH columns then form the tight
    * rectangles [[zOrderProfile]] reports, and any reader that consults
    * row-group stats prunes on either dimension. The z column itself is
    * dropped — it is a layout device, not data.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      files: Int = 16): Unit = {
    val mm = df.agg(
      min(col(xCol)).as("xmin"), max(col(xCol)).as("xmax"),
      min(col(yCol)).as("ymin"), max(col(yCol)).as("ymax"))
    df.join(broadcast(mm))
      .withColumn("__x16", when(col("xmax") > col("xmin"),
        expr(s"(($xCol - xmin) * 65535) div (xmax - xmin)")).otherwise(lit(0L)))
      .withColumn("__y16", when(col("ymax") > col("ymin"),
        expr(s"(($yCol - ymin) * 65535) div (ymax - ymin)")).otherwise(lit(0L)))
      .withColumn("__z", zValue(col("__x16"), col("__y16")))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__x16", "__y16", "__z", "xmin", "xmax", "ymin", "ymax")
      .write.mode("overwrite").parquet(path)
  }

  /** Zone-map skipping report: how many 4096-row "files" a predicate on
    * the ship-date key must read under a sort-clustered layout vs a
    * hash-scattered one. Each layout assigns rows to files, files keep
    * only (min, max, count) — exactly the parquet row-group stats a
    * reader consults — and every predicate interval [lo, hi) counts the
    * files whose envelope overlaps it. `read_amplification` =
    * rows-in-read-files / rows-actually-matching: ~1 for the sorted
    * layout, ~n_files for the hashed one; the gap IS the argument for
    * sort-ordered ingestion at 100 TB, quantified from stats alone.
    *
    * The sorted layout's global rank is computed WITHOUT a single-
    * partition window (which would serialize the whole table through one
    * task at any scale): per-day counts prefix-summed into day offsets —
    * a metadata-bounded window over |distinct shipdates| rows, the
    * q159-approved pattern — broadcast back, plus a day-PARTITIONED
    * row_number for the within-day rank. offset(k) + local_rank is
    * exactly the global (k, l_orderkey, l_linenumber) rank, so the
    * assignment — and the oracle that reproduces it with a plain global
    * row_number — is unchanged. The file-stats aggregate is one narrow
    * shuffle; the 3-row predicate table broadcasts.
    */
  def zoneMapSkipping(lineitem: DataFrame,
      preds: Seq[(String, Long, Long)] = Seq(
        ("month_1996_06", 9648L, 9678L),
        ("year_1997", 9862L, 10227L),
        ("tail_2001", 11474L, 11688L)),
      rowsPerFile: Int = 4096): DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    val base = lineitem.select(col("l_orderkey"), col("l_linenumber"),
      expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000").as("k"))
    val tot = base.agg(
      ((count(lit(1)) + (rowsPerFile - 1)) / rowsPerFile).cast("long").as("n_files"))
    val offsets = base.groupBy(col("k")).agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(
        sum(col("c")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("k")).rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("k"), col("off"))
    val sorted = base.join(broadcast(offsets), "k")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))))
      .select(lit("sorted").as("layout"),
        expr(s"(off + rn - 1) div $rowsPerFile").as("file_id"), col("k"))
    // pseudorandom file placement from the multiply–xorshift finalizer
    // over the unique (orderkey, linenumber) packing — integer-op cost
    // where the md5-over-string form paid a digest + two string builds
    // per row (measured as the dominant cost of this query at sf1.0);
    // the DuckDB twin spells the same five exact-in-signed-64 steps
    val hashed = base.crossJoin(broadcast(tot))
      .select(lit("hashed").as("layout"),
        (org.apache.spark.sql.graft.shim.column(
          org.apache.spark.sql.graft.GramMix32(
            org.apache.spark.sql.graft.shim.expression(
              expr("l_orderkey * 256L + l_linenumber"))))
          % col("n_files")).as("file_id"),
        col("k"))
    val stats = sorted.union(hashed)
      .groupBy(col("layout"), col("file_id"))
      .agg(min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        count(lit(1)).as("n_in_file"))
    val predDf = preds.toDF("pred", "lo", "hi")
    val exact = base.crossJoin(broadcast(predDf))
      .where(col("k") >= col("lo") && col("k") < col("hi"))
      .groupBy("pred").agg(count(lit(1)).as("exact_rows"))
    val hit = col("min_k") < col("hi") && col("max_k") >= col("lo")
    stats.crossJoin(broadcast(predDf))
      .groupBy(col("layout"), col("pred"))
      .agg(count(lit(1)).as("n_files"),
        coalesce(sum(when(hit, 1L)), lit(0L)).as("files_read"),
        coalesce(sum(when(hit, col("n_in_file"))), lit(0L)).as("rows_scanned"))
      .join(broadcast(exact), Seq("pred"))
      .select(col("layout"), col("pred"), col("n_files"), col("files_read"),
        col("rows_scanned"), col("exact_rows"),
        (col("rows_scanned").cast("double") / col("exact_rows").cast("double"))
          .as("read_amplification"))
  }

  /** Consistent-hashing reshard report (q187) — the data-movement
    * question behind every scale-out: assign documents to shards via a
    * hash ring (16 virtual nodes per shard), then measure how much data
    * MOVES when the fleet grows from `nodes` to `nodes+1`. The whole
    * point of consistent hashing is that only ~1/(n+1) of keys move
    * (vs ~n/(n+1) under mod-hashing); the report carries the observed
    * fraction next to both theoretical baselines, so the ring
    * configuration is graded the way q83 grades ANN recall.
    *
    * Mechanics: ring position of vnode (s, v) and of each doc are the
    * same md5₃₂; a doc belongs to the vnode with the smallest position
    * ≥ its hash (wrapping to the global min) — computed as one
    * conditional min over the BROADCAST ring (nodes·16 rows), no sort,
    * no window. All integer; the two assignments and the movement flag
    * are exact on both engines.
    *
    * @return one row: (n_docs, moved, moved_ppm, ch_theory_ppm,
    *         mod_moved, mod_moved_ppm)
    */
  def reshardReport(documents: DataFrame, nodes: Int = 4,
      vnodes: Int = 16): DataFrame = {
    def ring(n: Int) = (0 until n).flatMap(s => (0 until vnodes).map(v => (s, v)))
    val spark = documents.sparkSession
    import spark.implicits._
    val docs = documents.select(col("doc_id"),
        graft.functions.TextAnalysis.md5Prefix32(
          concat(lit("doc:"), col("doc_id").cast("string"))).as("h"))
      .transform(graft.barrier)
    // flatten ring to (shard, pos) rows and pick, per doc, the owner =
    // shard of min pos >= h, else shard of the global min pos (wrap).
    // argmin is encoded as one BIGINT key pos·64 + shard so both engines
    // break pos ties identically with a plain integer min
    def owners(n: Int, outCol: String) = {
      val r = ring(n).toDF("shard", "vnode")
        .select(col("shard").cast("long").as("shard"),
          graft.functions.TextAnalysis.md5Prefix32(
            concat(lit("node:"), col("shard").cast("string"), lit(":"),
              col("vnode").cast("string"))).as("pos"))
        .select(col("shard"), (col("pos") * 64 + col("shard")).as("key"),
          col("pos"))
      docs.crossJoin(broadcast(r))
        .groupBy("doc_id", "h")
        .agg(
          min(when(col("pos") >= col("h"), col("key"))).as("succ"),
          min(col("key")).as("wrap"))
        .select(col("doc_id"), col("h"),
          (coalesce(col("succ"), col("wrap")) % 64).as(outCol))
    }
    val before = owners(nodes, "shard_before")
    val after = owners(nodes + 1, "shard_after")
    before.join(after, Seq("doc_id", "h"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("shard_before") =!= col("shard_after"), 1L).otherwise(0L))
          .as("moved"),
        sum(when(col("h") % nodes =!= col("h") % (nodes + 1), 1L).otherwise(0L))
          .as("mod_moved"))
      .select(col("n_docs"),
        col("moved"), expr("moved * 1000000 div n_docs").as("moved_ppm"),
        lit(1000000L / (nodes + 1)).as("ch_theory_ppm"),
        col("mod_moved"),
        expr("mod_moved * 1000000 div n_docs").as("mod_moved_ppm"))
  }

  /** Compaction planner (q162) — the small-files problem's answer:
    * collapse per-(source, hash-bucket) segments into `bins` target
    * files by running-total assignment — segments in size-descending
    * order, bin = ⌈cumsum / target⌉−1 with target = ⌈total/bins⌉ — and
    * report each planned file's fill against the target. This is the
    * bin-pack an OPTIMIZE/compaction job runs before rewriting; the
    * fill report is its skew gate (the q156 pattern applied to files
    * instead of ranges).
    *
    * Scale note — why the global ordered window is FINE here, when the
    * same shape was a bug in q121's first draft: the window runs over
    * SEGMENT METADATA (one row per (source, bucket) after the
    * aggregate — |sources|·`buckets` rows, not corpus rows). File
    * manifests are driver-sized by construction; the corpus-wide work
    * is only the one map-combined size aggregate.
    *
    * Determinism: sizes, cumulative sums, targets and fills are exact
    * BIGINT arithmetic; the pack order (seg_bytes DESC, source, bucket)
    * is a total order.
    *
    * @return per planned file: (bin, n_segments, bin_bytes, target,
    *         fill_ppm = bin_bytes·10⁶ div target)
    */
  def compactionPlan(documents: DataFrame, buckets: Int = 64,
      bins: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val segs = documents
      .groupBy(col("source"), (col("doc_id") % buckets).as("bucket"))
      .agg(sum(col("n_chars")).as("seg_bytes"))
      .transform(graft.barrier) // read by the total and the pack
    val tot = segs.agg(sum(col("seg_bytes")).as("total"))
    // unpartitioned packing window over |sources| x `buckets` segment rows
    // (GlobalWindowSpec-pinned) — segment metadata, never documents
    val w = Window.orderBy(col("seg_bytes").desc, col("source"), col("bucket"))
    segs.crossJoin(broadcast(tot))
      .withColumn("target", expr(s"(total + ${bins - 1}) div $bins"))
      .withColumn("cum", sum(col("seg_bytes")).over(w))
      .withColumn("bin", expr("(cum - 1) div target"))
      .groupBy(col("bin"), col("target"))
      .agg(count(lit(1)).as("n_segments"), sum(col("seg_bytes")).as("bin_bytes"))
      .select(col("bin"), col("n_segments"), col("bin_bytes"), col("target"),
        expr("bin_bytes * 1000000 div target").as("fill_ppm"))
  }
}
