package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix construction over the `documents` table: the operations
  * that turn a deduplicated corpus into model-ready training input —
  * per-stratum budget selection (what goes into the mix) and sequence
  * packing (how it is laid out in fixed-capacity training rows).
  *
  * Both are deterministic (doc_id total order) so results are
  * engine-reproducible, and both window per-stratum, never globally: at
  * 100 TB the windows partition by lang/source into many independent
  * groups, so no stage funnels through a single sort.
  */
object TrainingMix {

  /** Balanced per-language mix: walk each language's documents in doc_id
    * order and keep them until the language's cumulative char count reaches
    * `budget` — the "equal token budget per language/domain" selection used
    * to rebalance a source-skewed corpus. A document that straddles the
    * budget boundary is kept (its exclusive prefix is still under budget),
    * so every language lands at budget ≤ total < budget + max doc size.
    *
    * Scale: one window aggregate partitioned by lang — each language sorts
    * independently; no global order. (With millions of docs per language
    * on a real cluster the same selection can be two-phase — per-partition
    * partial sums then a per-lang prefix-offset join — but the declared
    * window form lets Catalyst own that choice.)
    *
    * @return kept documents with their running `cum_chars` (inclusive).
    */
  def balancedMix(documents: DataFrame, budget: Long): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .withColumn("cum_chars", sum(col("n_chars")).over(w))
      .where(col("cum_chars") - col("n_chars") < budget)
      .select("doc_id", "lang", "source", "n_chars", "cum_chars")
  }

  /** Temperature-style language upsampling: replicate each document
    * `min(maxEpochs, ceil(largest-language-count / own-language-count))`
    * times — the replication form of sampling-temperature rebalancing
    * multilingual pipelines use so low-resource languages aren't drowned
    * by the head language.
    *
    * Scale shape: the per-language weights are one tiny aggregate
    * (broadcast back as a dimension join — the big table never shuffles),
    * and replication is a map-side `explode(sequence(...))`. Epoch counts
    * derive from exact integer counts via one double division, so the
    * output is engine-reproducible.
    *
    * @return one row per (document, epoch): doc_id, lang, epoch ∈ [1, n].
    */
  def langUpsample(documents: DataFrame, maxEpochs: Int = 4): DataFrame = {
    val counts = documents.groupBy("lang").agg(count(lit(1)).as("cnt"))
    val mx = counts.agg(max(col("cnt")).as("mx"))
    val weights = counts.crossJoin(broadcast(mx))
      .select(col("lang"),
        least(lit(maxEpochs.toLong),
          ceil(col("mx").cast("double") / col("cnt"))).as("n_epochs"))
    documents
      .join(broadcast(weights), "lang")
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1L), col("n_epochs"))).as("epoch"))
  }

  /** Sequence packing: assign documents (doc_id order within each source)
    * to fixed-capacity bins by cumulative size — a document starts in bin
    * `exclusive-prefix-sum div capacity` at offset `prefix mod capacity`.
    * This is the contiguous greedy packing a training dataloader performs
    * when concatenating documents into fixed-length sample rows; a doc that
    * straddles a boundary belongs to the bin it starts in (the loader
    * splits it there).
    *
    * Integral `div`/`pmod` keep the arithmetic exact at any corpus size
    * (no double rounding); the window partitions by source so packing
    * parallelizes across strata.
    *
    * @return (doc_id, source, n_chars, bin, bin_offset) per document.
    */
  def packSequences(documents: DataFrame, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prev = coalesce(sum(col("n_chars")).over(w), lit(0L))
    val offset = pmod(prev, lit(capacity))
    // (prev - offset) is an exact multiple of capacity, so the double
    // division is the exact integral quotient (both operands well under
    // 2^53 even at 100 TB of chars)
    val bin = ((prev - offset) / lit(capacity)).cast("long")
    documents
      .select(col("doc_id"), col("source"), col("n_chars"),
        bin.as("bin"), offset.as("bin_offset"))
  }

  /** Deterministic shard assignment + per-shard manifest — the export
    * layout of a reproducible dataset release: shard = salted-md5(doc_id)
    * mod `nShards`, so the same corpus always lands in the same shards
    * regardless of partitioning or cluster size, and the manifest (doc
    * count, char total, id range per shard) is the artifact a consumer
    * validates a download against. At 100 TB the write is
    * `partitionBy("shard")` over this assignment; the manifest aggregate
    * shuffles one narrow row per doc with map-side combine.
    */
  def shardManifest(documents: DataFrame, nShards: Int = 16,
                    salt: String = "shard:"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val shard = pmod(graft.functions.TextAnalysis.md5Prefix32(
      concat(lit(salt), col("doc_id").cast("string"))), lit(nShards.toLong))
    documents
      .groupBy(shard.as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
  }

  /** Leakage-free holdout split: assign train/heldout at the NEAR-DUP
    * CLUSTER level, not the document level. A plain per-doc salted split
    * leaks — a training document that is a near-duplicate of a heldout
    * document answers the eval for free; splitting on the salted hash of
    * the CLUSTER id sends every member of a near-dup cluster (from
    * [[Dedup.nearDupClusters]]: LSH pairs → connected components) to the
    * same side, so no near-duplicate can straddle the split.
    *
    * Deterministic and reproducible: the side depends only on (salt,
    * cluster id), never on partitioning, sampling order, or cluster size.
    * Pure map-side over the cluster-assignment frame (|docs| narrow rows —
    * on a real cluster, the persisted table every dedup consumer reads);
    * the heldout rate is `heldoutPerMille`/1000 of CLUSTERS, which for a
    * mostly-singleton corpus is ≈ the document rate.
    *
    * @param clusters output of [[Dedup.nearDupClusters]]:
    *                 (doc_id, cluster, is_canonical)
    * @return (doc_id, cluster, split) with split ∈ {train, heldout}
    */
  def leakageFreeSplit(clusters: DataFrame, heldoutPerMille: Int = 100,
                       salt: String = "split:v1:"): DataFrame = {
    require(heldoutPerMille >= 0 && heldoutPerMille <= 1000,
      "heldoutPerMille must be within [0, 1000]")
    val bucket = pmod(graft.functions.TextAnalysis.md5Prefix32(
      concat(lit(salt), col("cluster").cast("string"))), lit(1000L))
    clusters.select(col("doc_id"), col("cluster"),
      when(bucket < heldoutPerMille, "heldout").otherwise("train").as("split"))
  }

  /** Deterministic stratified sample: the `k` documents per source with the
    * smallest salted hash — a reproducible "random" holdout (same salt →
    * same sample on any engine, any partitioning, any day; change the salt
    * to draw a fresh one). The per-stratum top-k runs on the ExactTopK
    * map-side aggregate, so each mapper ships at most k entries per source
    * into the shuffle — O(sources·k), never O(docs), and no per-source
    * sort window.
    *
    * @return (source, doc_id, sample_hash) — the selected docs only
    */
  def stratifiedSample(documents: DataFrame, k: Int = 5,
                       salt: String = "sample:"): DataFrame = {
    val hash = graft.functions.TextAnalysis.md5Prefix32(
      concat(lit(salt), col("doc_id").cast("string")))
    // ExactTopK keeps the HIGHEST scores (ties → smallest payload), so the
    // negated hash selects the k smallest hashes, doc_id-ascending on ties
    val topk = org.apache.spark.sql.graft.shim.column(
      org.apache.spark.sql.graft.ExactTopK(
        org.apache.spark.sql.graft.shim.expression(-hash.cast("double")),
        org.apache.spark.sql.graft.shim.expression(col("doc_id")),
        k).toAggregateExpression())
    documents
      .groupBy(col("source"))
      .agg(topk.as("tk"))
      .select(col("source"), explode(col("tk")).as("e"))
      .select(col("source"), col("e.payload").as("doc_id"),
        (-col("e.score")).cast("long").as("sample_hash"))
  }

  /** Length-bucketed batch assignment with padding-waste accounting — the
    * training-throughput report behind "sort by length before batching":
    * a batch pads every member to its longest sequence, so mixing a
    * 10-token doc into a 500-token batch burns 490 pad slots. Documents
    * are banded by token count (`band`-wide buckets), each bucket is
    * walked in a salted-hash order (deterministic but uncorrelated with
    * content) and cut into `batchSize`-doc batches; per batch the padded
    * size, the useful tokens, and the waste are exact integers.
    *
    * The window partitions by bucket — length bands, a bounded small set —
    * so the registered exact form funnels each band through one partition
    * for the global row_number. That is the oracle-reproducible contract;
    * at 100 TB swap the in-bucket row_number for per-shuffle-partition
    * batch counters offset by partition (zipWithIndex shape) — batch
    * MEMBERSHIP changes, the waste statistics' distribution does not.
    */
  def lengthBucketBatches(documents: DataFrame, band: Int = 64,
                          batchSize: Int = 16): DataFrame = {
    require(band > 0 && batchSize > 0, "need positive band and batchSize")
    val toks = documents.select(col("doc_id"),
      size(graft.functions.TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("bucket_id", expr(s"(n_tok - 1) div $band"))
      .withColumn("ord", graft.functions.TextAnalysis.md5Prefix32(
        concat(lit("batch:"), col("doc_id").cast("string"))))
    val w = Window.partitionBy("bucket_id").orderBy(col("ord"), col("doc_id"))
    toks.withColumn("rn", row_number().over(w))
      .withColumn("batch_id", expr(s"CAST((rn - 1) div $batchSize AS BIGINT)"))
      .groupBy(col("bucket_id"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tok")).as("max_tokens"),
        sum(col("n_tok")).as("sum_tokens"))
      .select(col("bucket_id"), col("batch_id"), col("n_docs"),
        col("max_tokens"), col("sum_tokens"),
        (col("n_docs") * col("max_tokens") - col("sum_tokens")).as("pad_waste"),
        (col("sum_tokens").cast("double")
          / (col("n_docs") * col("max_tokens")).cast("double")).as("efficiency"))
  }

  /** Nucleus (top-p) budget selection per source: walk each source's
    * documents best-quality-first and keep them while the cumulative
    * character count stays within `pNum/pDen` of the source's total —
    * the "keep the best half of every source" culling step between
    * quality scoring and mix construction. A source's output is its
    * quality nucleus: the smallest high-quality prefix carrying the
    * budgeted share of its bytes.
    *
    * Determinism: the quality score is the single expression tree shared
    * with q34/q80 (bit-identical doubles on both engines), ties break on
    * doc_id, and the budget predicate `pDen·cum ≤ pNum·total` is exact
    * integer arithmetic — no floating budget boundary to disagree on.
    *
    * Scale shape: one per-stratum window (partitioned by source, never
    * global) for the running sum, and the per-source totals come from
    * one tiny aggregate broadcast back — the document table shuffles
    * once, on source, which at 100 TB is the partitioning the mix
    * pipeline already keeps.
    *
    * @return (doc_id, source, n_chars, quality_score, cum_chars) for
    *         kept documents
    */
  def nucleusSelect(documents: DataFrame, pNum: Int = 1, pDen: Int = 2): DataFrame = {
    require(pNum > 0 && pDen >= pNum, "need 0 < pNum/pDen <= 1")
    val scored = documents.select(col("doc_id"), col("source"), col("n_chars"),
      graft.functions.TextAnalysis.qualityScoreExpr.as("quality_score"))
    val w = Window.partitionBy("source")
      .orderBy(col("quality_score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = documents.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("total_chars"))
    scored
      .withColumn("cum_chars", sum(col("n_chars")).over(w))
      .join(broadcast(totals), "source")
      .where(col("cum_chars") * pDen <= col("total_chars") * pNum)
      .select("doc_id", "source", "n_chars", "quality_score", "cum_chars")
  }

  /** Context-window chunking: split every document into overlapping
    * `k`-token windows advancing by `stride` tokens (`k - stride` token
    * overlap, the standard long-document training prep — [[packSequences]]
    * lays short docs into bins; this cuts long docs down to size first).
    * The final chunk keeps the tail (may be shorter than `k`); documents
    * of ≤ `k` tokens yield exactly one chunk.
    *
    * All map-side: a per-row transform + posexplode, no shuffle at all —
    * chunk counts, boundaries, and hashes derive from the token array
    * alone. Chunk text is hashed to md5-prefix32 (cross-engine canonical)
    * rather than carried, keeping the graded output narrow; a production
    * sink would keep the chunk string column instead.
    *
    * @return (doc_id, chunk_id, n_tokens, chunk_hash)
    */
  def chunkDocuments(documents: DataFrame, k: Int = 64, stride: Int = 48): DataFrame = {
    require(k > 0 && stride > 0 && stride <= k, "need 0 < stride <= k")
    val t = graft.functions.TextAnalysis.tokens(col("text"))
    val toks = documents
      .select(col("doc_id"), t.as("t"))
      .transform(graft.barrier) // barrier: the chunk lambda must read an attribute
    val nChunks = when(size(col("t")) <= k, lit(1))
      .otherwise(ceil((size(col("t")) - k).cast("double") / stride).cast("int") + 1)
    val chunks = transform(sequence(lit(0), nChunks - 1),
      c => array_join(slice(col("t"), c * stride + 1, lit(k)), " "))
    toks
      .select(col("doc_id"), size(col("t")).as("n_tok_doc"),
        posexplode(chunks).as(Seq("chunk_id", "chunk")))
      .select(col("doc_id"), col("chunk_id"),
        least(lit(k), col("n_tok_doc") - col("chunk_id") * stride).as("n_tokens"),
        graft.functions.TextAnalysis.md5Prefix32(col("chunk")).as("chunk_hash"))
  }

  /** Contrastive pair mining (q189) — the dataset builder behind
    * embedding-model training (SimCSE/contriever-style): for every
    * chunk with a successor, emit (anchor, positive = the next
    * overlapping chunk of the SAME doc, negatives = hash-drawn chunks
    * of OTHER docs). Positives share stride overlap (semantically
    * near); negatives are the q148 idiom pointed at documents — drawn
    * by md5 mod doc-space, collision-with-self dropped, resolved to
    * each victim doc's chunk 0 so every draw lands on a real chunk.
    *
    * Scale shape: one [[chunkDocuments]] pass (barriered — anchors,
    * positives, and the negative lookup all read it), the positive
    * pairing a keyed self-join on (doc, chunk+1), the negative
    * resolution one keyed join against the |docs|-row chunk-0 table.
    * Draw volume is anchors·nNeg, never docs×docs.
    *
    * @return (doc_id, chunk_id, anchor_hash, pos_chunk_id, pos_hash,
    *         draw, neg_doc_id, neg_hash)
    */
  def contrastivePairs(documents: DataFrame, nNeg: Int = 2): DataFrame = {
    val ch = chunkDocuments(documents).transform(graft.barrier)
    val anchors = ch.as("a").join(
        ch.select(col("doc_id"), col("chunk_id").as("pos_chunk_id"),
          col("chunk_hash").as("pos_hash")).as("p"),
        col("a.doc_id") === col("p.doc_id") &&
          col("a.chunk_id") + 1 === col("pos_chunk_id"))
      .select(col("a.doc_id").as("doc_id"), col("a.chunk_id").as("chunk_id"),
        col("a.chunk_hash").as("anchor_hash"), col("pos_chunk_id"),
        col("pos_hash"))
    val maxDoc = documents.agg(max(col("doc_id")).as("max_doc"))
    val zeroChunks = ch.where(col("chunk_id") === 0)
      .select(col("doc_id").as("neg_doc_id"), col("chunk_hash").as("neg_hash"))
    anchors.crossJoin(broadcast(maxDoc))
      .select(col("doc_id"), col("chunk_id"), col("anchor_hash"),
        col("pos_chunk_id"), col("pos_hash"),
        explode(sequence(lit(1L), lit(nNeg.toLong))).as("draw"),
        col("max_doc"))
      .withColumn("neg_doc_id",
        graft.functions.TextAnalysis.md5Prefix32(
          concat(lit("ctr:"), col("doc_id").cast("string"), lit(":"),
            col("chunk_id").cast("string"), lit(":"),
            col("draw").cast("string"))) % (col("max_doc") + 1))
      .where(col("neg_doc_id") =!= col("doc_id"))
      .join(zeroChunks, "neg_doc_id")
      .select(col("doc_id"), col("chunk_id"), col("anchor_hash"),
        col("pos_chunk_id"), col("pos_hash"), col("draw"),
        col("neg_doc_id"), col("neg_hash"))
  }

  /** PPS (probability-proportional-to-size) sample + Horvitz–Thompson
    * total estimate (q152) — the weighted ingest-sampling primitive: a
    * document of `n_chars` is kept with probability n_chars/max_chars
    * (bigger docs more likely), decided by a deterministic md5 draw, and
    * the token total of the WHOLE corpus is estimated from the sample
    * alone by inverse-probability weighting. This is how a 100 TB ingest
    * audits corpus-level statistics from a size-biased sample it can
    * actually afford to scan — and the graded row carries the estimate
    * NEXT TO the exact total, so the error is the deliverable (the q102
    * sketch-grading pattern).
    *
    * Exactness: inclusion is the pure-integer compare h·max_chars <
    * n_chars·2³², and each kept doc's HT contribution is the integer
    * ⌊n_tokens·max_chars·10⁶ / n_chars⌋ — summed as BIGINTs in any
    * order. One final cast pair turns the scaled sum into the reported
    * double. The per-term floor biases the estimate down by < 1 micro-
    * token per kept doc — bounded, deterministic, identical on both
    * engines.
    *
    * @return one row: (n_docs, n_kept, exact_tokens, est_tokens_micro,
    *         est_tokens, rel_err)
    */
  def ppsSample(documents: DataFrame): DataFrame = {
    val t = graft.functions.TextAnalysis.tokens(col("text"))
    val base = documents
      .select(col("doc_id"), col("n_chars"), size(t).cast("long").as("n_tok"))
      .transform(graft.barrier) // feeds the max aggregate and the sample
    val mx = base.agg(max(col("n_chars")).as("max_chars"))
    val h = graft.functions.TextAnalysis.md5Prefix32(
      concat(lit("pps:"), col("doc_id").cast("string")))
    base
      .crossJoin(broadcast(mx))
      .select(col("n_tok"), col("n_chars"), col("max_chars"),
        (h * col("max_chars") < col("n_chars") * lit(4294967296L)).as("kept"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        sum(col("n_tok")).as("exact_tokens"),
        coalesce(sum(when(col("kept"),
          expr("n_tok * max_chars * 1000000 div n_chars"))), lit(0L))
          .as("est_tokens_micro"))
      .select(col("n_docs"), col("n_kept"), col("exact_tokens"),
        col("est_tokens_micro"),
        (col("est_tokens_micro").cast("double") / 1e6).as("est_tokens"),
        ((col("est_tokens_micro").cast("double") / 1e6
          - col("exact_tokens").cast("double"))
          / col("exact_tokens").cast("double")).as("rel_err"))
  }

  /** Stratified k-fold assignment + balance report: every document lands
    * in fold `md5("fold:" doc_id) mod k`, and the report grades how even
    * the folds came out within each language stratum — the
    * cross-validation splitter plus the sanity check that hash
    * assignment didn't skew any (stratum, fold) cell.
    *
    * The assignment is a pure map (reproducible on any engine, stable
    * under corpus growth for existing ids — the property random shuffles
    * lack); the report is one (lang, fold) count aggregate plus a
    * |langs|·k-row window for the stratum totals. dev_ppm is the exact
    * integer ⌊|k·n_fold − n_stratum|·10⁶ / n_stratum⌋ — deviation from
    * the ideal equal split in parts-per-million.
    *
    * @return (lang, fold, n_docs, n_stratum, dev_ppm)
    */
  def kfoldAssignment(documents: DataFrame, k: Int = 5): DataFrame = {
    val fold = graft.functions.TextAnalysis
      .md5Prefix32(concat(lit("fold:"), col("doc_id"))) % k
    val per = documents.select(col("lang"), fold.as("fold"))
      .groupBy("lang", "fold").agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("lang")
    per
      .withColumn("n_stratum", sum(col("n_docs")).over(w))
      .withColumn("dev_ppm",
        expr(s"abs($k * n_docs - n_stratum) * 1000000 div n_stratum"))
      .select(col("lang"), col("fold"), col("n_docs"), col("n_stratum"),
        col("dev_ppm"))
  }

  /** Shard shuffle-quality audit (q222) — is every training shard a
    * faithful miniature of the corpus? Per shard, the exact total-
    * variation distance between the shard's source distribution and the
    * corpus's (the q149 t-closeness integer posture applied to the q79
    * shard hash): tvd_num = Σ_sources |c·N − C·n_sh| with the ABSENT
    * sources' mass added in closed form ((N − ΣC_present)·n_sh — a
    * missing source contributes its full corpus share), and the graded
    * ratio one ppm floor of tvd_num / (2·n_sh·N). A bad shuffle (shards
    * correlated with source) shows up as outlier TVD rows.
    *
    * Scale shape: one map-combined (shard, source) count, source totals
    * aggregated FROM it and broadcast back, a per-shard window over
    * ≤ |shards|·|sources| rows, one final shard aggregate.
    *
    * @return (shard, n_docs, tvd_num, tvd_ppm)
    */
  def shardBalance(documents: DataFrame, nShards: Int = 16): DataFrame = {
    val shard = pmod(graft.functions.TextAnalysis.md5Prefix32(
      concat(lit("shard:"), col("doc_id").cast("string"))), lit(nShards.toLong))
    val sc = documents.groupBy(shard.as("shard"), col("source"))
      .agg(count(lit(1)).as("c"))
      .transform(graft.barrier) // source totals + the scoring pass
    val srcTot = sc.groupBy(col("source")).agg(sum(col("c")).as("ctot"))
    val tot = srcTot.agg(sum(col("ctot")).as("n_total"))
    val w = Window.partitionBy("shard")
    sc.join(broadcast(srcTot), "source")
      .crossJoin(broadcast(tot))
      .withColumn("n_sh", sum(col("c")).over(w))
      .groupBy(col("shard"))
      .agg(max(col("n_sh")).as("n_docs"), max(col("n_total")).as("nt"),
        sum(abs(col("c") * col("n_total") - col("ctot") * col("n_sh")))
          .as("sum_abs"),
        sum(col("ctot")).as("c_present"))
      .select(col("shard"), col("n_docs"),
        (col("sum_abs") + (col("nt") - col("c_present")) * col("n_docs"))
          .as("tvd_num"), col("nt"))
      .select(col("shard"), col("n_docs"), col("tvd_num"),
        expr("tvd_num * 1000000 div (2 * n_docs * nt)").as("tvd_ppm"))
  }

  /** Group-aware k-fold assignment (q272) — sklearn's GroupKFold for a
    * rating corpus: every row follows its USER's md5 fold, so no user
    * ever straddles folds (the cross-validation leakage a row-level
    * split commits — a user's taste in train and test is memorization,
    * not generalization; [[leakageFreeSplit]] is the 2-way cluster form
    * of the same principle). The leakage guarantee holds by
    * construction AND is graded: Σ per-fold distinct users must equal
    * the global distinct-user count — `leak_free` comes back true only
    * if no user counted twice.
    *
    * Scale shape: fold is map-side hash arithmetic on the row; the
    * report is one user-keyed aggregate into a k-row histogram plus a
    * k-row window for the cross-fold proof (metadata-bounded).
    *
    * @return per fold: (fold, n_rows, n_users, n_items,
    *         n_users_all_folds, n_users_global, leak_free)
    */
  def groupKFold(ratings: DataFrame, k: Int = 5): DataFrame = {
    val fold = pmod(graft.functions.TextAnalysis.md5Prefix32(
      concat(lit("fold:"), col("userId").cast("string"))), lit(k.toLong))
    val perFold = ratings.select(col("userId"), col("productId"),
        fold.as("fold"))
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("userId")).as("n_users"),
        count_distinct(col("productId")).as("n_items"))
    val globalUsers = ratings.agg(
      count_distinct(col("userId")).as("n_users_global"))
    val w = Window.partitionBy() // k rows — the metadata window
    perFold.crossJoin(broadcast(globalUsers))
      .withColumn("n_users_all_folds", sum(col("n_users")).over(w))
      .select(col("fold"), col("n_rows"), col("n_users"), col("n_items"),
        col("n_users_all_folds"), col("n_users_global"),
        (col("n_users_all_folds") === col("n_users_global")).as("leak_free"))
  }
}
