package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{BloomPrune, Corpus, Dedup, Reco, Relational, Similarity, Sketches, Skew, TimeWindows, TrainingMix}
import graft.plans.LabelPropagation
import graft.sources.{Bucketing, Multimodal}
import graft.streaming.RealTime

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named entry in
  * [[queries]]; every SQL-expressible one has matching ANSI SQL in
  * [[oracleSql]] (run by the driver in DuckDB over the same parquet tables).
  * Column names and types are kept identical on both sides — the driver
  * hash-compares values after sorting columns by name.
  */

import graft.EntryHelpers._

/** Registry: training-data pipeline / layout / multimodal queries — one `queries` entry and one DuckDB
  * `oracles` twin per graded query. Composed into SparkEntry (driver
  * contract); keys must stay globally unique across registries
  * (spec-asserted in EntrySpec).
  */
private[graft] object PipelineRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Skew.saltedEquiJoin under the grade: output is provably identical to
    // the plain equi-join (salting only changes partitioning, so the
    // plain-join oracle applies verbatim)
    "q51_salted_join" -> ((s, dir) => {
      val big = Tables.orders(s, dir)
        .select(col("o_custkey").as("custkey"), col("o_totalprice"))
      val small = Tables.customer(s, dir)
        .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
      Skew.saltedEquiJoin(big, small, "custkey", salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
    }),
    // Bucketed-table join under the grade: both sides pre-shuffled on the
    // bucket key at write time, so the join AND the per-customer aggregate
    // run exchange-free (plan asserted in BucketingSpec); the aggregate
    // groups on the bucket key only (c_name via max) to keep the bucketed
    // HashPartitioning satisfying the aggregate's distribution.
    "q52_bucketed_join" -> ((s, dir) => cached(s, dir, "q52") {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val ob = s"orders_bkt$tag"; val cb = s"cust_bkt$tag"
      Bucketing.writeBucketed(
        Tables.orders(s, dir).select(col("o_custkey").as("custkey"), col("o_totalprice")),
        ob, "custkey", 8)
      Bucketing.writeBucketed(
        Tables.customer(s, dir).select(col("c_custkey").as("custkey"), col("c_name")),
        cb, "custkey", 8)
      Bucketing.bucketedJoin(s, ob, cb, "custkey")
        .groupBy(col("custkey"))
        .agg(max(col("c_name")).as("c_name"),
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("spend"))
    }),
    // Bloom-filter join pruning under the grade: the probe side is filtered
    // by a bitmap over the build side's keys before the exchange; false
    // positives die in the exact join, so the plain-join oracle applies
    // verbatim (same contract style as q51).
    "q58_bloom_prune_join" -> ((s, dir) => {
      val urgent = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      BloomPrune.bloomPruneJoin(
        Tables.lineitem(s, dir).select("l_orderkey", "l_quantity"),
        urgent, "l_orderkey", "o_orderkey")
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
    }),
    "q62_balanced_mix" -> ((s, dir) =>
      TrainingMix.balancedMix(Tables.documents(s, dir), 15000L)),
    // contiguous greedy packing into 4096-char bins per source
    "q63_pack_sequences" -> ((s, dir) =>
      TrainingMix.packSequences(Tables.documents(s, dir), 4096L)),
    // temperature-style replication: low-resource langs get extra epochs
    "q66_lang_upsample" -> ((s, dir) =>
      TrainingMix.langUpsample(Tables.documents(s, dir))),
    // overlapping 64-token context windows, stride 48 (long-doc prep)
    "q74_chunking" -> ((s, dir) =>
      TrainingMix.chunkDocuments(Tables.documents(s, dir))),
    // length-banded batches + exact padding-waste accounting
    "q120_batch_padding" -> ((s, dir) =>
      TrainingMix.lengthBucketBatches(Tables.documents(s, dir))),
    // reproducible salted-hash holdout: 5 docs per source, ExactTopK
    "q75_stratified_sample" -> ((s, dir) =>
      TrainingMix.stratifiedSample(Tables.documents(s, dir))),
    // reproducible export layout: salted-hash shards + release manifest
    "q79_shard_manifest" -> ((s, dir) =>
      TrainingMix.shardManifest(Tables.documents(s, dir))),
    // compaction bin-packing over segment metadata: size-desc running
    // total into ceil(total/8) targets, fill report per planned file
    "q162_compaction_plan" -> ((s, dir) =>
      graft.sources.ZOrder.compactionPlan(Tables.documents(s, dir))),
    // consistent-hash ring reshard 4 -> 5 shards: observed movement vs
    // the 1/(n+1) theory and the mod-hash disaster baseline
    "q187_reshard_report" -> ((s, dir) =>
      graft.sources.ZOrder.reshardReport(Tables.documents(s, dir))),
    // contrastive pair mining: adjacent-chunk positives + hash-drawn
    // cross-doc negatives (the embedding-training dataset builder)
    "q189_contrastive_pairs" -> ((s, dir) =>
      TrainingMix.contrastivePairs(Tables.documents(s, dir))),
    // stratified k-fold assignment by hash + per-(stratum, fold) balance
    // report in exact ppm deviation from the ideal split
    "q199_kfold_assign" -> ((s, dir) =>
      TrainingMix.kfoldAssignment(Tables.documents(s, dir))),
    // average-hash over REAL P2 pixels: cross-multiplied mean bits, the
    // global-structure image signature beside q210's gradients
    "q246_image_ahash" -> ((s, dir) =>
      graft.sources.Multimodal.imageAhash(
        graft.sources.Multimodal.synthesizePgm(Tables.documents(s, dir)))),
    // group-aware k-fold: rows follow their user's md5 fold, with the
    // cross-fold distinct-user identity graded as leak_free
    "q272_group_kfold" -> ((s, dir) =>
      TrainingMix.groupKFold(EntryHelpers.ratingsDf(s, dir))),
    // per-shard source-distribution TVD vs the corpus — the
    // shuffle-quality audit over the q79 shard hash
    "q222_shard_balance" -> ((s, dir) =>
      TrainingMix.shardBalance(Tables.documents(s, dir))),
    // PPS sample + Horvitz-Thompson corpus-total estimate: pure-integer
    // md5 inclusion draws, graded estimate-vs-exact (the q102 pattern)
    "q152_pps_sample" -> ((s, dir) =>
      TrainingMix.ppsSample(Tables.documents(s, dir))),
    // z-order layout profile: Morton-bucket rectangles over
    // (l_partkey, l_suppkey) — per-bucket min/max = the skipping stats
    "q105_zorder_profile" -> ((s, dir) =>
      graft.sources.ZOrder.zOrderProfile(
        Tables.lineitem(s, dir), "l_partkey", "l_suppkey")),
    // zone-map skipping report: files read under sorted vs hashed layout
    // for fixed shipdate predicates, from (min,max,count) stats alone
    "q124_zonemap_skipping" -> ((s, dir) =>
      graft.sources.ZOrder.zoneMapSkipping(Tables.lineitem(s, dir))),
    // per-source quality nucleus: best-first cumulative keep within an
    // exact integer byte budget (half of each source's total)
    "q126_nucleus_select" -> ((s, dir) =>
      TrainingMix.nucleusSelect(Tables.documents(s, dir))),
    "q42_multimodal_meta" -> ((s, dir) =>
      Multimodal.decodeMeta(Multimodal.mediaFromDocuments(Tables.documents(s, dir)))),
    // Library output is array<float>; the registered form serializes each
    // feature to a fixed 3-decimal string (the stub features are exact
    // milli-fractions, so the formatting is lossless on both engines).
    "q43_multimodal_features" -> ((s, dir) =>
      Multimodal.extractFeatures(Multimodal.mediaFromDocuments(Tables.documents(s, dir)))
        .select(col("doc_id"),
          array_join(transform(col("features"), f => format_number(f, 3)), ",")
            .as("features"))),
    "q44_multimodal_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(Multimodal.mediaFromDocuments(Tables.documents(s, dir)))),
    // REAL decode, no stub: synthesize a spec-conformant 8-bit PCM WAV per
    // document, then parse the RIFF header and fold per-sample amplitude
    // stats with pure byte expressions (the oracle recomputes the stats
    // from the synthesis formula; MultimodalSpec decodes a hand-built
    // fixture to pin the byte-level parse itself)
    "q84_wav_decode" -> ((s, dir) =>
      Multimodal.decodeWav(Multimodal.synthesizeWav(Tables.documents(s, dir)))),
    // REAL image decode: binary PPM (P6) header parse (variable-length
    // ASCII dimensions) + per-channel pixel sums, pure byte expressions
    "q87_ppm_decode" -> ((s, dir) =>
      Multimodal.decodePpm(Multimodal.synthesizePpm(Tables.documents(s, dir)))),
    // perceptual dHash over the REAL P6 bytes: 4x4 nearest-neighbor luma
    // grid -> 12 horizontal + 12 vertical gradient bits — the image-side
    // near-dup signature beside MinHash/SimHash
    "q210_image_dhash" -> ((s, dir) =>
      Multimodal.imageDhash(Multimodal.synthesizePpm(Tables.documents(s, dir)))),
    // frame-level ZCR + energy over the REAL PCM bytes — the first DSP
    // features, one row per 16-sample frame
    "q223_wav_zcr" -> ((s, dir) =>
      Multimodal.wavZcr(Multimodal.synthesizeWav(Tables.documents(s, dir)))),
    // REAL audio featurization: amplitude histogram over the decoded PCM
    // sample bytes (one row per doc × bin, map-side only)
    "q92_wav_features" -> ((s, dir) =>
      Multimodal.wavAmplitudeHistogram(Multimodal.synthesizeWav(Tables.documents(s, dir)))),
    // REAL plain-PGM (P2) decode: the pixel region is variable-width ASCII
    // decimal tokens, so this exercises the tokenize-and-cast parse path
    // (vs the fixed-byte-offset slicing of q84/q87)
    "q135_pgm_decode" -> ((s, dir) =>
      Multimodal.decodePgm(Multimodal.synthesizePgm(Tables.documents(s, dir)))),
    // Otsu binarization threshold over the corpus histogram of REAL-
    // decoded PGM pixels — exact integer variance ratio, one division
    "q168_otsu" -> ((s, dir) =>
      Multimodal.otsuThreshold(Multimodal.synthesizePgm(Tables.documents(s, dir)))),
    // REAL BMP (24-bit) decode: little-endian header fields, BOTTOM-UP
    // rows, 4-byte stride padding — the 2D-geometry decode the other
    // three codecs don't exercise (0xAA pad bytes trap a bad stride)
    "q155_bmp_decode" -> ((s, dir) =>
      Multimodal.decodeBmp(Multimodal.synthesizeBmp(Tables.documents(s, dir)))),
    // temporal-media kernel: per consecutive frame pair, exact integer
    // |Δpixel| sums over synthesized frame sequences; planted inverted
    // frames must flag as hard cuts
    "q141_scene_cuts" -> ((s, dir) =>
      Multimodal.sceneCuts(Multimodal.synthesizeFrameSeq(Tables.documents(s, dir)))),
    // MapType coverage: construct map<string,string> props per media row,
    // then aggregate through element_at lookups and map_keys
    "q136_media_props" -> ((s, dir) =>
      Multimodal.mediaProps(Multimodal.mediaFromDocuments(Tables.documents(s, dir)))
        .select(
          element_at(col("props"), "kind").as("kind"),
          element_at(col("props"), "parity").as("parity"),
          element_at(col("props"), "bytes").cast("long").as("bytes"),
          size(map_keys(col("props"))).cast("long").as("n_keys"))
        .groupBy("kind", "parity")
        .agg(count(lit(1)).as("n_docs"), sum("bytes").as("total_bytes"),
          max("n_keys").as("n_keys"))
        .orderBy("kind", "parity")),
  )

  def oracles: Map[String, String] = Map(
    "q51_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q52_bucketed_join" ->
      """SELECT o_custkey AS custkey, max(c_name) AS c_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY o_custkey""".stripMargin,
    "q79_shard_manifest" ->
      s"""WITH h AS (
         |  SELECT doc_id, n_chars,
         |    ${md5Prefix32Sql("'shard:' || CAST(doc_id AS VARCHAR)")} % 16 AS shard
         |  FROM documents)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
         |FROM h GROUP BY shard""".stripMargin,
    // bloom-prune is output-identical to the plain join (false positives die
    // in the exact join) — so the oracle is the plain ANSI join+agg
    "q58_bloom_prune_join" ->
      """SELECT o_orderkey, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderkey""".stripMargin,
    "q62_balanced_mix" ->
      """SELECT doc_id, lang, source, n_chars, CAST(cum_chars AS BIGINT) AS cum_chars
        |FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |    sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_chars
        |  FROM documents)
        |WHERE cum_chars - n_chars < 15000""".stripMargin,
    // `//`/`%` on positive BIGINTs twin Spark's exact div/pmod
    "q63_pack_sequences" ->
      """SELECT doc_id, source, n_chars,
        |  CAST(prev // 4096 AS BIGINT) AS bin,
        |  CAST(prev % 4096 AS BIGINT) AS bin_offset
        |FROM (
        |  SELECT doc_id, source, n_chars,
        |    COALESCE(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
        |  FROM documents)""".stripMargin,
    // ceil yields an integral double; CAST rounds, which is exact here
    "q66_lang_upsample" ->
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        |m AS (SELECT max(cnt) AS mx FROM c),
        |w AS (SELECT lang,
        |  least(4, CAST(ceil(CAST(mx AS DOUBLE) / cnt) AS BIGINT)) AS n_epochs
        |  FROM c, m)
        |SELECT d.doc_id, d.lang, unnest(range(1, n_epochs + 1)) AS epoch
        |FROM documents d JOIN w USING (lang)""".stripMargin,
    "q75_stratified_sample" ->
      s"""WITH h AS (
         |  SELECT source, doc_id,
         |    ${md5Prefix32Sql("'sample:' || CAST(doc_id AS VARCHAR)")} AS sample_hash
         |  FROM documents),
         |r AS (
         |  SELECT source, doc_id, sample_hash,
         |    row_number() OVER (PARTITION BY source
         |                       ORDER BY sample_hash, doc_id) AS rn
         |  FROM h)
         |SELECT source, doc_id, sample_hash FROM r WHERE rn <= 5""".stripMargin,
    "q74_chunking" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
         |  FROM documents),
         |nc AS (
         |  SELECT doc_id, t, len(t) AS n,
         |    CASE WHEN len(t) <= 64 THEN 1
         |         ELSE CAST(ceil((len(t) - 64) / 48.0) AS BIGINT) + 1 END AS nchunk
         |  FROM toks),
         |c AS (
         |  SELECT doc_id, t, n, unnest(range(0, nchunk)) AS chunk_id FROM nc)
         |SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
         |  CAST(least(64, n - chunk_id * 48) AS INTEGER) AS n_tokens,
         |  ${md5Prefix32Sql("array_to_string(t[chunk_id*48+1 : chunk_id*48+64], ' ')")} AS chunk_hash
         |FROM c""".stripMargin,
    // pixels re-derived from the q135 generative formula (Spark parses
    // the real bytes); same cross-multiplied mean bits
    "q246_image_ahash" ->
      """WITH d AS (
        |  SELECT doc_id, 3 + doc_id % 4 AS w, 2 + doc_id % 3 AS h FROM documents),
        |px AS (
        |  SELECT doc_id, w * h AS n,
        |    list_transform(range(0, w * h), k -> (doc_id * 13 + k * 7) % 256) AS b
        |  FROM d)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_pixels,
        |  CAST(list_sum(b) AS BIGINT) AS px_sum,
        |  CAST(list_sum(list_transform(range(0, n), k ->
        |    CASE WHEN b[CAST(k + 1 AS INTEGER)] * n > list_sum(b)
        |    THEN 1 << CAST(k AS INTEGER) ELSE 0 END)) AS BIGINT) AS ahash
        |FROM px""".stripMargin,
    // same md5 user folds, same per-fold aggregates, same cross-fold
    // distinct-user identity
    "q272_group_kfold" ->
      s"""WITH $ratingsCte,
        |f AS (
        |  SELECT userId, productId,
        |    ${md5Prefix32Sql("'fold:' || CAST(userId AS VARCHAR)")} % 5 AS fold
        |  FROM ratings),
        |pf AS (
        |  SELECT fold, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(DISTINCT userId) AS BIGINT) AS n_users,
        |    CAST(count(DISTINCT productId) AS BIGINT) AS n_items
        |  FROM f GROUP BY 1),
        |g AS (SELECT CAST(count(DISTINCT userId) AS BIGINT) AS n_users_global
        |  FROM ratings),
        |t AS (SELECT CAST(sum(n_users) AS BIGINT) AS n_users_all_folds FROM pf)
        |SELECT fold, n_rows, n_users, n_items, n_users_all_folds,
        |  n_users_global, n_users_all_folds = n_users_global AS leak_free
        |FROM pf CROSS JOIN g CROSS JOIN t""".stripMargin,
    "q42_multimodal_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_kind,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  CAST(octet_length(encode(text)) % 640 + 16 AS INTEGER) AS width,
        |  CAST(octet_length(encode(text)) % 480 + 16 AS INTEGER) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 1 END AS INTEGER) AS channels
        |FROM documents""".stripMargin,
    // documents.text is pure ASCII in this dataset (asserted in
    // MultimodalSpec), so VARCHAR slices in DuckDB see the same bytes the
    // Spark side's binary payload slices do.
    "q43_multimodal_features" ->
      s"""SELECT doc_id,
         |  array_to_string(list_transform(range(0, 8), i ->
         |    printf('%.3f', CAST((${md5Prefix32Sql("substring(text, CAST(i*16+1 AS INTEGER), 16)")} % 1000)
         |                        / 1000.0 AS REAL))), ',') AS features
         |FROM documents""".stripMargin,
    // synth∘decode is the identity on the sample stream, so the oracle
    // recomputes every parsed field from the synthesis formula: n = 32 +
    // doc_id % 33 samples of (doc_id·31 + i·7) mod 256 at 8 kHz mono 8-bit.
    // The byte-level header/PCM parse itself is pinned by MultimodalSpec's
    // hand-built fixture.
    "q84_wav_decode" ->
      """WITH n AS (
        |  SELECT doc_id, 32 + doc_id % 33 AS ns FROM documents),
        |s AS (
        |  SELECT doc_id, ns,
        |    list_transform(range(0, ns), i -> (doc_id * 31 + i * 7) % 256) AS smp
        |  FROM n)
        |SELECT doc_id,
        |  CAST(1 AS BIGINT) AS valid_header,
        |  CAST(1 AS BIGINT) AS n_channels,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(8 AS BIGINT) AS bits_per_sample,
        |  CAST(ns AS BIGINT) AS n_samples,
        |  CAST(list_max(smp) AS BIGINT) AS peak,
        |  CAST(list_sum(smp) AS BIGINT) AS amp_sum,
        |  CAST(list_sum(smp) AS DOUBLE) / ns AS mean_amp
        |FROM s""".stripMargin,
    // same synth∘decode-identity pattern as q84: the oracle recomputes the
    // parsed fields from the synthesis formula (w = 4 + doc_id%5,
    // h = 3 + doc_id%4, pixel k = (doc_id·17 + k·11) mod 256); the byte-
    // level P6 parse is pinned by MultimodalSpec's hand-built fixtures
    "q87_ppm_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents),
        |px AS (
        |  SELECT doc_id, w, h,
        |    list_transform(range(0, w * h * 3), k -> (doc_id * 17 + k * 11) % 256) AS b
        |  FROM d)
        |SELECT doc_id,
        |  CAST(1 AS BIGINT) AS valid_magic,
        |  CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(255 AS BIGINT) AS maxval,
        |  CAST(w * h AS BIGINT) AS n_pixels,
        |  CAST(list_sum(list_transform(range(0, w * h), i -> b[i * 3 + 1])) AS BIGINT) AS r_sum,
        |  CAST(list_sum(list_transform(range(0, w * h), i -> b[i * 3 + 2])) AS BIGINT) AS g_sum,
        |  CAST(list_sum(list_transform(range(0, w * h), i -> b[i * 3 + 3])) AS BIGINT) AS b_sum,
        |  CAST(list_sum(b) AS DOUBLE) / (w * h * 3) AS mean_luma
        |FROM px""".stripMargin,
    // same 16-sample frames, crossings and energy re-derived from the
    // q84 synthesis formula (the byte parse is spec-pinned)
    "q223_wav_zcr" ->
      """WITH d AS (SELECT doc_id, 32 + doc_id % 33 AS n FROM documents),
        |f AS (
        |  SELECT doc_id, n, t.i AS frame_idx, t.i * 16 AS st,
        |    least(16, n - t.i * 16) AS flen
        |  FROM d, range(4) t(i) WHERE t.i * 16 < n)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(flen AS BIGINT) AS n_in_frame,
        |  CAST(coalesce(list_sum(list_transform(range(0, flen - 1), k ->
        |    CASE WHEN ((doc_id*31 + (st+k)*7) % 256 >= 128)
        |      <> ((doc_id*31 + (st+k+1)*7) % 256 >= 128)
        |    THEN 1 ELSE 0 END)), 0) AS BIGINT) AS zero_crossings,
        |  CAST(list_sum(list_transform(range(0, flen), k ->
        |    abs((doc_id*31 + (st+k)*7) % 256 - 128))) AS BIGINT) AS energy
        |FROM f""".stripMargin,
    // same 4x4 nearest-neighbor grid and gradient bits, pixels re-derived
    // from the q87 synthesis formula (the byte parse is spec-pinned)
    "q210_image_dhash" ->
      """WITH d AS (
        |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents),
        |g AS (
        |  SELECT doc_id, w, h,
        |    list_transform(range(0, 16), t ->
        |      (doc_id*17 + (3*((t//4)*h//4*w + (t%4)*w//4))*11) % 256
        |      + (doc_id*17 + (3*((t//4)*h//4*w + (t%4)*w//4) + 1)*11) % 256
        |      + (doc_id*17 + (3*((t//4)*h//4*w + (t%4)*w//4) + 2)*11) % 256) AS gl
        |  FROM d)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(list_sum(list_transform(range(0, 12), x ->
        |    CASE WHEN gl[(x//3)*4 + (x%3) + 2] > gl[(x//3)*4 + (x%3) + 1]
        |    THEN 1 << CAST(x AS INT) ELSE 0 END)) AS BIGINT) AS dhash_h,
        |  CAST(list_sum(list_transform(range(0, 12), x ->
        |    CASE WHEN gl[(x//4+1)*4 + (x%4) + 1] > gl[(x//4)*4 + (x%4) + 1]
        |    THEN 1 << CAST(x AS INT) ELSE 0 END)) AS BIGINT) AS dhash_v
        |FROM g""".stripMargin,
    // recomputes every statistic from the synthesis formula (w/h from
    // doc_id, per-channel mods); top_row_sum is image row y = 0
    "q155_bmp_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 3 + doc_id % 3 AS w, 2 + doc_id % 2 AS h FROM documents)
        |SELECT doc_id,
        |  CAST(1 AS BIGINT) AS valid_magic,
        |  CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(24 AS BIGINT) AS bpp,
        |  CAST(((3 * w + 3) // 4) * 4 AS BIGINT) AS row_size,
        |  CAST(list_sum(flatten(list_transform(range(0, h), y ->
        |    list_transform(range(0, w), x -> (doc_id * 7 + x * 3 + y * 5) % 256))))
        |    AS BIGINT) AS b_sum,
        |  CAST(list_sum(flatten(list_transform(range(0, h), y ->
        |    list_transform(range(0, w), x -> (doc_id * 11 + x * 5 + y * 3) % 256))))
        |    AS BIGINT) AS g_sum,
        |  CAST(list_sum(flatten(list_transform(range(0, h), y ->
        |    list_transform(range(0, w), x -> (doc_id * 13 + x * 7 + y * 11) % 256))))
        |    AS BIGINT) AS r_sum,
        |  CAST(list_sum(list_transform(range(0, w), x ->
        |    (doc_id * 7 + x * 3) % 256 + (doc_id * 11 + x * 5) % 256
        |      + (doc_id * 13 + x * 7) % 256)) AS BIGINT) AS top_row_sum
        |FROM d""".stripMargin,
    // histogram of the q84 synthesis formula's sample stream: n = 32 +
    // doc_id%33 samples of (doc_id·31 + i·7) mod 256, bucketed by 32s
    "q92_wav_features" ->
      """WITH n AS (
        |  SELECT doc_id, 32 + doc_id % 33 AS ns FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    list_transform(range(0, ns), i -> (doc_id * 31 + i * 7) % 256) AS smp
        |  FROM n),
        |bs AS (SELECT unnest(range(0, 8)) AS bin)
        |SELECT doc_id,
        |  CAST(bin AS INTEGER) AS bin,
        |  CAST(bin * 32 AS INTEGER) AS bin_lo,
        |  CAST(len(list_filter(smp, v -> v >= bin * 32 AND v < (bin + 1) * 32)) AS BIGINT)
        |    AS n_in_bin
        |FROM s CROSS JOIN bs""".stripMargin,
    // recomputes the q135 synthesis formula: w = 3 + doc_id%4,
    // h = 2 + doc_id%3, pixel k = (doc_id*13 + k*7) mod 256
    "q135_pgm_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 3 + doc_id % 4 AS w, 2 + doc_id % 3 AS h FROM documents),
        |px AS (
        |  SELECT doc_id, w, h,
        |    list_transform(range(0, w * h), k -> (doc_id * 13 + k * 7) % 256) AS b
        |  FROM d)
        |SELECT doc_id,
        |  CAST(1 AS BIGINT) AS valid_magic,
        |  CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(255 AS BIGINT) AS maxval,
        |  CAST(w * h AS BIGINT) AS n_pixels,
        |  CAST(list_min(b) AS BIGINT) AS px_min,
        |  CAST(list_max(b) AS BIGINT) AS px_max,
        |  CAST(list_sum(b) AS BIGINT) AS px_sum,
        |  CAST(list_sum(b) AS DOUBLE) / (w * h) AS mean_gray
        |FROM px""".stripMargin,
    // pixel values re-derived from the generative formula (Spark parses
    // the real bytes); same cumulative scan, same HUGEINT variance ratio
    "q168_otsu" ->
      """WITH d AS (
        |  SELECT doc_id, 3 + doc_id % 4 AS iw, 2 + doc_id % 3 AS ih FROM documents),
        |pxl AS (
        |  SELECT unnest(list_transform(range(0, iw * ih),
        |    k -> (doc_id * 13 + k * 7) % 256)) AS v
        |  FROM d),
        |hist AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM pxl GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS n,
        |    CAST(sum(v * cnt) AS BIGINT) AS s
        |  FROM hist),
        |c AS (
        |  SELECT v,
        |    CAST(sum(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS w0,
        |    CAST(sum(v * cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s0
        |  FROM hist),
        |f AS (
        |  SELECT v, w0, n,
        |    CAST(CAST(s0 AS HUGEINT) * n - CAST(w0 AS HUGEINT) * s AS HUGEINT) AS numr,
        |    CAST(w0 AS HUGEINT) * (n - w0) AS den
        |  FROM c CROSS JOIN tot WHERE w0 > 0 AND w0 < n)
        |SELECT v AS threshold, w0, n - w0 AS w1, n AS n_pixels,
        |  CAST(numr * numr AS DOUBLE) / CAST(den AS DOUBLE) AS between_var_scaled
        |FROM f
        |QUALIFY row_number() OVER (
        |  ORDER BY CAST(numr * numr AS DOUBLE) / CAST(den AS DOUBLE) DESC, v) = 1""".stripMargin,
    // recomputes the frame-sequence formula (inverted frame 2 on every
    // 5th doc) and the same integer |Δ| fold per consecutive pair
    "q141_scene_cuts" ->
      """WITH d AS (
        |  SELECT doc_id, (3 + doc_id % 4) * (2 + doc_id % 3) AS n_pixels,
        |    3 + doc_id % 3 AS nf
        |  FROM documents),
        |pairs AS (SELECT doc_id, n_pixels, unnest(range(1, nf)) AS f FROM d),
        |diffs AS (
        |  SELECT doc_id, f, n_pixels,
        |    list_sum(list_transform(range(0, n_pixels), k -> abs(
        |      (CASE WHEN f = 2 AND doc_id % 5 = 0
        |            THEN 255 - ((doc_id*13 + f*29 + k*7) % 256)
        |            ELSE (doc_id*13 + f*29 + k*7) % 256 END)
        |      - (CASE WHEN f - 1 = 2 AND doc_id % 5 = 0
        |            THEN 255 - ((doc_id*13 + (f-1)*29 + k*7) % 256)
        |            ELSE (doc_id*13 + (f-1)*29 + k*7) % 256 END)))) AS s
        |  FROM pairs)
        |SELECT doc_id, CAST(f AS BIGINT) AS frame_no,
        |  CAST(s AS BIGINT) AS sum_absdiff,
        |  CAST(n_pixels AS BIGINT) AS n_pixels,
        |  CAST(s AS DOUBLE) / n_pixels AS mean_absdiff,
        |  s * 4 > n_pixels * 510 AS is_cut
        |FROM diffs""".stripMargin,
    // the props map is (kind, bytes, parity) derived from media_kind and
    // the payload byte length; the oracle recomputes the lookups directly
    "q136_media_props" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |    octet_length(encode(text)) AS bytes
        |  FROM documents)
        |SELECT kind,
        |  CASE WHEN bytes % 2 = 0 THEN 'even' ELSE 'odd' END AS parity,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(bytes) AS BIGINT) AS total_bytes,
        |  CAST(3 AS BIGINT) AS n_keys
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q44_multimodal_frames" ->
      s"""WITH ks AS (SELECT unnest(range(0, 4)) AS b),
         |frames AS (
         |  SELECT doc_id, b, substring(text, CAST(b*32+1 AS INTEGER), 32) AS frame
         |  FROM documents CROSS JOIN ks)
         |SELECT doc_id,
         |  CAST(b AS INTEGER) AS frame_no,
         |  CAST(length(frame) AS INTEGER) AS frame_bytes,
         |  ${md5Prefix32Sql("frame")} AS frame_fp
         |FROM frames""".stripMargin,
    // same segment aggregate, same (size DESC, source, bucket) pack
    // order, exact integer cumulative-sum bin assignment and fill
    "q162_compaction_plan" ->
      """WITH segs AS (
        |  SELECT source, doc_id % 64 AS bucket,
        |    CAST(sum(n_chars) AS BIGINT) AS seg_bytes
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(seg_bytes) AS BIGINT) AS total FROM segs),
        |packed AS (
        |  SELECT seg_bytes, (total + 7) // 8 AS target,
        |    CAST(sum(seg_bytes) OVER (ORDER BY seg_bytes DESC, source, bucket)
        |      AS BIGINT) AS cum
        |  FROM segs CROSS JOIN tot)
        |SELECT CAST((cum - 1) // target AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(sum(seg_bytes) AS BIGINT) AS bin_bytes, target,
        |  CAST(sum(seg_bytes) AS BIGINT) * 1000000 // target AS fill_ppm
        |FROM packed GROUP BY 1, 4""".stripMargin,
    // same md5 ring, same pos*64+shard integer argmin, same wrap and
    // movement flags
    "q187_reshard_report" ->
      s"""WITH r4 AS (
        |  SELECT s.s AS shard,
        |    ${md5Prefix32Sql("'node:' || CAST(s.s AS VARCHAR) || ':' || CAST(v.v AS VARCHAR)")}
        |      * 64 + s.s AS key,
        |    ${md5Prefix32Sql("'node:' || CAST(s.s AS VARCHAR) || ':' || CAST(v.v AS VARCHAR)")}
        |      AS pos
        |  FROM (SELECT unnest(range(0, 4)) AS s) s
        |  CROSS JOIN (SELECT unnest(range(0, 16)) AS v) v),
        |r5 AS (
        |  SELECT s.s AS shard,
        |    ${md5Prefix32Sql("'node:' || CAST(s.s AS VARCHAR) || ':' || CAST(v.v AS VARCHAR)")}
        |      * 64 + s.s AS key,
        |    ${md5Prefix32Sql("'node:' || CAST(s.s AS VARCHAR) || ':' || CAST(v.v AS VARCHAR)")}
        |      AS pos
        |  FROM (SELECT unnest(range(0, 5)) AS s) s
        |  CROSS JOIN (SELECT unnest(range(0, 16)) AS v) v),
        |d AS (
        |  SELECT doc_id,
        |    ${md5Prefix32Sql("'doc:' || CAST(doc_id AS VARCHAR)")} AS h
        |  FROM documents),
        |b AS (
        |  SELECT d.doc_id, d.h,
        |    COALESCE(min(CASE WHEN r4.pos >= d.h THEN r4.key END),
        |      min(r4.key)) % 64 AS shard_before
        |  FROM d CROSS JOIN r4 GROUP BY 1, 2),
        |a AS (
        |  SELECT d.doc_id,
        |    COALESCE(min(CASE WHEN r5.pos >= d.h THEN r5.key END),
        |      min(r5.key)) % 64 AS shard_after
        |  FROM d CROSS JOIN r5 GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(COALESCE(sum(CASE WHEN shard_before <> shard_after THEN 1 END), 0)
        |    AS BIGINT) AS moved,
        |  CAST(COALESCE(sum(CASE WHEN shard_before <> shard_after THEN 1 END), 0)
        |    AS BIGINT) * 1000000 // count(*) AS moved_ppm,
        |  CAST(200000 AS BIGINT) AS ch_theory_ppm,
        |  CAST(COALESCE(sum(CASE WHEN b.h % 4 <> b.h % 5 THEN 1 END), 0)
        |    AS BIGINT) AS mod_moved,
        |  CAST(COALESCE(sum(CASE WHEN b.h % 4 <> b.h % 5 THEN 1 END), 0)
        |    AS BIGINT) * 1000000 // count(*) AS mod_moved_ppm
        |FROM b JOIN a USING (doc_id)""".stripMargin,
    // q74's chunk CTE, the same adjacency pairing, the same md5 draw
    // mod doc-space with self-collisions dropped, chunk-0 resolution
    "q189_contrastive_pairs" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
         |  FROM documents),
         |nc AS (
         |  SELECT doc_id, t, len(t) AS n,
         |    CASE WHEN len(t) <= 64 THEN 1
         |         ELSE CAST(ceil((len(t) - 64) / 48.0) AS BIGINT) + 1 END AS nchunk
         |  FROM toks),
         |ch AS (
         |  SELECT doc_id, chunk_id,
         |    ${md5Prefix32Sql("array_to_string(t[chunk_id*48+1 : chunk_id*48+64], ' ')")} AS chunk_hash
         |  FROM (SELECT doc_id, t, unnest(range(0, nchunk)) AS chunk_id FROM nc)),
         |anchors AS (
         |  SELECT a.doc_id, a.chunk_id, a.chunk_hash AS anchor_hash,
         |    p.chunk_id AS pos_chunk_id, p.chunk_hash AS pos_hash
         |  FROM ch a JOIN ch p
         |    ON p.doc_id = a.doc_id AND p.chunk_id = a.chunk_id + 1),
         |md AS (SELECT max(doc_id) AS max_doc FROM documents),
         |z AS (SELECT doc_id AS neg_doc_id, chunk_hash AS neg_hash
         |  FROM ch WHERE chunk_id = 0),
         |draws AS (
         |  SELECT anchors.*, d.draw,
         |    ${md5Prefix32Sql("'ctr:' || CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_id AS VARCHAR) || ':' || CAST(d.draw AS VARCHAR)")}
         |      % (md.max_doc + 1) AS neg_doc_id
         |  FROM anchors CROSS JOIN md
         |  CROSS JOIN (SELECT unnest(range(1, 3)) AS draw) d)
         |SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id, anchor_hash,
         |  CAST(pos_chunk_id AS INTEGER) AS pos_chunk_id, pos_hash,
         |  CAST(draw AS BIGINT) AS draw, neg_doc_id, z.neg_hash
         |FROM draws JOIN z USING (neg_doc_id)
         |WHERE neg_doc_id <> doc_id""".stripMargin,
    // same q79 shard hash, same closed-form absent-source mass, same
    // ppm floor of the exact TVD
    "q222_shard_balance" ->
      s"""WITH sc AS (
         |  SELECT ${md5Prefix32Sql("'shard:' || CAST(doc_id AS VARCHAR)")} % 16
         |      AS shard,
         |    source, CAST(count(*) AS BIGINT) AS c
         |  FROM documents GROUP BY 1, 2),
         |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS ctot FROM sc GROUP BY 1),
         |tt AS (SELECT CAST(sum(ctot) AS BIGINT) AS n_total FROM st),
         |sh AS (SELECT shard, CAST(sum(c) AS BIGINT) AS n_sh FROM sc GROUP BY 1),
         |ag AS (
         |  SELECT sc.shard,
         |    CAST(sum(abs(sc.c * n_total - st.ctot * sh.n_sh)) AS BIGINT) AS sum_abs,
         |    CAST(sum(st.ctot) AS BIGINT) AS c_present,
         |    CAST(max(sh.n_sh) AS BIGINT) AS n_docs,
         |    CAST(max(n_total) AS BIGINT) AS nt
         |  FROM sc JOIN st ON sc.source = st.source
         |  JOIN sh ON sc.shard = sh.shard CROSS JOIN tt
         |  GROUP BY 1)
         |SELECT shard, n_docs,
         |  sum_abs + (nt - c_present) * n_docs AS tvd_num,
         |  (sum_abs + (nt - c_present) * n_docs) * 1000000
         |    // (2 * n_docs * nt) AS tvd_ppm
         |FROM ag""".stripMargin,
    // same md5 fold draw, same exact ppm deviation integer division
    "q199_kfold_assign" ->
      s"""WITH f AS (
         |  SELECT lang,
         |    ${md5Prefix32Sql("'fold:' || CAST(doc_id AS VARCHAR)")} % 5 AS fold
         |  FROM documents),
         |per AS (
         |  SELECT lang, fold, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM f GROUP BY 1, 2),
         |tot AS (
         |  SELECT lang, fold, n_docs,
         |    CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS n_stratum
         |  FROM per)
         |SELECT lang, fold, n_docs, n_stratum,
         |  CAST(abs(5 * n_docs - n_stratum) * 1000000 // n_stratum AS BIGINT)
         |    AS dev_ppm
         |FROM tot""".stripMargin,
    // identical md5 inclusion compare and per-term floor-scaled HT
    // contribution; the double casts mirror the Spark column order
    "q152_pps_sample" ->
      s"""WITH base AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |mx AS (SELECT max(n_chars) AS max_chars FROM base),
        |k AS (
        |  SELECT n_tok, n_chars, max_chars,
        |    ${md5Prefix32Sql("'pps:' || CAST(doc_id AS VARCHAR)")} * max_chars
        |      < n_chars * 4294967296 AS kept
        |  FROM base CROSS JOIN mx)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(COALESCE(sum(CASE WHEN kept THEN 1 END), 0) AS BIGINT) AS n_kept,
        |  CAST(sum(n_tok) AS BIGINT) AS exact_tokens,
        |  CAST(COALESCE(sum(CASE WHEN kept
        |    THEN n_tok * max_chars * 1000000 // n_chars END), 0) AS BIGINT)
        |    AS est_tokens_micro,
        |  CAST(CAST(COALESCE(sum(CASE WHEN kept
        |    THEN n_tok * max_chars * 1000000 // n_chars END), 0) AS BIGINT) AS DOUBLE)
        |    / 1e6 AS est_tokens,
        |  (CAST(CAST(COALESCE(sum(CASE WHEN kept
        |      THEN n_tok * max_chars * 1000000 // n_chars END), 0) AS BIGINT) AS DOUBLE)
        |      / 1e6 - CAST(sum(n_tok) AS DOUBLE))
        |    / CAST(sum(n_tok) AS DOUBLE) AS rel_err
        |FROM k""".stripMargin,
    // same salted-hash in-bucket order; integer division batches rows
    "q120_batch_padding" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tok
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, n_tok, (n_tok - 1) // 64 AS bucket_id,
         |    ${md5Prefix32Sql("'batch:' || CAST(doc_id AS VARCHAR)")} AS ord
         |  FROM toks),
         |rn AS (
         |  SELECT bucket_id, n_tok,
         |    (row_number() OVER (PARTITION BY bucket_id ORDER BY ord, doc_id) - 1) // 16
         |      AS batch_id
         |  FROM b)
         |SELECT bucket_id, batch_id, count(*) AS n_docs,
         |  CAST(max(n_tok) AS BIGINT) AS max_tokens,
         |  CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
         |  CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS pad_waste,
         |  CAST(sum(n_tok) AS DOUBLE) / CAST(count(*) * max(n_tok) AS DOUBLE)
         |    AS efficiency
         |FROM rn GROUP BY 1, 2""".stripMargin,
    // identical rank-based file assignment (a plain global row_number
    // here; the Spark side computes the same rank distributed as day
    // offsets + per-day rank); the hashed layout is the GramMix32
    // multiply-xorshift finalizer over the unique (orderkey, linenumber)
    // packing, spelled in the same layered exact-in-signed-64 steps as
    // the packed-gram oracles; overlap test and amplification are
    // exact-integer until the single final division
    "q124_zonemap_skipping" ->
      s"""WITH base AS (
         |  SELECT l_orderkey, l_linenumber,
         |    epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 86400000000 AS k,
         |    l_orderkey * 256 + l_linenumber AS gk
         |  FROM lineitem),
         |m1 AS (SELECT *, ((gk % 4294967296) * 1640531527 % 4294967296
         |  + (gk // 4294967296) * 2654435761 % 4294967296) % 4294967296 AS t FROM base),
         |m2 AS (SELECT *, xor(t, t // 65536) AS v FROM m1),
         |m3 AS (SELECT *, v * 1103515245 % 4294967296 AS u FROM m2),
         |hb AS (SELECT *, xor(u, u // 65536) AS h FROM m3),
         |tot AS (SELECT (count(*) + 4095) // 4096 AS n_files FROM base),
         |layouts AS (
         |  SELECT 'sorted' AS layout,
         |    (row_number() OVER (ORDER BY k, l_orderkey, l_linenumber) - 1) // 4096 AS file_id, k
         |  FROM base
         |  UNION ALL
         |  SELECT 'hashed' AS layout,
         |    h % (SELECT n_files FROM tot) AS file_id, k
         |  FROM hb),
         |stats AS (
         |  SELECT layout, file_id, min(k) AS min_k, max(k) AS max_k,
         |    CAST(count(*) AS BIGINT) AS n_in_file
         |  FROM layouts GROUP BY 1, 2),
         |preds(pred, lo, hi) AS (VALUES
         |  ('month_1996_06', 9648, 9678), ('year_1997', 9862, 10227),
         |  ('tail_2001', 11474, 11688)),
         |exact AS (
         |  SELECT pred, CAST(count(*) AS BIGINT) AS exact_rows
         |  FROM base JOIN preds ON k >= lo AND k < hi GROUP BY 1)
         |SELECT s.layout, p.pred,
         |  CAST(count(*) AS BIGINT) AS n_files,
         |  CAST(COALESCE(sum(CASE WHEN s.min_k < p.hi AND s.max_k >= p.lo THEN 1 END), 0) AS BIGINT) AS files_read,
         |  CAST(COALESCE(sum(CASE WHEN s.min_k < p.hi AND s.max_k >= p.lo THEN s.n_in_file END), 0) AS BIGINT) AS rows_scanned,
         |  max(e.exact_rows) AS exact_rows,
         |  CAST(COALESCE(sum(CASE WHEN s.min_k < p.hi AND s.max_k >= p.lo THEN s.n_in_file END), 0) AS DOUBLE)
         |    / CAST(max(e.exact_rows) AS DOUBLE) AS read_amplification
         |FROM stats s CROSS JOIN preds p JOIN exact e ON e.pred = p.pred
         |GROUP BY 1, 2""".stripMargin,
    // same quality expression as q34 (bit-identical doubles), doc_id tie
    // break, and the pure-integer budget predicate 2·cum <= total
    "q126_nucleus_select" ->
      s"""WITH q AS ($qualityScoreOracle),
         |d AS (
         |  SELECT doc.doc_id, doc.source, doc.n_chars, q.quality_score
         |  FROM documents doc JOIN q ON doc.doc_id = q.doc_id),
         |c AS (
         |  SELECT *,
         |    sum(n_chars) OVER (PARTITION BY source
         |      ORDER BY quality_score DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_chars,
         |    sum(n_chars) OVER (PARTITION BY source) AS total_chars
         |  FROM d)
         |SELECT doc_id, source, n_chars, quality_score,
         |  CAST(cum_chars AS BIGINT) AS cum_chars
         |FROM c WHERE cum_chars * 2 <= total_chars""".stripMargin,
    // same mask-doubling bit spread as ZOrder.spread16, one CTE per
    // ladder rung; // mirrors Spark's div, all BIGINT bit arithmetic
    "q105_zorder_profile" ->
      """WITH mm AS (
        |  SELECT min(l_partkey) AS xmin, max(l_partkey) AS xmax,
        |         min(l_suppkey) AS ymin, max(l_suppkey) AS ymax
        |  FROM lineitem),
        |s AS (
        |  SELECT l_partkey AS x, l_suppkey AS y,
        |    CASE WHEN xmax > xmin
        |      THEN ((l_partkey - xmin) * 65535) // (xmax - xmin) ELSE 0 END AS x16,
        |    CASE WHEN ymax > ymin
        |      THEN ((l_suppkey - ymin) * 65535) // (ymax - ymin) ELSE 0 END AS y16
        |  FROM lineitem, mm),
        |a AS (SELECT x, y, ((x16 | (x16 << 8)) & 16711935) AS xa,
        |             ((y16 | (y16 << 8)) & 16711935) AS ya FROM s),
        |b AS (SELECT x, y, ((xa | (xa << 4)) & 252645135) AS xb,
        |             ((ya | (ya << 4)) & 252645135) AS yb FROM a),
        |c AS (SELECT x, y, ((xb | (xb << 2)) & 858993459) AS xc,
        |             ((yb | (yb << 2)) & 858993459) AS yc FROM b),
        |d AS (SELECT x, y, (((xc | (xc << 1)) & 1431655765)
        |             | ((((yc | (yc << 1)) & 1431655765)) << 1)) AS z FROM c)
        |SELECT z // 67108864 AS bucket, CAST(count(*) AS BIGINT) AS n,
        |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
        |FROM d GROUP BY 1""".stripMargin,
  )
}
