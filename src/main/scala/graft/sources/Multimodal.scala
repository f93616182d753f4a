package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus the decode / feature-extract /
  * frame-sample plumbing a training-data pipeline needs.
  *
  * The container ships no image/audio codecs, so the *decode kernels* are
  * STUBS — deterministic fakes clearly marked below. Everything around them
  * (schema, batch shape, partitioning, the mapPartitions seam where a real
  * vectorized decoder would sit) is real and tested. Swapping in a real
  * codec changes only the function bodies marked STUB.
  */
object Multimodal {

  /** A media row: payload + typed metadata. The `media_kind`/`meta` pair is
    * the schema contract; payload stays opaque binary end-to-end so Spark
    * never copies it through row-format conversions it doesn't need.
    */
  case class MediaRow(doc_id: Long, media_kind: String, payload: Array[Byte])
  case class DecodedMeta(doc_id: Long, media_kind: String, n_bytes: Int,
                         width: Int, height: Int, channels: Int)

  /** Deterministic media table derived from `documents`: the text bytes act
    * as the opaque payload (a stand-in for real image bytes; same plumbing).
    */
  def mediaFromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_kind"),
      col("text").cast("binary").as("payload"))

  /** Decode metadata from the payload header.
    *
    * STUB: a real implementation would parse the container header (PNG IHDR
    * / WAV fmt / MP4 moov) via a codec library; this deterministic fake
    * derives plausible dimensions from the payload length so the schema and
    * plan shape are exercised. Column expressions only → codegen'd,
    * columnar, no serialization cliff.
    */
  def decodeMeta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"), col("media_kind"),
      length(col("payload")).as("n_bytes"),
      (length(col("payload")) % 640 + 16).as("width"),       // STUB dimensions
      (length(col("payload")) % 480 + 16).as("height"),      // STUB dimensions
      when(col("media_kind") === "image", 3).otherwise(1).as("channels"))

  /** Feature extraction over the payload: fixed-width float vector.
    *
    * STUB kernel: md5-prefix hash of byte slices instead of a CNN/fbank
    * feature (md5 rather than crc32 so the fake is reproducible in any
    * engine → DuckDB-oracle-able). The *shape* is the real thing: binary in
    * → Array[Float] out, one row per media item, pure column expressions
    * (at 100 TB this is the difference between a scan and a serialization
    * storm).
    */
  def extractFeatures(media: DataFrame, dims: Int = 8): DataFrame =
    media.select(
      col("doc_id"),
      array((0 until dims).map { i =>
        ((graft.functions.TextAnalysis.md5Prefix32(substring(col("payload"), i * 16 + 1, 16)) % 1000L)
          / lit(1000.0)).cast("float")
      }: _*).as("features"))

  /** Frame sampling: split the payload into `n` fixed-stride chunks ("frames")
    * and emit one row per sampled frame — the explode pattern a video
    * pipeline uses (sample → per-frame decode → per-frame features).
    */
  def sampleFrames(media: DataFrame, n: Int = 4): DataFrame = {
    val frameCols = (0 until n).map { i =>
      struct(lit(i).as("frame_no"),
        substring(col("payload"), i * 32 + 1, 32).as("frame"))
    }
    media.select(col("doc_id"), posexplode(array(frameCols: _*)))
      .select(col("doc_id"), col("col.frame_no").as("frame_no"),
        length(col("col.frame")).as("frame_bytes"),
        // md5-prefix frame fingerprint (engine-portable, unlike crc32)
        graft.functions.TextAnalysis.md5Prefix32(col("col.frame")).as("frame_fp"))
  }

  /** Little-endian hex encoding of the low `nBytes` bytes of an integer
    * column — the building block for writing fixed-header binary formats
    * with pure column expressions.
    */
  private def leHex(value: Column, nBytes: Int): Column =
    concat((0 until nBytes).map { k =>
      format_string("%02x", shiftright(value, 8 * k).bitwiseAND(lit(255L)).cast("int"))
    }: _*)

  /** Synthesize a REAL (spec-conformant) WAV file per document: 44-byte
    * RIFF/fmt/data header + 8-bit mono PCM at 8 kHz, built entirely from
    * column expressions (`unhex` over a composed hex string — no codec
    * jar). Sample count is 32 + doc_id % 33 and sample i is
    * (doc_id·31 + i·7) mod 256, so every field [[decodeWav]] parses is
    * independently recomputable by an oracle.
    */
  def synthesizeWav(documents: DataFrame): DataFrame = {
    val n = lit(32L) + col("doc_id") % 33
    val dataSize = n // 1 byte per sample (8-bit mono)
    val samplesHex = array_join(
      transform(sequence(lit(0L), n - 1), i =>
        format_string("%02x", ((col("doc_id") * 31 + i * 7) % 256).cast("int"))), "")
    val headerHex = concat(
      lit("52494646"),            // "RIFF"
      leHex(lit(36L) + dataSize, 4), // chunk size
      lit("57415645"),            // "WAVE"
      lit("666d7420"),            // "fmt "
      lit("10000000"),            // subchunk1 size = 16 (LE)
      lit("0100"),                // PCM format tag (LE uint16)
      lit("0100"),                // 1 channel
      lit("401f0000"),            // sample rate 8000 (LE uint32)
      lit("401f0000"),            // byte rate = rate · block align
      lit("0100"),                // block align 1
      lit("0800"),                // bits per sample 8
      lit("64617461"),            // "data"
      leHex(dataSize, 4))
    documents.select(col("doc_id"), unhex(concat(headerHex, samplesHex)).as("payload"))
  }

  /** REAL WAV decode — no stub: parses the RIFF/fmt/data header (magic
    * tags, channel count, sample rate, bit depth, data size — little-endian
    * multi-byte fields) and folds per-sample amplitude statistics from the
    * PCM bytes, all with built-in byte/hex expressions (`substr`/`hex`/
    * `conv`). Works on any 44-byte-header 8-bit-PCM WAV, not just
    * [[synthesizeWav]]'s output (MultimodalSpec feeds it a hand-built
    * fixture).
    *
    * This is the correctness reference for the codec seam: a production
    * deployment decodes compressed formats in [[decodeBatch]]'s
    * mapPartitions (native codec amortized per partition), but uncompressed
    * fixed-header formats genuinely decode at full scan speed this way —
    * per-row column expressions, no shuffle, no serialization cliff.
    *
    * @return (doc_id, valid_header, n_channels, sample_rate,
    *         bits_per_sample, n_samples, peak, amp_sum, mean_amp)
    */
  def decodeWav(media: DataFrame): DataFrame = {
    val p = col("payload")
    def byteAt(pos: Column): Column = conv(hex(p.substr(pos, lit(1))), 16, 10).cast("long")
    def leUint(pos: Int, nBytes: Int): Column =
      (0 until nBytes).map(k => byteAt(lit(pos + k)) * lit(1L << (8 * k))).reduce(_ + _)
    val dataSize = leUint(41, 4)
    val samples = transform(sequence(lit(0L), dataSize - 1), i => byteAt(lit(45) + i))
    // magic tags + a data section that actually fits the payload — a
    // truncated or foreign file degrades to guarded zeros, never garbage
    // stats or per-byte null propagation
    val valid =
      when(length(p) >= 45 &&
        p.substr(lit(1), lit(4)).cast("string") === "RIFF" &&
        p.substr(lit(9), lit(4)).cast("string") === "WAVE" &&
        p.substr(lit(37), lit(4)).cast("string") === "data" &&
        dataSize <= length(p) - 44 && dataSize > 0, 1L).otherwise(0L)
    media
      .select(
        col("doc_id"),
        valid.as("valid_header"),
        when(valid === 1, leUint(23, 2)).otherwise(0L).as("n_channels"),
        when(valid === 1, leUint(25, 4)).otherwise(0L).as("sample_rate"),
        when(valid === 1, leUint(35, 2)).otherwise(0L).as("bits_per_sample"),
        when(valid === 1, dataSize).otherwise(0L).as("n_samples"),
        when(valid === 1, array_max(samples)).otherwise(0L).as("peak"),
        when(valid === 1, aggregate(samples, lit(0L), (a, v) => a + v))
          .otherwise(0L).as("amp_sum"))
      .withColumn("mean_amp",
        when(col("n_samples") > 0,
          col("amp_sum").cast("double") / col("n_samples")).otherwise(lit(0.0)))
  }

  /** REAL feature extraction over decoded audio — an amplitude histogram
    * of the PCM sample stream (the classic first signal feature): each
    * 8-bit sample buckets into `bins` equal amplitude ranges, one output
    * row per (doc, bin). Unlike [[extractFeatures]]'s documented md5
    * stand-in, every number here is computed from actually-decoded sample
    * bytes; with [[synthesizeWav]] upstream the whole
    * synth → decode → featurize chain is oracle-recomputable.
    *
    * Pure map-side (sequence/filter/size over the payload bytes, then
    * posexplode) — no shuffle, no window.
    *
    * @param media frames with `doc_id` and a [[decodeWav]]-parseable
    *              `payload`
    * @return (doc_id, bin, bin_lo, n_in_bin)
    */
  def wavAmplitudeHistogram(media: DataFrame, bins: Int = 8): DataFrame = {
    require(bins > 0 && 256 % bins == 0, "bins must divide 256")
    val width = 256 / bins
    val p = col("payload")
    def byteAt(pos: Column): Column = conv(hex(p.substr(pos, lit(1))), 16, 10).cast("long")
    def leUint(pos: Int, nBytes: Int): Column =
      (0 until nBytes).map(k => byteAt(lit(pos + k)) * lit(1L << (8 * k))).reduce(_ + _)
    val dataSize = leUint(41, 4)
    val samples = transform(sequence(lit(0L), dataSize - 1), i => byteAt(lit(45) + i))
    val hist = array((0 until bins).map { b =>
      struct(lit(b).as("bin"), lit(b * width).as("bin_lo"),
        size(filter(samples, v =>
          v >= lit(b.toLong * width) && v < lit((b + 1).toLong * width)))
          .cast("long").as("n_in_bin"))
    }: _*)
    media.select(col("doc_id"), explode(hist).as("h"))
      .select(col("doc_id"), col("h.bin").as("bin"),
        col("h.bin_lo").as("bin_lo"), col("h.n_in_bin").as("n_in_bin"))
  }

  /** Synthesize a REAL binary PPM (P6) image per document — ASCII
    * `P6\n<w> <h>\n255\n` header followed by w·h RGB byte triples — again
    * from pure column expressions. Dimensions: w = 4 + doc_id % 5,
    * h = 3 + doc_id % 4; pixel byte k is (doc_id·17 + k·11) mod 256, so
    * every statistic [[decodePpm]] folds is oracle-recomputable.
    */
  def synthesizePpm(documents: DataFrame): DataFrame = {
    val w = lit(4L) + col("doc_id") % 5
    val h = lit(3L) + col("doc_id") % 4
    val nBytes = w * h * 3
    val header = concat(lit("P6\n"), w.cast("string"), lit(" "), h.cast("string"),
      lit("\n255\n")).cast("binary")
    val pixHex = array_join(
      transform(sequence(lit(0L), nBytes - 1), k =>
        format_string("%02x", ((col("doc_id") * 17 + k * 11) % 256).cast("int"))), "")
    documents.select(col("doc_id"), concat(header, unhex(pixHex)).as("payload"))
  }

  /** REAL PPM (P6) decode — the image sibling of [[decodeWav]]: parses the
    * ASCII header (magic, decimal width/height/maxval — variable length,
    * so the pixel offset is computed from the parsed digit widths, not
    * hardcoded) and folds per-channel byte sums over the interleaved RGB
    * payload. Binary-safe: only the header prefix is ever cast to string,
    * pixel bytes are sliced as binary.
    *
    * @return (doc_id, valid_magic, width, height, maxval, n_pixels,
    *         r_sum, g_sum, b_sum, mean_luma)
    */
  def decodePpm(media: DataFrame): DataFrame = {
    val p = col("payload")
    def byteAt(pos: Column): Column = conv(hex(p.substr(pos, lit(1))), 16, 10).cast("long")
    // header lives in the first ~16 bytes; ASCII region parses safely as UTF-8
    val head = p.substr(lit(1), lit(16)).cast("string")
    val wS = regexp_extract(head, "^P6\\n(\\d+) (\\d+)\\n(\\d+)\\n", 1)
    val hS = regexp_extract(head, "^P6\\n(\\d+) (\\d+)\\n(\\d+)\\n", 2)
    val mS = regexp_extract(head, "^P6\\n(\\d+) (\\d+)\\n(\\d+)\\n", 3)
    val parsed = media.select(
      col("doc_id"), p,
      when(wS =!= "", 1L).otherwise(0L).as("valid_magic"),
      when(wS =!= "", wS.cast("long")).otherwise(0L).as("width"),
      when(hS =!= "", hS.cast("long")).otherwise(0L).as("height"),
      when(mS =!= "", mS.cast("long")).otherwise(0L).as("maxval"),
      // "P6\n" + digits + " " + digits + "\n" + digits + "\n"
      (lit(3L) + length(wS) + 1 + length(hS) + 1 + length(mS) + 1).as("pix_off"))
    def chanSum(c: Int): Column =
      aggregate(
        transform(sequence(lit(0L), col("width") * col("height") - 1), i =>
          byteAt(col("pix_off") + i * 3 + c + 1)),
        lit(0L), (a, v) => a + v)
    parsed
      .select(col("doc_id"), col("valid_magic"), col("width"), col("height"), col("maxval"),
        (col("width") * col("height")).as("n_pixels"),
        when(col("valid_magic") === 1, chanSum(0)).otherwise(0L).as("r_sum"),
        when(col("valid_magic") === 1, chanSum(1)).otherwise(0L).as("g_sum"),
        when(col("valid_magic") === 1, chanSum(2)).otherwise(0L).as("b_sum"))
      .withColumn("mean_luma",
        when(col("n_pixels") > 0,
          (col("r_sum") + col("g_sum") + col("b_sum")).cast("double")
            / (col("n_pixels") * 3)).otherwise(lit(0.0)))
  }

  /** Synthesize a REAL plain-text PGM (P2) grayscale image per document —
    * the whole file is ASCII: `P2\n<w> <h>\n255\n` followed by w·h decimal
    * pixel values, one row of the raster per line, space-separated.
    * Dimensions: w = 3 + doc_id % 4, h = 2 + doc_id % 3; pixel k is
    * (doc_id·13 + k·7) mod 256 — every statistic [[decodePgm]] computes is
    * oracle-recomputable from the formula.
    */
  def synthesizePgm(documents: DataFrame): DataFrame = {
    val w = lit(3L) + col("doc_id") % 4
    val h = lit(2L) + col("doc_id") % 3
    val header = concat(lit("P2\n"), w.cast("string"), lit(" "), h.cast("string"),
      lit("\n255\n"))
    val raster = array_join(
      transform(sequence(lit(0L), h - 1), r =>
        array_join(
          transform(sequence(lit(0L), w - 1), c =>
            ((col("doc_id") * 13 + (r * w + c) * 7) % 256).cast("string")), " ")),
      "\n")
    documents.select(col("doc_id"),
      concat(header, raster, lit("\n")).cast("binary").as("payload"))
  }

  /** REAL plain-PGM (P2) decode — the third graduated decoder, and a
    * different parse problem from [[decodeWav]]/[[decodePpm]]: the pixel
    * region is ASCII decimal tokens of *variable* width, so the decoder
    * tokenizes on whitespace rather than slicing fixed byte offsets. The
    * whole payload is ASCII by format definition, so casting to string is
    * safe (unlike P6, where only the header prefix may be).
    *
    * Whole-file split + transform stays inside codegen'd column
    * expressions; per-row cost is O(bytes), map-side only, no shuffle.
    *
    * @return (doc_id, valid_magic, width, height, maxval, n_pixels,
    *         px_min, px_max, px_sum, mean_gray)
    */
  def decodePgm(media: DataFrame): DataFrame = {
    val s = col("payload").cast("string")
    val hdr = "^P2\\s+(\\d+)\\s+(\\d+)\\s+(\\d+)\\s"
    val wS = regexp_extract(s, hdr, 1)
    val ok = wS =!= ""
    // drop the three header tokens; what remains is exactly the raster
    val toks = filter(
      split(regexp_replace(s, hdr, ""), "\\s+"), t => t =!= "")
    val px = transform(toks, t => t.cast("long"))
    media.select(
      col("doc_id"),
      when(ok, 1L).otherwise(0L).as("valid_magic"),
      when(ok, wS.cast("long")).otherwise(0L).as("width"),
      when(ok, regexp_extract(s, hdr, 2).cast("long")).otherwise(0L).as("height"),
      when(ok, regexp_extract(s, hdr, 3).cast("long")).otherwise(0L).as("maxval"),
      when(ok, size(px).cast("long")).otherwise(0L).as("n_pixels"),
      when(ok, array_min(px)).otherwise(0L).as("px_min"),
      when(ok, array_max(px)).otherwise(0L).as("px_max"),
      when(ok, aggregate(px, lit(0L), (a, v) => a + v)).otherwise(0L).as("px_sum"))
      .withColumn("mean_gray",
        when(col("n_pixels") > 0,
          col("px_sum").cast("double") / col("n_pixels")).otherwise(lit(0.0)))
  }

  /** Otsu threshold (q168) over the corpus-wide grayscale histogram of
    * REAL-decoded PGM pixels — the classic binarization algorithm
    * (Otsu 1979): pick the cut t maximizing between-class variance
    * σ²_B(t) = ω₀ω₁(μ₀−μ₁)², the first actual computer-vision
    * computation on top of the decoder family (q84/q87/q135/q155 prove
    * the parsers; this consumes one).
    *
    * Exactness: with histogram counts, σ²_B(t) ∝ (s₀·N − w₀·S)² /
    * (w₀·(N−w₀)) — numerator and denominator are exact DECIMAL(38,0)
    * integers (the square reaches ~10²⁸ at sf0.1, past BIGINT), and the
    * single division to a double is IEEE-identical on both engines, so
    * the argmax (ties to the lower t) is hash-stable.
    *
    * Scale shape: pixel decode is map-side; the histogram map-combines
    * to ≤256 rows; every window after runs over the 256-bin table —
    * palette-bounded metadata, not corpus rows.
    *
    * @return one row: (threshold, w0, w1, n_pixels, between_var_scaled)
    */
  def otsuThreshold(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val s = col("payload").cast("string")
    val hdr = "^P2\\s+(\\d+)\\s+(\\d+)\\s+(\\d+)\\s"
    val toks = filter(split(regexp_replace(s, hdr, ""), "\\s+"), t => t =!= "")
    val px = media.select(explode(transform(toks, t => t.cast("long"))).as("v"))
    val hist = px.groupBy("v").agg(count(lit(1)).as("cnt"))
      .transform(graft.barrier) // read by the totals and the scan
    val tot = hist.agg(sum(col("cnt")).as("n"),
      sum(col("v") * col("cnt")).as("s"))
    // unpartitioned windows over the <= 256-value gray-level histogram
    // (GlobalWindowSpec-pinned), never the pixel stream
    val upTo = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    val cand = hist
      .withColumn("w0", sum(col("cnt")).over(upTo))
      .withColumn("s0", sum(col("v") * col("cnt")).over(upTo))
      .crossJoin(broadcast(tot))
      .where(col("w0") > 0 && col("w0") < col("n"))
      .withColumn("numr", dec(col("s0")) * dec(col("n")) - dec(col("w0")) * dec(col("s")))
      .withColumn("den", dec(col("w0")) * (dec(col("n")) - dec(col("w0"))))
      .withColumn("f", (col("numr") * col("numr")).cast("double")
        / col("den").cast("double"))
    cand
      .withColumn("rn", row_number().over(Window.orderBy(col("f").desc, col("v"))))
      .where(col("rn") === 1)
      .select(col("v").as("threshold"), col("w0"),
        (col("n") - col("w0")).as("w1"), col("n").as("n_pixels"),
        col("f").as("between_var_scaled"))
  }

  /** Synthesize a per-document FRAME SEQUENCE (a stand-in for decoded
    * video): nf = 3 + doc_id % 3 grayscale frames of w·h pixels
    * (w = 3 + doc_id % 4, h = 2 + doc_id % 3); frame f pixel k is
    * (doc_id·13 + f·29 + k·7) mod 256. Frame 2 of every 5th document is
    * replaced by an inverted frame (255 − pixel) — a planted hard cut
    * for [[sceneCuts]] to find.
    */
  def synthesizeFrameSeq(documents: DataFrame): DataFrame = {
    val w = lit(3L) + col("doc_id") % 4
    val h = lit(2L) + col("doc_id") % 3
    val nf = lit(3L) + col("doc_id") % 3
    val base = (f: Column, k: Column) => (col("doc_id") * 13 + f * 29 + k * 7) % 256
    documents.select(col("doc_id"), (w * h).as("n_pixels"),
      transform(sequence(lit(0L), nf - 1), f =>
        transform(sequence(lit(0L), w * h - 1), k =>
          when(f === 2 && col("doc_id") % 5 === 0, lit(255L) - base(f, k))
            .otherwise(base(f, k)))).as("frames"))
  }

  /** Scene-cut detection over a frame sequence — the temporal-media
    * kernel a video training pipeline runs after decode: per consecutive
    * frame pair, the summed absolute pixel difference (exact integers),
    * the mean per pixel (one double division), and a cut flag on the
    * integer predicate sum·4 > 255·2·n_pixels (mean |Δ| > 63.75 — half
    * the expected |Δ| of uncorrelated uniform bytes). Pure column
    * expressions over the frames array: map-side only, no shuffle, the
    * per-row cost is O(frames · pixels) exactly like a real differencing
    * kernel.
    *
    * @return (doc_id, frame_no [the LATER frame], sum_absdiff,
    *         n_pixels, mean_absdiff, is_cut)
    */
  def sceneCuts(frameSeq: DataFrame): DataFrame =
    frameSeq
      .select(col("doc_id"), col("n_pixels"),
        posexplode(transform(sequence(lit(1L), size(col("frames")).cast("long") - 1), f =>
          aggregate(
            zip_with(element_at(col("frames"), (f + 1).cast("int")),
              element_at(col("frames"), f.cast("int")),
              (a, b) => abs(a - b)),
            lit(0L), (acc, v) => acc + v))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("frame_no"),
        col("col").as("sum_absdiff"), col("n_pixels"))
      .withColumn("mean_absdiff",
        col("sum_absdiff").cast("double") / col("n_pixels"))
      .withColumn("is_cut",
        col("sum_absdiff") * 4 > col("n_pixels") * 510)

  /** Typed map<string,string> media properties — the one container type
    * (MapType) with no other graded coverage. Properties are derived
    * deterministically from the payload so the map *construction*,
    * key-listing, and value-lookup paths are all exercised and
    * oracle-recomputable. map_from_arrays/element_at/map_keys are all
    * codegen'd built-ins; no UDFs.
    */
  def mediaProps(media: DataFrame): DataFrame =
    media.select(col("doc_id"), col("media_kind"),
      map_from_arrays(
        array(lit("kind"), lit("bytes"), lit("parity")),
        array(col("media_kind"), length(col("payload")).cast("string"),
          when(length(col("payload")) % 2 === 0, "even").otherwise("odd"))
      ).as("props"))

  /** The mapPartitions seam where a real batch decoder binds (the JVM-side
    * analog of a vectorized pandas-UDF decode): payloads are processed a
    * partition at a time so a native decoder could amortize init per
    * partition, not per row.
    *
    * STUB kernel inside; the batching structure is the deliverable.
    */
  def decodeBatch(spark: SparkSession, media: DataFrame): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.select("doc_id", "media_kind", "payload").as[MediaRow]
      .mapPartitions { rows =>
        // real codec: initialize decoder context once per partition here
        rows.map { r =>
          val n = r.payload.length
          DecodedMeta(r.doc_id, r.media_kind, n, n % 640 + 16, n % 480 + 16,
            if (r.media_kind == "image") 3 else 1) // STUB decode
        }
      }
  }

  /** Synthesize a REAL (spec-conformant) 24-bit uncompressed BMP per
    * document: 54-byte BITMAPFILEHEADER+BITMAPINFOHEADER with little-
    * endian fields, pixel rows stored BOTTOM-UP and padded to 4-byte
    * boundaries (pad bytes 0xAA — a trap: any decoder that sums the raw
    * stream or miscomputes the stride reads them). w = 3 + doc_id % 3
    * (strides 12/12/16: both padded and unpadded rows occur),
    * h = 2 + doc_id % 2; pixel (x, y) has B = (doc_id·7 + x·3 + y·5),
    * G = (doc_id·11 + x·5 + y·3), R = (doc_id·13 + x·7 + y·11), each
    * mod 256 — every statistic [[decodeBmp]] emits is oracle-
    * recomputable from the formula.
    */
  def synthesizeBmp(documents: DataFrame): DataFrame = {
    val w = lit(3L) + col("doc_id") % 3
    val h = lit(2L) + col("doc_id") % 2
    val rowSize = expr("((3 * (3 + doc_id % 3) + 3) div 4) * 4")
    val imgSize = rowSize * h
    val headerHex = concat(
      lit("424d"), leHex(lit(54L) + imgSize, 4), lit("00000000"),
      leHex(lit(54L), 4), leHex(lit(40L), 4), leHex(w, 4), leHex(h, 4),
      lit("0100"), lit("1800"), lit("00000000"), leHex(imgSize, 4),
      leHex(lit(2835L), 4), leHex(lit(2835L), 4), lit("0000000000000000"))
    // file row r holds image row y = h−1−r (bottom-up), then stride pad
    val dataHex = array_join(
      transform(sequence(lit(0L), h - 1), r =>
        concat(
          array_join(
            transform(sequence(lit(0L), w - 1), x =>
              format_string("%02x%02x%02x",
                ((col("doc_id") * 7 + x * 3 + (h - 1 - r) * 5) % 256).cast("int"),
                ((col("doc_id") * 11 + x * 5 + (h - 1 - r) * 3) % 256).cast("int"),
                ((col("doc_id") * 13 + x * 7 + (h - 1 - r) * 11) % 256).cast("int"))),
            ""),
          repeat(lit("aa"), (rowSize - w * 3).cast("int")))),
      "")
    documents.select(col("doc_id"), concat(unhex(headerHex), unhex(dataHex)).as("payload"))
  }

  /** REAL BMP decode (q155) — the stride-aware sibling of [[decodePpm]]:
    * little-endian multi-byte header fields (like [[decodeWav]]), then
    * per-channel sums that must index pixel (x, y) at
    * data_offset + (h−1−y)·row_size + 3x — both the BOTTOM-UP row order
    * and the 4-byte row padding are load-bearing (`top_row_sum` grades
    * the flip: image row 0 lives at the END of the stream; the 0xAA pad
    * bytes grade the stride).
    *
    * @return (doc_id, valid_magic, width, height, bpp, row_size,
    *         b_sum, g_sum, r_sum, top_row_sum)
    */
  def decodeBmp(media: DataFrame): DataFrame = {
    val p = col("payload")
    def byteAt(pos: Column): Column = conv(hex(p.substr(pos, lit(1))), 16, 10).cast("long")
    def leUint(pos: Column, nBytes: Int): Column =
      (0 until nBytes).map(k => byteAt(pos + k) * lit(1L << (8 * k))).reduce(_ + _)
    val valid = when(length(p) >= 54 &&
      p.substr(lit(1), lit(2)).cast("string") === "BM" &&
      leUint(lit(29), 2) === 24, 1L).otherwise(0L)
    val parsed = media.select(col("doc_id"), p, valid.as("valid_magic"),
      when(valid === 1, leUint(lit(11), 4)).otherwise(0L).as("data_off"),
      when(valid === 1, leUint(lit(19), 4)).otherwise(0L).as("width"),
      when(valid === 1, leUint(lit(23), 4)).otherwise(0L).as("height"),
      when(valid === 1, leUint(lit(29), 2)).otherwise(0L).as("bpp"))
      .withColumn("row_size", expr("((3 * width + 3) div 4) * 4"))
    def chanSum(c: Int): Column =
      aggregate(
        transform(sequence(lit(0L), col("width") * col("height") - 1), i =>
          byteAt(col("data_off")
            + (col("height") - 1 - floor(i / col("width")).cast("long")) * col("row_size")
            + (i % col("width")) * 3 + c + 1)),
        lit(0L), (a, v) => a + v)
    // image row 0 (the TOP of the picture) is the LAST file row: summing
    // all three channels over it grades the bottom-up flip specifically
    val topRowSum = aggregate(
      transform(sequence(lit(0L), col("width") * 3 - 1), k =>
        byteAt(col("data_off") + (col("height") - 1) * col("row_size") + k + 1)),
      lit(0L), (a, v) => a + v)
    parsed.select(col("doc_id"), col("valid_magic"), col("width"), col("height"),
      col("bpp"), col("row_size"),
      when(col("valid_magic") === 1, chanSum(0)).otherwise(0L).as("b_sum"),
      when(col("valid_magic") === 1, chanSum(1)).otherwise(0L).as("g_sum"),
      when(col("valid_magic") === 1, chanSum(2)).otherwise(0L).as("r_sum"),
      when(col("valid_magic") === 1, topRowSum).otherwise(0L).as("top_row_sum"))
  }

  /** Frame-level zero-crossing rate + energy (q223) over REAL PCM bytes —
    * the first DSP features any audio pipeline computes (ZCR separates
    * voiced/unvoiced/noise; energy gates silence), emitted one row per
    * 16-sample frame so downstream windows see a time axis. 8-bit PCM
    * centers at 128: a crossing is a sign flip of (s − 128) between
    * consecutive samples WITHIN the frame; energy is Σ|s − 128|. The
    * q84 header machinery validates the RIFF/data layout; byte probes
    * are pure substr/hex/conv expressions (≤ 31 per frame row).
    *
    * Scale shape: explode to ≤ ⌈n/16⌉ frame rows per clip, everything
    * else map-side — no shuffle at any corpus size.
    *
    * @return (doc_id, frame_idx, n_in_frame, zero_crossings, energy)
    */
  def wavZcr(media: DataFrame, frame: Int = 16): DataFrame = {
    val p = col("payload")
    def byteAt(pos: Column): Column =
      conv(hex(p.substr(pos.cast("int"), lit(1))), 16, 10).cast("long")
    def leUint(pos: Int, nBytes: Int): Column =
      (0 until nBytes).map(k => byteAt(lit(pos + k)) * lit(1L << (8 * k))).reduce(_ + _)
    val dataSize = leUint(41, 4)
    val valid =
      when(length(p) >= 45 &&
        p.substr(lit(1), lit(4)).cast("string") === "RIFF" &&
        p.substr(lit(9), lit(4)).cast("string") === "WAVE" &&
        p.substr(lit(37), lit(4)).cast("string") === "data" &&
        dataSize <= length(p) - 44 && dataSize > 0, 1L).otherwise(0L)
    val parsed = media.select(col("doc_id"), p,
        when(valid === 1, dataSize).otherwise(0L).as("data_size"))
      .where(col("data_size") > 0)
      .withColumn("n_frames",
        expr(s"(data_size + ${frame - 1}) div $frame"))
    def sgn(k: Column): Column = byteAt(lit(45L) + k) >= 128L
    parsed
      .select(col("doc_id"), p, col("data_size"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("start", col("frame_idx") * frame)
      .withColumn("n_in_frame",
        least(lit(frame.toLong), col("data_size") - col("start")))
      .withColumn("zero_crossings",
        when(col("n_in_frame") >= 2,
          aggregate(
            transform(sequence(lit(0L), col("n_in_frame") - 2), k =>
              when(sgn(col("start") + k) =!= sgn(col("start") + k + 1), 1L)
                .otherwise(0L)),
            lit(0L), (a, v) => a + v)).otherwise(0L))
      .withColumn("energy",
        aggregate(
          transform(sequence(lit(0L), col("n_in_frame") - 1), k =>
            abs(byteAt(lit(45L) + col("start") + k) - 128L)),
          lit(0L), (a, v) => a + v))
      .select(col("doc_id"), col("frame_idx"), col("n_in_frame"),
        col("zero_crossings"), col("energy"))
  }

  /** Perceptual average-hash (aHash, q246) over REAL P2 pixels — the
    * second image near-dup signature beside [[imageDhash]]'s gradient
    * bits: bit k is "pixel k brighter than the image mean", which
    * catches global-structure duplicates dHash's local gradients can
    * miss (and vice versa — production image dedup runs both). The
    * mean compare is EXACT by cross-multiplication: bit k = px_k·n >
    * Σpx (no float mean, no rounding), so the hash is deterministic on
    * both engines; images here are ≤ 6×4, so the full-raster hash fits
    * a BIGINT with room to spare (at a fixed 8×8 downsample grid the
    * same expression caps at 64 bits — the production shape).
    *
    * Map-side only: the [[decodePgm]] tokenizer feeds a codegen'd
    * higher-order fold; no UDF, no shuffle.
    *
    * @return (doc_id, n_pixels, px_sum, ahash)
    */
  def imageAhash(media: DataFrame): DataFrame = {
    val s = col("payload").cast("string")
    val hdr = "^P2\\s+(\\d+)\\s+(\\d+)\\s+(\\d+)\\s"
    val toks = filter(split(regexp_replace(s, hdr, ""), "\\s+"), t => t =!= "")
    val px = transform(toks, t => t.cast("long"))
    media.select(col("doc_id"), px.as("px"))
      // lambda-inlining stop (the package-doc barrier rationale): the
      // per-bit fold reads px per ELEMENT, and CollapseProject would
      // otherwise inline the tokenizer into every probe — O(pixels²)
      .transform(graft.barrier)
      .withColumn("n_pixels", size(col("px")).cast("long"))
      .withColumn("px_sum", aggregate(col("px"), lit(0L), (a, v) => a + v))
      .withColumn("ahash", expr(
        """aggregate(transform(sequence(0, CAST(n_pixels - 1 AS INT)), k ->
          CASE WHEN element_at(px, k + 1) * n_pixels > px_sum
          THEN shiftleft(CAST(1 AS BIGINT), k) ELSE CAST(0 AS BIGINT) END),
          CAST(0 AS BIGINT), (a, v) -> a + v)"""))
      .select(col("doc_id"), col("n_pixels"), col("px_sum"), col("ahash"))
  }

  /** Perceptual difference-hash (dHash, q210) over REAL P6 bytes — the
    * image-side near-duplicate signature completing the dedup bridge:
    * text gets MinHash/SimHash, images get a gradient hash. The
    * grayscale image is nearest-neighbor-sampled onto a fixed 4×4 luma
    * grid (grid cell (i,j) reads the decoded pixel at row ⌊i·h/4⌋, col
    * ⌊j·w/4⌋ — resolution-independent, so re-encoded/rescaled copies of
    * the same picture collide), then hashed as 12 horizontal
    * gradient bits (g(i,j+1) > g(i,j), bit i·3+j) and 12 vertical ones
    * (g(i+1,j) > g(i,j), bit i·4+j). All byte slicing is real binary
    * parsing (the q87 header machinery); the DuckDB oracle re-derives
    * the same pixels from the synthesizer's generative formula — the
    * q168 grading pattern.
    *
    * Scale shape: pure map-side per-row expressions (header parse + 48
    * byte probes per image regardless of image size); the hash is a
    * codegen'd higher-order fold, no UDF, no shuffle.
    *
    * @return (doc_id, width, height, dhash_h, dhash_v)
    */
  def imageDhash(media: DataFrame): DataFrame = {
    val head = col("payload").substr(lit(1), lit(16)).cast("string")
    val wS = regexp_extract(head, "^P6\\n(\\d+) (\\d+)\\n(\\d+)\\n", 1)
    val hS = regexp_extract(head, "^P6\\n(\\d+) (\\d+)\\n(\\d+)\\n", 2)
    val mS = regexp_extract(head, "^P6\\n(\\d+) (\\d+)\\n(\\d+)\\n", 3)
    val parsed = media.select(col("doc_id"), col("payload"),
      when(wS =!= "", 1L).otherwise(0L).as("valid_magic"),
      when(wS =!= "", wS.cast("long")).otherwise(lit(1L)).as("width"),
      when(hS =!= "", hS.cast("long")).otherwise(lit(1L)).as("height"),
      (lit(3L) + length(wS) + 1 + length(hS) + 1 + length(mS) + 1).as("pix_off"))
    // luma of grid cell (i, j) straight off the payload bytes
    def lumaSql(i: String, j: String): String = {
      val k = s"(((($i) * height div 4) * width + (($j) * width div 4)) * 3)"
      def b(o: Int) =
        s"CAST(conv(hex(substring(payload, CAST(pix_off + $k + $o AS INT), 1)), 16, 10) AS BIGINT)"
      s"(${b(1)} + ${b(2)} + ${b(3)})"
    }
    def gradBits(n: Int, iOf: String, jOf: String, di: Int, dj: Int): Column =
      expr(s"""aggregate(transform(sequence(0, ${n - 1}), idx ->
        CASE WHEN ${lumaSql(s"($iOf) + $di", s"($jOf) + $dj")} > ${lumaSql(iOf, jOf)}
        THEN shiftleft(CAST(1 AS BIGINT), idx) ELSE CAST(0 AS BIGINT) END),
        CAST(0 AS BIGINT), (a, v) -> a + v)""")
    parsed.select(col("doc_id"), col("width"), col("height"),
      when(col("valid_magic") === 1,
        gradBits(12, "idx div 3", "idx % 3", 0, 1)).otherwise(0L).as("dhash_h"),
      when(col("valid_magic") === 1,
        gradBits(12, "idx div 4", "idx % 4", 1, 0)).otherwise(0L).as("dhash_v"))
  }
}
