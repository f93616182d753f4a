package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val media = Multimodal.mediaFromDocuments(Tables.documents(spark, TestSpark.sf))

  test("decodeMeta (columnar) and decodeBatch (mapPartitions seam) agree") {
    val viaExpr = Multimodal.decodeMeta(media)
      .select("doc_id", "n_bytes", "width", "height", "channels")
      .as[(Long, Int, Int, Int, Int)].collect().toSet
    val viaBatch = Multimodal.decodeBatch(spark, media)
      .map(d => (d.doc_id, d.n_bytes, d.width, d.height, d.channels))
      .collect().toSet
    assert(viaExpr === viaBatch)
  }

  test("extractFeatures yields fixed-width unit-range vectors") {
    val feats = Multimodal.extractFeatures(media).as[(Long, Seq[Float])].collect()
    assert(feats.forall(_._2.length === 8))
    assert(feats.forall(_._2.forall(f => f >= 0.0f && f < 1.0f)))
  }

  test("sampleFrames emits n frames per media item") {
    val n = media.count()
    val frames = Multimodal.sampleFrames(media, n = 4)
    assert(frames.count() === n * 4)
    assert(frames.columns.toSet === Set("doc_id", "frame_no", "frame_bytes", "frame_fp"))
  }

  test("decodeWav parses a hand-built WAV fixture byte-for-byte") {
    // 44-byte RIFF header + 4 samples [0, 128, 255, 64], built by hand with
    // java.nio — independent of synthesizeWav, so a bug shared by synth and
    // decode can't cancel out
    val samples = Array[Int](0, 128, 255, 64)
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(8000).putInt(8000) // sample rate, byte rate
      .putShort(1) // block align
      .putShort(8) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(samples.length)
    samples.foreach(s => bb.put(s.toByte))

    val r = Multimodal.decodeWav(Seq((7L, bb.array())).toDF("doc_id", "payload"))
      .collect().head
    assert(r.getAs[Long]("valid_header") === 1L)
    assert(r.getAs[Long]("n_channels") === 1L)
    assert(r.getAs[Long]("sample_rate") === 8000L)
    assert(r.getAs[Long]("bits_per_sample") === 8L)
    assert(r.getAs[Long]("n_samples") === 4L)
    assert(r.getAs[Long]("peak") === 255L)
    assert(r.getAs[Long]("amp_sum") === (0L + 128 + 255 + 64))
    assert(r.getAs[Double]("mean_amp") === (0.0 + 128 + 255 + 64) / 4)
    // a corrupted magic tag must flunk the header check
    val bad = bb.array().clone(); bad(0) = 'X'.toByte
    // a truncated file (data size pointing past the payload) must too,
    // degrading to guarded zeros rather than garbage stats
    val short = bb.array().take(46)
    val rb = Multimodal.decodeWav(
      Seq((8L, bad), (9L, short)).toDF("doc_id", "payload")).collect()
      .map(row => row.getAs[Long]("doc_id") -> row).toMap
    assert(rb(8L).getAs[Long]("valid_header") === 0L)
    assert(rb(9L).getAs[Long]("valid_header") === 0L)
    assert(rb(9L).getAs[Long]("amp_sum") === 0L && rb(9L).getAs[Double]("mean_amp") === 0.0)
  }

  test("synthesizeWav → decodeWav roundtrip matches the synthesis formula") {
    val docs = Tables.documents(spark, TestSpark.sf).select("doc_id").limit(50)
    val decoded = Multimodal.decodeWav(Multimodal.synthesizeWav(docs))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(decoded.nonEmpty)
    decoded.foreach { case (id, r) =>
      val n = 32 + id % 33
      val smp = (0L until n).map(i => (id * 31 + i * 7) % 256)
      assert(r.getAs[Long]("valid_header") === 1L)
      assert(r.getAs[Long]("sample_rate") === 8000L)
      assert(r.getAs[Long]("n_samples") === n)
      assert(r.getAs[Long]("peak") === smp.max)
      assert(r.getAs[Long]("amp_sum") === smp.sum)
    }
  }

  test("decodePpm parses hand-built P6 fixtures, including multi-digit dimensions") {
    // 2×1 image: pixels (10,20,30) and (40,50,60)
    val small = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Int](10, 20, 30, 40, 50, 60).map(_.toByte)
    // 12×3 image exercises the variable-length header parse (two-digit w)
    val px = (0 until 12 * 3 * 3).map(k => (k * 13 + 5) % 256)
    val big = "P6\n12 3\n255\n".getBytes("US-ASCII") ++ px.map(_.toByte).toArray
    val bad = small.clone(); bad(0) = 'X'.toByte

    val r = Multimodal.decodePpm(
      Seq((1L, small), (2L, big), (3L, bad)).toDF("doc_id", "payload"))
      .collect().map(row => row.getAs[Long]("doc_id") -> row).toMap
    assert(r(1L).getAs[Long]("valid_magic") === 1L)
    assert(r(1L).getAs[Long]("width") === 2L && r(1L).getAs[Long]("height") === 1L)
    assert(r(1L).getAs[Long]("maxval") === 255L)
    assert(r(1L).getAs[Long]("r_sum") === 50L) // 10 + 40
    assert(r(1L).getAs[Long]("g_sum") === 70L) // 20 + 50
    assert(r(1L).getAs[Long]("b_sum") === 90L) // 30 + 60
    assert(r(1L).getAs[Double]("mean_luma") === 210.0 / 6)
    assert(r(2L).getAs[Long]("width") === 12L && r(2L).getAs[Long]("height") === 3L)
    assert(r(2L).getAs[Long]("n_pixels") === 36L)
    assert(r(2L).getAs[Long]("r_sum") === px.grouped(3).map(_.head).sum.toLong)
    assert(r(2L).getAs[Long]("b_sum") === px.grouped(3).map(_.last).sum.toLong)
    assert(r(3L).getAs[Long]("valid_magic") === 0L)
  }

  test("synthesizePpm → decodePpm roundtrip matches the synthesis formula") {
    val docs = Tables.documents(spark, TestSpark.sf).select("doc_id").limit(40)
    val decoded = Multimodal.decodePpm(Multimodal.synthesizePpm(docs))
      .collect().map(row => row.getAs[Long]("doc_id") -> row).toMap
    assert(decoded.nonEmpty)
    decoded.foreach { case (id, row) =>
      val (w, h) = (4 + id % 5, 3 + id % 4)
      val bytes = (0L until w * h * 3).map(k => (id * 17 + k * 11) % 256)
      assert(row.getAs[Long]("valid_magic") === 1L)
      assert(row.getAs[Long]("width") === w && row.getAs[Long]("height") === h)
      assert(row.getAs[Long]("r_sum") === bytes.grouped(3).map(_.head).sum)
      assert(row.getAs[Long]("g_sum") === bytes.grouped(3).map(_(1)).sum)
    }
  }

  test("wavAmplitudeHistogram buckets the decoded samples exactly") {
    // reuse the hand-built WAV shape: samples [0, 128, 255, 64]
    val samples = Array[Int](0, 128, 255, 64)
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(samples.length)
    samples.foreach(s => bb.put(s.toByte))

    val hist = Multimodal.wavAmplitudeHistogram(
      Seq((1L, bb.array())).toDF("doc_id", "payload"))
      .collect().map(r => r.getAs[Int]("bin") -> r.getAs[Long]("n_in_bin")).toMap
    // 0 → bin 0, 64 → bin 2, 128 → bin 4, 255 → bin 7
    assert(hist === Map(0 -> 1L, 1 -> 0L, 2 -> 1L, 3 -> 0L,
      4 -> 1L, 5 -> 0L, 6 -> 0L, 7 -> 1L))
    // every synthesized doc's histogram sums to its sample count
    val docs = Tables.documents(spark, TestSpark.sf).select("doc_id").limit(30)
    val sums = Multimodal.wavAmplitudeHistogram(Multimodal.synthesizeWav(docs))
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.sum("n_in_bin").as("total"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("total")).toMap
    sums.foreach { case (id, total) => assert(total === 32 + id % 33) }
  }

  test("decodePgm parses hand-built plain-P2 fixtures with variable-width tokens") {
    // 3×2 image with 1-, 2-, and 3-digit pixel tokens on ragged lines —
    // the tokenizer must not care about line structure or token width
    val small = "P2\n3 2\n255\n7 42 255\n0 19 200\n".getBytes("US-ASCII")
    // header tolerant of extra whitespace between tokens
    val spaced = "P2\n10 2\n99\n".getBytes("US-ASCII") ++
      (0 until 20).map(_ % 100).mkString("  ", " ", "\n").getBytes("US-ASCII")
    val bad = small.clone(); bad(1) = '6'.toByte // P6 ≠ plain PGM

    val r = Multimodal.decodePgm(
      Seq((1L, small), (2L, spaced), (3L, bad)).toDF("doc_id", "payload"))
      .collect().map(row => row.getAs[Long]("doc_id") -> row).toMap
    assert(r(1L).getAs[Long]("valid_magic") === 1L)
    assert(r(1L).getAs[Long]("width") === 3L && r(1L).getAs[Long]("height") === 2L)
    assert(r(1L).getAs[Long]("maxval") === 255L)
    assert(r(1L).getAs[Long]("n_pixels") === 6L)
    assert(r(1L).getAs[Long]("px_min") === 0L && r(1L).getAs[Long]("px_max") === 255L)
    assert(r(1L).getAs[Long]("px_sum") === (7 + 42 + 255 + 0 + 19 + 200).toLong)
    assert(r(1L).getAs[Double]("mean_gray") === 523.0 / 6)
    assert(r(2L).getAs[Long]("width") === 10L && r(2L).getAs[Long]("maxval") === 99L)
    assert(r(2L).getAs[Long]("px_sum") === (0 until 20).map(_ % 100).sum.toLong)
    assert(r(3L).getAs[Long]("valid_magic") === 0L)
  }

  test("otsuThreshold: bimodal fixture cuts at the low mode with exact variance ratio") {
    // pixels {0,0,0,255,255}: the only candidate cut is v=0 (v=255 has
    // w0=n). numr = 0*5 - 3*510 = -1530; f = 1530^2 / (3*2) = 390150
    val payload = "P2\n5 1\n255\n0 0 0 255 255\n".getBytes("US-ASCII")
    val r = Multimodal.otsuThreshold(Seq((1L, payload)).toDF("doc_id", "payload"))
      .collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("threshold") === 0L)
    assert(row.getAs[Long]("w0") === 3L && row.getAs[Long]("w1") === 2L)
    assert(row.getAs[Long]("n_pixels") === 5L)
    assert(row.getAs[Double]("between_var_scaled") === 1530.0 * 1530.0 / 6.0)
    // real corpus: a single in-range cut with both classes populated
    val real = Multimodal.otsuThreshold(
      Multimodal.synthesizePgm(Tables.documents(spark, TestSpark.sf))).collect()
    assert(real.length === 1)
    val t = real.head
    assert(t.getAs[Long]("threshold") >= 0L && t.getAs[Long]("threshold") < 255L)
    assert(t.getAs[Long]("w0") + t.getAs[Long]("w1") === t.getAs[Long]("n_pixels"))
    assert(t.getAs[Double]("between_var_scaled") > 0.0)
  }

  test("synthesizePgm → decodePgm roundtrip matches the synthesis formula") {
    val docs = Tables.documents(spark, TestSpark.sf).select("doc_id").limit(40)
    val decoded = Multimodal.decodePgm(Multimodal.synthesizePgm(docs))
      .collect().map(row => row.getAs[Long]("doc_id") -> row).toMap
    assert(decoded.nonEmpty)
    decoded.foreach { case (id, row) =>
      val (w, h) = (3 + id % 4, 2 + id % 3)
      val px = (0L until w * h).map(k => (id * 13 + k * 7) % 256)
      assert(row.getAs[Long]("valid_magic") === 1L)
      assert(row.getAs[Long]("width") === w && row.getAs[Long]("height") === h)
      assert(row.getAs[Long]("n_pixels") === w * h)
      assert(row.getAs[Long]("px_min") === px.min && row.getAs[Long]("px_max") === px.max)
      assert(row.getAs[Long]("px_sum") === px.sum)
    }
  }

  test("mediaProps builds a 3-key map whose lookups match the source columns") {
    import org.apache.spark.sql.functions._
    val media = Multimodal.mediaFromDocuments(
      Tables.documents(spark, TestSpark.sf).limit(30))
    val props = Multimodal.mediaProps(media).select("doc_id", "props")
    val joined = props.join(media, "doc_id")
    assert(joined.where(size(map_keys(col("props"))) =!= 3).count() === 0L)
    assert(joined.where(
      element_at(col("props"), "kind") =!= col("media_kind")).count() === 0L)
    assert(joined.where(
      element_at(col("props"), "bytes").cast("long") =!= length(col("payload"))
    ).count() === 0L)
  }

  test("sceneCuts flags exactly the planted inverted frames") {
    import org.apache.spark.sql.functions._
    // hand fixture: identical pair (no cut), full-inversion pair (cut)
    val manual = Seq((1L, 2L, Seq(Seq(10L, 20L), Seq(10L, 20L), Seq(245L, 235L))))
      .toDF("doc_id", "n_pixels", "frames")
    val m = Multimodal.sceneCuts(manual).collect()
      .map(r => r.getAs[Long]("frame_no") -> r).toMap
    assert(m(1L).getAs[Long]("sum_absdiff") === 0L && !m(1L).getAs[Boolean]("is_cut"))
    assert(m(2L).getAs[Long]("sum_absdiff") === 450L) // |245-10| + |235-20|
    assert(m(2L).getAs[Boolean]("is_cut")) // 450·4 > 2·510
    assert(m(2L).getAs[Double]("mean_absdiff") === 225.0)

    // synthesized: doc 0 (≡0 mod 5) has the inverted frame 2 → its pair
    // (1→2) must cut; the smooth pair (0→1) must not
    val cuts = Multimodal.sceneCuts(Multimodal.synthesizeFrameSeq(
      Seq(0L, 1L).toDF("doc_id"))).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_no")) ->
        r.getAs[Boolean]("is_cut")).toMap
    assert(!cuts((0L, 1L)) && cuts((0L, 2L)))
    assert(cuts.filterKeys(_._1 == 1L).forall(!_._2)) // doc 1: no inversion
  }

  test("decodeBmp parses a hand-built 24-bit BMP: stride padding and bottom-up rows") {
    // 2x2 image, rowSize = 8 (2 pad bytes of 0xEE per row — summing the
    // raw stream or using stride 6 changes every sum). Stored BOTTOM-UP:
    // file row 0 = image row y=1. Pixels (B,G,R):
    //   y=0: (1,2,3) (4,5,6)   y=1: (7,8,9) (10,11,12)
    val w = 2; val h = 2; val rowSize = 8
    val bb = java.nio.ByteBuffer.allocate(54 + rowSize * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * h)
      .putInt(0).putInt(54) // reserved, data offset
      .putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24) // planes, bpp
      .putInt(0).putInt(rowSize * h) // compression, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    // file row 0 (image y=1), then pad; file row 1 (image y=0), then pad
    Seq(7, 8, 9, 10, 11, 12).foreach(v => bb.put(v.toByte))
    bb.put(0xEE.toByte).put(0xEE.toByte)
    Seq(1, 2, 3, 4, 5, 6).foreach(v => bb.put(v.toByte))
    bb.put(0xEE.toByte).put(0xEE.toByte)

    val r = Multimodal.decodeBmp(Seq((9L, bb.array())).toDF("doc_id", "payload"))
      .collect().head
    assert(r.getAs[Long]("valid_magic") === 1L)
    assert(r.getAs[Long]("width") === 2L && r.getAs[Long]("height") === 2L)
    assert(r.getAs[Long]("bpp") === 24L && r.getAs[Long]("row_size") === 8L)
    assert(r.getAs[Long]("b_sum") === (1 + 4 + 7 + 10))
    assert(r.getAs[Long]("g_sum") === (2 + 5 + 8 + 11))
    assert(r.getAs[Long]("r_sum") === (3 + 6 + 9 + 12))
    // image row 0 = the LAST file row: 1+2+3+4+5+6 (bottom-up proof)
    assert(r.getAs[Long]("top_row_sum") === 21L)
  }

  test("synthesizeBmp → decodeBmp roundtrip matches the synthesis formula") {
    val docs = Tables.documents(spark, TestSpark.sf).limit(20)
    val r = Multimodal.decodeBmp(Multimodal.synthesizeBmp(docs)).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val d = x.getAs[Long]("doc_id")
      val w = 3 + d % 3; val h = 2 + d % 2
      assert(x.getAs[Long]("valid_magic") === 1L)
      assert(x.getAs[Long]("width") === w && x.getAs[Long]("height") === h)
      val cells = for (y <- 0L until h; xx <- 0L until w) yield (xx, y)
      assert(x.getAs[Long]("b_sum") ===
        cells.map { case (xx, y) => (d * 7 + xx * 3 + y * 5) % 256 }.sum)
      assert(x.getAs[Long]("r_sum") ===
        cells.map { case (xx, y) => (d * 13 + xx * 7 + y * 11) % 256 }.sum)
      assert(x.getAs[Long]("top_row_sum") ===
        (0L until w).map(xx => (d * 7 + xx * 3) % 256
          + (d * 11 + xx * 5) % 256 + (d * 13 + xx * 7) % 256).sum)
    }
  }

  test("documents text is pure ASCII (oracle contract: byte slices = char slices)") {
    // the q43/q44 DuckDB twins slice VARCHAR where Spark slices binary —
    // only sound while octet_length == char length on every row
    import org.apache.spark.sql.functions._
    val nonAscii = Tables.documents(spark, TestSpark.sf)
      .where(length(col("text").cast("binary")) =!= length(col("text"))).count()
    assert(nonAscii === 0L)
  }

  test("wavZcr: frame crossings and energy from a hand-built alternating PCM") {
    // 20 samples alternating 200, 50 around the 128 center: every
    // consecutive pair flips sign → 15 crossings in the full frame,
    // 3 in the 4-sample tail; energy per pair = 72 + 78
    val samples = Array.tabulate(20)(k => if (k % 2 == 0) 200 else 50)
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(8000).putInt(8000)
      .putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(samples.length)
    samples.foreach(s => bb.put(s.toByte))
    val r = Multimodal.wavZcr(Seq((7L, bb.array())).toDF("doc_id", "payload"))
      .collect().map(x => x.getAs[Long]("frame_idx") ->
        (x.getAs[Long]("n_in_frame"), x.getAs[Long]("zero_crossings"),
          x.getAs[Long]("energy"))).toMap
    assert(r(0L) === ((16L, 15L, 8 * 72L + 8 * 78L)))
    assert(r(1L) === ((4L, 3L, 2 * 72L + 2 * 78L)))
  }

  test("imageDhash: gradient bits from a hand-built P6 ramp") {
    // 4×4 image, channels (c·10, 0, 0) for column c: luma strictly
    // increases left→right (all 12 horizontal bits set) and is constant
    // down each column (no vertical bit set)
    val ramp = "P6\n4 4\n255\n".getBytes("US-ASCII") ++
      (0 until 16).flatMap(k => Seq((k % 4) * 10, 0, 0)).map(_.toByte)
    // 4×1 image with luma 0,0,90,0: grid rows all sample the single
    // pixel row → horizontal bits only where col 2 > col 1 / col 3 < col 2
    val strip = "P6\n4 1\n255\n".getBytes("US-ASCII") ++
      Seq(0, 0, 0, 0, 0, 0, 30, 30, 30, 0, 0, 0).map(_.toByte)
    val bad = "X6\n4 1\n255\n".getBytes("US-ASCII")
    val r = Multimodal.imageDhash(
      Seq((1L, ramp), (2L, strip), (3L, bad)).toDF("doc_id", "payload"))
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("dhash_h"), x.getAs[Long]("dhash_v"))).toMap
    assert(r(1L) === ((4095L, 0L))) // all 12 horizontal gradients rise
    // per grid row: only j=1 (bit offset 1) has g(i,2) > g(i,1):
    // bits 1, 4, 7, 10 → 2 + 16 + 128 + 1024
    assert(r(2L) === ((1170L, 0L)))
    assert(r(3L) === ((0L, 0L)))   // invalid magic → zero hash
  }

  test("imageAhash: cross-multiplied mean bits on hand-built P2 bytes") {
    import spark.implicits._
    // pixels 10 10 10 100: sum 130, n 4 -> bit k iff px*4 > 130
    val media = Seq((1L, "P2\n2 2\n255\n10 10 10 100\n".getBytes("US-ASCII")))
      .toDF("doc_id", "payload")
    val r = graft.sources.Multimodal.imageAhash(media).collect().head
    assert(r.getAs[Long]("n_pixels") === 4L)
    assert(r.getAs[Long]("px_sum") === 130L)
    assert(r.getAs[Long]("ahash") === 8L) // only bit 3 (the 100)
    // constant image: no pixel strictly exceeds the mean -> hash 0
    val flat = Seq((2L, "P2\n2 1\n255\n7 7\n".getBytes("US-ASCII")))
      .toDF("doc_id", "payload")
    assert(graft.sources.Multimodal.imageAhash(flat).collect()
      .head.getAs[Long]("ahash") === 0L)
    // real synthesized corpus: deterministic, hash fits the raster width
    val docs = Tables.documents(spark, TestSpark.sf)
    val real = graft.sources.Multimodal.imageAhash(
      graft.sources.Multimodal.synthesizePgm(docs)).collect()
    assert(real.forall { x =>
      x.getAs[Long]("ahash") >= 0L &&
        x.getAs[Long]("ahash") < (1L << x.getAs[Long]("n_pixels").toInt)
    })
  }
}
