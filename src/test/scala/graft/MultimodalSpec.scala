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

  test("documents text is pure ASCII (oracle contract: byte slices = char slices)") {
    // the q43/q44 DuckDB twins slice VARCHAR where Spark slices binary —
    // only sound while octet_length == char length on every row
    import org.apache.spark.sql.functions._
    val nonAscii = Tables.documents(spark, TestSpark.sf)
      .where(length(col("text").cast("binary")) =!= length(col("text"))).count()
    assert(nonAscii === 0L)
  }
}
