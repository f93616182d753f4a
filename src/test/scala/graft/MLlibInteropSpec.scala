package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis
import graft.operators.Dedup

/** Cross-validation of graft's native MinHash+LSH dedup against MLlib's
  * MinHashLSH (the "Structured Streaming + MLlib" approach of the north
  * star): both must surface the planted near-duplicates and neither may
  * pair the unrelated document.
  */
class MLlibInteropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "spark catalyst optimizer pushes filters below joins and prunes columns " +
    "for parquet scans while tungsten generates compact bytecode for each stage"
  private val docs = Seq(
    (0L, base),
    (1L, base.replace("compact", "efficient")),
    (2L, "entirely different words about streaming watermarks and state stores " +
      "that share nothing with the other documents in this corpus at all whatsoever"),
    (3L, base))
    .toDF("doc_id", "text")

  test("MLlib MinHashLSH and graft minhashPairs find the same near-dup structure") {
    val withShingles = docs
      .withColumn("sh", TextAnalysis.shingles(col("text"), 3))
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 16).setBinary(true)
    val feats = tf.transform(withShingles)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    val model = lsh.fit(feats)
    val mllibPairs = model.approxSimilarityJoin(feats, feats, 0.5, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .where(col("a") < col("b"))
      .as[(Long, Long)].collect().toSet

    val graftPairs = Dedup.minhashPairs(docs)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    assert(mllibPairs.contains((0L, 3L)) && graftPairs.contains((0L, 3L)))
    assert(mllibPairs.contains((0L, 1L)) && graftPairs.contains((0L, 1L)))
    assert(!mllibPairs.exists(p => p._1 == 2L || p._2 == 2L))
    assert(!graftPairs.exists(p => p._1 == 2L || p._2 == 2L))
  }
}
