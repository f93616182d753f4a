package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokenStats counts tokens and characters") {
    val df = Seq((1L, "Alpha beta beta gamma")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenStats(df).collect().head
    assert(r.getAs[Int]("n_tokens") === 4)
    assert(r.getAs[Int]("n_distinct_tokens") === 3)
    assert(r.getAs[Int]("char_len") === 21)
    assert(r.getAs[Double]("avg_token_len") === 18.0 / 4) // "alphabetabetagamma"
  }

  test("langId prefers the language with most stopword hits") {
    val df = Seq(
      (1L, "the cat of the house and the dog"),
      (2L, "der Hund ist nicht die Katze und der Vogel"))
      .toDF("doc_id", "text")
    val preds = TextAnalysis.langId(df).select("doc_id", "pred_lang")
      .as[(Long, String)].collect().toMap
    assert(preds(1L) === "en")
    assert(preds(2L) === "de")
  }

  test("shingles produces sliding word n-grams, distinct") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val sh = df.select(TextAnalysis.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].collect().head
    assert(sh.toSet === Set("a b c", "b c d"))
  }

  test("shingles on text shorter than n is empty") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val sh = df.select(TextAnalysis.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].collect().head
    assert(sh.isEmpty)
  }

  test("quality score stays in [0,1] over the real corpus") {
    val scores = TextAnalysis.qualityScore(Tables.documents(spark, TestSpark.sf))
      .select("quality_score").as[Double].collect()
    assert(scores.nonEmpty)
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }
}
