package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the graft native functions
  * in the SQL function registry so plain SQL can call them —
  *
  *   spark.sql("SELECT cosine_sim(a.embedding, b.embedding) ...")
  *   spark.sql("SELECT minhash_signature(hashes) ...")   -- k = 64
  *
  * Activate via
  *   .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
  * or programmatically with [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.cosineSim)
    e.injectFunction(GraftExtensions.minhashSig)
    e.injectFunction(GraftExtensions.topK)
    e.injectFunction(GraftExtensions.md5Prefix32)
    e.injectFunction(GraftExtensions.cmsSketch)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private[graft] val cosineSim = (
    FunctionIdentifier("cosine_sim"),
    info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors"),
    (args: Seq[Expression]) => CosineSimilarity(args.head, args(1)))

  private[graft] val minhashSig = (
    FunctionIdentifier("minhash_signature"),
    info("minhash_signature", "minhash_signature(hashes) - 64-permutation MinHash signature"),
    (args: Seq[Expression]) => MinHashSignature(args.head, 64))

  private[graft] val topK = (
    FunctionIdentifier("top_k"),
    info("top_k", "top_k(score, payload, k) - exact per-group top-k with map-side partial aggregation"),
    (args: Seq[Expression]) => {
      val k = args(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(s"top_k k must be an int literal, got $other")
      }
      ExactTopK(args(0), args(1), k).toAggregateExpression()
    })

  private[graft] val md5Prefix32 = (
    FunctionIdentifier("md5_prefix32_array"),
    info("md5_prefix32_array",
      "md5_prefix32_array(arr) - element-wise first-32-bits-of-md5 hash of a string array"),
    (args: Seq[Expression]) => Md5Prefix32Array(args.head))

  private[graft] val cmsSketch = (
    FunctionIdentifier("cms_sketch"),
    info("cms_sketch",
      "cms_sketch(hash, d, w) - count-min sketch (d x w counter matrix) over md5-prefix32 key hashes"),
    (args: Seq[Expression]) => {
      def intLit(e: Expression, what: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(s"cms_sketch $what must be an int literal, got $other")
      }
      CountMinSketchAgg(args.head, intLit(args(1), "d"), intLit(args(2), "w")).toAggregateExpression()
    })

  /** Imperative registration for an already-built session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    Seq(cosineSim, minhashSig, topK, md5Prefix32, cmsSketch).foreach { case (id, inf, builder) =>
      reg.registerFunction(id, inf, builder)
    }
  }
}
