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

  /** Imperative registration for an already-built session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    Seq(cosineSim, minhashSig).foreach { case (id, inf, builder) =>
      reg.registerFunction(id, inf, builder)
    }
  }
}
