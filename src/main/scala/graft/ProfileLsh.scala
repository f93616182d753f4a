package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-attribution probe for the LSH map chain (tokens → shingles →
  * md5 → minhash) plus a band-bucket population profile — the diagnostic
  * that located the shingle-string construction as ~10× the hash work it
  * fed (round 16) and showed candidate volume is bucket-bounded. */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("testdata_sf1.0")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextAnalysis

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).repartition(32).cache()
    docs.count()

    def time(name: String)(df: DataFrame): Unit = {
      // sum(x) forces the projected column (count(*) would prune it away)
      df.agg(sum(col("x"))).head()
      val t0 = System.nanoTime()
      df.agg(sum(col("x"))).head()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val toks = TextAnalysis.tokens(col("text"))
    val sh = TextAnalysis.shinglesOfTokens(toks, 3)
    val hs = TextAnalysis.md5Prefix32Array(sh)
    val xs = expr("transform(shingles, s -> xxhash64(s))")

    time("baseline scan")(docs.select(col("doc_id").as("x")))
    time("tokens")(docs.select(size(toks).as("x")))
    time("tokens+shingles")(docs.select(size(sh).as("x")))
    time("tokens+shingles+md5")(docs.select(size(hs).as("x")))
    time("shingles+xxhash64(HOF)")(
      docs.select(sh.as("shingles")).select(size(xs).as("x")))
    val sig = org.apache.spark.sql.graft.shim.column(
      org.apache.spark.sql.graft.MinHashSignature(
        org.apache.spark.sql.graft.shim.expression(hs), 64))
    time("full: +minhash64")(docs.select(size(sig).as("x")))
    val sig16 = org.apache.spark.sql.graft.shim.column(
      org.apache.spark.sql.graft.MinHashSignature(
        org.apache.spark.sql.graft.shim.expression(hs), 16))
    time("full: +minhash16")(docs.select(size(sig16).as("x")))

    // band-bucket population profile: is the stream join's candidate
    // volume dominated by hot buckets?
    val banded = graft.operators.Dedup.bandedSignaturesStreamCompact(
      docs.select(col("doc_id"), lit(0L).as("ts"), col("text")), fanout = false)
    val pops = banded.groupBy("band", "key").count().cache()
    val cand = pops.agg(
      sum(col("count") * (col("count") - 1) / 2).as("cand_pairs"),
      max(col("count")).as("max_bucket"),
      count(lit(1)).as("n_buckets")).head()
    println(s"candidate pairs=${cand.get(0)} max_bucket=${cand.get(1)} buckets=${cand.get(2)}")
    println("top buckets:")
    pops.orderBy(desc("count")).limit(10).collect().foreach(println)
    spark.stop()
  }
}
