package graft

import org.apache.spark.sql.functions.{col, concat, lit, pmod}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingMix

class TrainingMixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    // (doc_id, lang, source, n_chars)
    (1L, "en", "web", 600L),
    (2L, "en", "web", 500L),  // en prefix before doc 2 = 600 < 1000 → kept (straddles)
    (3L, "en", "web", 100L),  // en prefix = 1100 >= 1000 → dropped
    (4L, "de", "web", 300L),
    (5L, "de", "news", 900L), // de prefix = 300 < 1000 → kept; cum 1200
    (6L, "de", "news", 50L))  // de prefix = 1200 → dropped
    .toDF("doc_id", "lang", "source", "n_chars")
    .withColumn("text", org.apache.spark.sql.functions.lit("x")) // schema parity

  test("balancedMix keeps each language up to (and including) the budget-straddling doc") {
    val kept = TrainingMix.balancedMix(docs, budget = 1000L)
      .select("doc_id", "cum_chars").as[(Long, Long)].collect().toMap
    assert(kept.keySet === Set(1L, 2L, 4L, 5L))
    assert(kept(2L) === 1100L) // inclusive running sum
    assert(kept(5L) === 1200L)
  }

  test("packSequences assigns bins by exclusive prefix sum within source") {
    val packed = TrainingMix.packSequences(docs, capacity = 700L)
      .select("doc_id", "bin", "bin_offset").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // source=web, doc order 1,2,3,4: prefixes 0, 600, 1100, 1200
    assert(packed(1L) === ((0L, 0L)))
    assert(packed(2L) === ((0L, 600L))) // starts in bin 0 at offset 600, straddles
    assert(packed(3L) === ((1L, 400L))) // 1100 = 700 + 400
    assert(packed(4L) === ((1L, 500L)))
    // source=news, doc order 5,6: prefixes 0, 900
    assert(packed(5L) === ((0L, 0L)))
    assert(packed(6L) === ((1L, 200L)))
  }

  test("langUpsample replicates by inverse language share, capped at maxEpochs") {
    // en ×4, de ×2, zh ×1 → epochs: en ceil(4/4)=1, de ceil(4/2)=2, zh ceil(4/1)=4
    val d = (1 to 4).map(i => (i.toLong, "en")) ++
      Seq((5L, "de"), (6L, "de"), (7L, "zh"))
    val df = d.toDF("doc_id", "lang")
    val out = TrainingMix.langUpsample(df, maxEpochs = 4)
      .select("doc_id", "epoch").as[(Long, Long)].collect()
    val perDoc = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    (1L to 4L).foreach(i => assert(perDoc(i) === Seq(1L)))
    assert(perDoc(5L) === Seq(1L, 2L) && perDoc(6L) === Seq(1L, 2L))
    assert(perDoc(7L) === Seq(1L, 2L, 3L, 4L))
  }

  test("balancedMix on the real corpus: every language lands in [budget, budget + max doc)") {
    val tdocs = Tables.documents(spark, TestSpark.sf)
    val budget = 15000L
    val perLang = TrainingMix.balancedMix(tdocs, budget)
      .groupBy("lang").agg(
        org.apache.spark.sql.functions.sum("n_chars").as("total"),
        org.apache.spark.sql.functions.max("n_chars").as("maxDoc"))
      .as[(String, Long, Long)].collect()
    assert(perLang.nonEmpty)
    perLang.foreach { case (lang, total, maxDoc) =>
      // either the lang ran out of docs under budget, or it stopped within
      // one straddling doc of the budget
      val langTotal = tdocs.where($"lang" === lang)
        .agg(org.apache.spark.sql.functions.sum("n_chars")).as[Long].head()
      assert(total == langTotal || (total >= budget && total < budget + maxDoc),
        s"$lang: total=$total budget=$budget maxDoc=$maxDoc")
    }
  }

  test("stratifiedSample draws exactly k per source, matches the window oracle, and re-salts") {
    val tdocs = Tables.documents(spark, TestSpark.sf)
    val s1 = TrainingMix.stratifiedSample(tdocs, k = 3)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    // k per source (every source in sf0.001 has >= 3 docs)
    assert(s1.groupBy(_._1).forall(_._2.size == 3))
    // the selection is the k smallest salted hashes — cross-check per source
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("h", "doc_id")
    val expected = tdocs.select($"source", $"doc_id",
        graft.functions.TextAnalysis.md5Prefix32(
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("sample:"),
            $"doc_id".cast("string"))).as("h"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .where($"rn" <= 3)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(s1 === expected)
    // deterministic across runs; a different salt draws a different sample
    val s2 = TrainingMix.stratifiedSample(tdocs, k = 3)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(s1 === s2)
    val other = TrainingMix.stratifiedSample(tdocs, k = 3, salt = "other:")
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(other !== s1)
  }

  test("shardManifest conserves docs and chars across 16 in-range shards") {
    val tdocs = Tables.documents(spark, TestSpark.sf)
    val m = TrainingMix.shardManifest(tdocs).collect()
    assert(m.forall { r =>
      val s = r.getAs[Long]("shard"); s >= 0 && s < 16
    })
    val nDocs = m.map(_.getAs[Long]("n_docs")).sum
    val chars = m.map(_.getAs[Long]("total_chars")).sum
    assert(nDocs === tdocs.count())
    assert(chars === tdocs.agg(org.apache.spark.sql.functions.sum("n_chars"))
      .as[Long].head())
    // same salt → identical manifest on a re-run (reproducible layout)
    val m2 = TrainingMix.shardManifest(tdocs).collect()
    assert(m.map(_.toSeq).toSet === m2.map(_.toSeq).toSet)
  }

  test("chunkDocuments: short doc is one chunk, long doc overlaps by k-stride") {
    val words = (1 to 70).map(i => s"w$i")
    val d = Seq(
      (1L, "just five little tokens here"),
      (2L, words.mkString(" "))) // 70 tokens → chunks [1..64] and [49..70]
      .toDF("doc_id", "text")
    val r = TrainingMix.chunkDocuments(d, k = 64, stride = 48).collect()
      .map(row => (row.getAs[Long]("doc_id"), row.getAs[Int]("chunk_id")) ->
        row.getAs[Int]("n_tokens")).toMap
    assert(r === Map((1L, 0) -> 5, (2L, 0) -> 64, (2L, 1) -> 22))
  }

  test("leakageFreeSplit: clusters never straddle the split, no near-dup pair crosses sides") {
    val tdocs = Tables.documents(spark, TestSpark.sf)
    val clusters = graft.operators.Dedup.nearDupClusters(tdocs)
    val split = TrainingMix.leakageFreeSplit(clusters)
    // exactly one row per doc, split is binary
    assert(split.count() === tdocs.count())
    assert(split.select("split").distinct().as[String].collect().toSet
      .subsetOf(Set("train", "heldout")))
    // every cluster maps to exactly one side
    val straddling = split.groupBy("cluster")
      .agg(org.apache.spark.sql.functions.countDistinct("split").as("sides"))
      .where($"sides" > 1).count()
    assert(straddling === 0L)
    // THE leakage guarantee: no near-dup pair has endpoints on both sides
    val sideOf = split.select($"doc_id", $"split")
    val crossing = graft.operators.Dedup.minhashPairs(tdocs)
      .join(sideOf.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("split", "a_split"), "a_id")
      .join(sideOf.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("split", "b_split"), "b_id")
      .where($"a_split" =!= $"b_split").count()
    assert(crossing === 0L)
    // both sides populated at the default 10% rate on the real corpus
    val bySide = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(bySide.getOrElse("train", 0L) > 0L && bySide.getOrElse("heldout", 0L) > 0L)
  }

  test("chunkDocuments covers every token: per-doc chunk sum = n + overlap") {
    val tdocs = Tables.documents(spark, TestSpark.sf)
    val chunks = TrainingMix.chunkDocuments(tdocs, k = 64, stride = 48)
    val perDoc = chunks.groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("tok_sum"),
        org.apache.spark.sql.functions.count("*").as("n_chunks"))
    val toks = tdocs.select($"doc_id",
      org.apache.spark.sql.functions.size(
        graft.functions.TextAnalysis.tokens($"text")).as("n"))
    // each chunk after the first re-reads exactly (k - stride) = 16 tokens
    val bad = perDoc.join(toks, "doc_id")
      .where($"tok_sum" =!= $"n" + ($"n_chunks" - 1) * 16)
      .count()
    assert(bad === 0L)
  }

  test("lengthBucketBatches: bands separate lengths; waste = padded minus useful") {
    // band 4, batch 2: doc lengths 1-4 land in bucket 0, 5-8 in bucket 1
    val d = Seq(
      (1L, "a", "s"), (2L, "a b", "s"), (3L, "a b c", "s"),
      (4L, "a b c d e", "s"), (5L, "a b c d e f", "s"))
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "source", "length(text) AS n_chars")
    val r = TrainingMix.lengthBucketBatches(d, band = 4, batchSize = 2).collect()
    assert(r.map(_.getAs[Long]("n_docs")).sum === 5L)
    // bucket 1 holds exactly docs 4 (5 tok) and 5 (6 tok) in one batch:
    // padded = 2*6 = 12, useful = 11, waste = 1
    val b1 = r.filter(_.getAs[Long]("bucket_id") === 1L)
    assert(b1.length === 1)
    assert(b1.head.getAs[Long]("max_tokens") === 6L)
    assert(b1.head.getAs[Long]("pad_waste") === 1L)
    assert(math.abs(b1.head.getAs[Double]("efficiency") - 11.0 / 12.0) < 1e-12)
    // every batch: waste is exactly padded-minus-useful and never negative
    r.foreach { x =>
      val w = x.getAs[Long]("pad_waste")
      assert(w >= 0 && w === x.getAs[Long]("n_docs") * x.getAs[Long]("max_tokens")
        - x.getAs[Long]("sum_tokens"))
    }
  }

  test("nucleusSelect keeps the best-first prefix within the integer byte budget") {
    val good = ("the of and to in " * 10).trim // all stopwords, no punct: high score
    val mid = "hello world hello"              // no stopwords: mid score
    val junk = "!!!!"                          // all punct: low score
    val nd = Seq(
      // web total = 1000, budget 2·cum <= 1000
      (1L, junk, "en", "web", 100L),
      (2L, good, "en", "web", 400L), // best, cum 400 -> 800 <= 1000: kept
      (3L, good, "en", "web", 300L), // same score, doc_id tie after 2: cum 700 -> drop
      (4L, mid, "en", "web", 200L),
      // news total = 199: doc 5 (cum 99 -> 198 <= 199) kept, junk dropped
      (5L, good, "en", "news", 99L),
      (6L, junk, "en", "news", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = TrainingMix.nucleusSelect(nd)
      .select("doc_id", "cum_chars").as[(Long, Long)].collect().toMap
    assert(kept === Map(2L -> 400L, 5L -> 99L))
  }

  test("ppsSample: equal sizes keep everything with a zero-error estimate") {
    // p_i = n_chars/max_chars = 1 for every doc -> all kept, and each HT
    // term collapses to exactly n_tok * 1e6: estimate == exact, err == 0
    val docs = Seq(
      (1L, "aa bb cc", "en", "web", 8L),
      (2L, "dd ee ff", "en", "web", 8L),
      (3L, "gg hh ii", "de", "web", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TrainingMix.ppsSample(docs).collect().head
    assert(r.getAs[Long]("n_docs") === 3L)
    assert(r.getAs[Long]("n_kept") === 3L)
    assert(r.getAs[Long]("exact_tokens") === 9L)
    assert(r.getAs[Long]("est_tokens_micro") === 9000000L)
    assert(r.getAs[Double]("rel_err") === 0.0)
  }

  test("ppsSample: the max-size doc is always kept; draws are reproducible") {
    val docs = Seq(
      (10L, "one two three four five six seven eight", "en", "web", 40L),
      (11L, "a b", "en", "web", 3L),
      (12L, "c d", "en", "web", 3L),
      (13L, "e f", "en", "web", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r1 = TrainingMix.ppsSample(docs).collect().head
    // the max doc has p = 1 (h * max < max * 2^32 for every 32-bit h)
    assert(r1.getAs[Long]("n_kept") >= 1L)
    assert(r1.getAs[Long]("n_docs") === 4L)
    val r2 = TrainingMix.ppsSample(docs).collect().head
    assert(r1.toSeq === r2.toSeq, "md5 draws must be reproducible")
  }

  test("contrastivePairs: adjacent positives, cross-doc negatives, no self hits") {
    // two docs of 100 tokens -> 2 chunks each (64-token window, stride
    // 48) -> exactly one anchor per doc, <= 2 negative draws per anchor
    val words = (1 to 100).map(i => s"w$i").mkString(" ")
    val other = (1 to 100).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, words, "en", "a", 100L), (2L, other, "en", "b", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TrainingMix.contrastivePairs(docs).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Int]("pos_chunk_id") === x.getAs[Int]("chunk_id") + 1)
      assert(x.getAs[Long]("neg_doc_id") !== x.getAs[Long]("doc_id"),
        "a negative must never come from the anchor's own document")
      assert(x.getAs[Long]("anchor_hash") !== x.getAs[Long]("pos_hash"),
        "overlapping but distinct chunks hash differently")
    }
    // draws are deterministic
    val again = TrainingMix.contrastivePairs(docs).collect().map(_.toString).sorted
    assert(again.toSeq === r.map(_.toString).sorted.toSeq)
    // real corpus: every anchor row resolves a real victim chunk hash
    val real = TrainingMix.contrastivePairs(
      graft.Tables.documents(spark, TestSpark.sf)).collect()
    assert(real.nonEmpty)
    assert(real.forall(x => x.getAs[Long]("draw") >= 1L && x.getAs[Long]("draw") <= 2L))
  }

  test("kfoldAssignment: folds in range, strata add up, ppm identity holds") {
    val docs = (0L until 40L).map(i => (i, if (i < 25) "en" else "de"))
      .toDF("doc_id", "lang")
    val rows = TrainingMix.kfoldAssignment(docs).collect()
    assert(rows.forall(x => x.getAs[Long]("fold") >= 0L && x.getAs[Long]("fold") < 5L))
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    assert(byLang("en").map(_.getAs[Long]("n_docs")).sum === 25L)
    assert(byLang("de").map(_.getAs[Long]("n_docs")).sum === 15L)
    rows.foreach { x =>
      val (n, tot) = (x.getAs[Long]("n_docs"), x.getAs[Long]("n_stratum"))
      assert(x.getAs[Long]("dev_ppm") === math.abs(5 * n - tot) * 1000000L / tot)
    }
    // deterministic: the same ids land in the same folds on a re-run
    val again = TrainingMix.kfoldAssignment(docs).collect().toSet
    assert(again === rows.toSet)
  }

  test("shardBalance: one shard is a perfect miniature; disjoint shards hit TVD 1/2") {
    val docs = Seq((1L, "A", 10L), (2L, "B", 10L), (3L, "A", 10L))
      .toDF("doc_id", "source", "n_chars")
    // nShards = 1: the single shard IS the corpus → TVD exactly 0
    val one = TrainingMix.shardBalance(docs, nShards = 1).collect()
    assert(one.length === 1 && one.head.getAs[Long]("tvd_num") === 0L)
    // resolve the md5 shard of candidate ids, then give shard 0 only
    // source A and shard 1 only source B → each shard's TVD is 1/2
    val assign = spark.range(1, 60).toDF("doc_id")
      .select(col("doc_id"), pmod(graft.functions.TextAnalysis.md5Prefix32(
        concat(lit("shard:"), col("doc_id").cast("string"))), lit(2L)).as("sh"))
      .as[(Long, Long)].collect()
    val d0 = assign.collectFirst { case (d, 0L) => d }.get
    val d1 = assign.collectFirst { case (d, 1L) => d }.get
    val split = Seq((d0, "A", 10L), (d1, "B", 10L))
      .toDF("doc_id", "source", "n_chars")
    val r = TrainingMix.shardBalance(split, nShards = 2).collect()
      .map(x => x.getAs[Long]("shard") ->
        (x.getAs[Long]("tvd_num"), x.getAs[Long]("tvd_ppm"))).toMap
    assert(r(0L) === ((2L, 500000L))) // (1,0) vs (1/2,1/2)
    assert(r(1L) === ((2L, 500000L)))
  }
  test("groupKFold: rows follow their user, cross-fold identity proves no leak") {
    val ratings = Seq(
      (1L, 10L, 5.0), (1L, 11L, 4.0), (2L, 10L, 3.0),
      (3L, 12L, 5.0), (4L, 13L, 2.0), (4L, 10L, 1.0))
      .toDF("userId", "productId", "rating")
    val r = TrainingMix.groupKFold(ratings, k = 2).collect()
    assert(r.map(_.getAs[Long]("n_rows")).sum === 6L)
    assert(r.forall(_.getAs[Boolean]("leak_free")))
    assert(r.forall(_.getAs[Long]("n_users_global") == 4L))
    assert(r.map(_.getAs[Long]("n_users")).sum === 4L)
  }
}
