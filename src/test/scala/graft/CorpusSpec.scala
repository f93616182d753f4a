package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis
import graft.operators.Corpus

class CorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "source", "length(text) AS n_chars")

  test("filterFunnel stages chain: docs_in of stage k+1 = survivors of stage k") {
    val d = docs(
      // long, all-distinct tokens, en stopwords present → survives all stages
      (1L, "the of and to in " + (1 to 60).map(i => s"word$i").mkString(" "), "a"),
      (2L, "word " * 100, "a"), // long but ttr = 0.01 → dropped at repetition
      (3L, "tiny text", "a")) // dropped at length
    val rows = TextAnalysis.filterFunnel(d).collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("docs_in"), r.getAs[Long]("survivors"), r.getAs[Long]("dropped")))
      .toMap
    assert(rows("1_length") === ((3L, 2L, 1L)))
    assert(rows("2_repetition")._1 === rows("1_length")._2)
    assert(rows("3_language")._1 === rows("2_repetition")._2)
    // every stage: dropped = docs_in - survivors, survivors monotone nonincreasing
    rows.values.foreach { case (in, out, drop) => assert(drop === in - out && out <= in) }
    // doc 2 falls at repetition, doc 1 survives language (en stopwords present)
    assert(rows("2_repetition") === ((2L, 1L, 1L)))
    assert(rows("3_language") === ((1L, 1L, 0L)))
  }

  test("segmentDedupRewrite drops corpus-wide segments, keeps unique ones in order") {
    // segment width 2, threshold 2 distinct docs: "dup seg" appears in all
    // three docs → removed everywhere; per-doc unique segments survive
    val d = docs(
      (1L, "dup seg one alpha", "a"),
      (2L, "dup seg two beta extra", "a"),
      (3L, "dup seg", "a"))
    val r = Corpus.segmentDedupRewrite(d, w = 2, maxDocs = 2L).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_seg") === 2L)
    assert(r(1L).getAs[Long]("n_removed") === 1L)
    assert(r(1L).getAs[Long]("kept_tokens") === 2L)
    // doc 2: 3 segments ("dup seg","two beta","extra"), one removed
    assert(r(2L).getAs[Long]("n_removed") === 1L)
    assert(r(2L).getAs[Long]("kept_tokens") === 3L)
    // doc 3 is ALL boilerplate → empty rewrite hashes the empty string
    assert(r(3L).getAs[Long]("kept_tokens") === 0L)
    assert(r(3L).getAs[Long]("kept_hash") === java.lang.Long.parseLong("d41d8cd9", 16))
    // rewritten doc 2 = surviving segments joined in sid order
    val h2 = spark.sql("SELECT conv(substring(md5('two beta extra'), 1, 8), 16, 10)")
      .head.getString(0).toLong
    assert(r(2L).getAs[Long]("kept_hash") === h2)
  }

  test("distinctNgramRatio: a self-repeating source scores lower than a diverse one") {
    val d = docs(
      (1L, "a b c d e f g h i j", "diverse"),
      (2L, "x y z x y z x y z x y z", "spam"))
    val r = Corpus.distinctNgramRatio(d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // diverse: 8 trigrams, all distinct
    assert(r("diverse").getAs[Long]("n_grams") === 8L)
    assert(r("diverse").getAs[Long]("n_distinct") === 8L)
    assert(r("diverse").getAs[Double]("distinct_ratio") === 1.0)
    // spam: 10 trigrams but only 3 distinct rotations of (x y z)
    assert(r("spam").getAs[Long]("n_grams") === 10L)
    assert(r("spam").getAs[Long]("n_distinct") === 3L)
    assert(r("spam").getAs[Double]("distinct_ratio") < 0.5)
  }

  test("sourceOverlap counts distinct shared 8-grams once per ordered pair") {
    val shared = "one two three four five six seven eight"
    val d = docs(
      (1L, shared + " tail-a", "srcA"),
      (2L, shared + " tail-b", "srcB"),
      (3L, "totally different words with no gram in common at all", "srcC"))
    val rows = Corpus.sourceOverlap(d).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        r.getAs[Long]("n_shared_grams")).toMap
    // srcA/srcB share exactly the one 8-gram of `shared` (their 9-token texts
    // have two 8-grams each, only the first is common); ordering a < b
    assert(rows === Map(("srcA", "srcB") -> 1L))
  }

  test("topNgrams counts bigrams corpus-wide and cuts rank k deterministically") {
    val d = docs(
      (1L, "a b a b c", "s"), // bigrams: "a b" ×2, "b a", "b c"
      (2L, "a b x y", "s")) // "a b" again, "b x", "x y"
    val r = Corpus.topNgrams(d, n = 2, k = 3).collect()
      .map(row => row.getAs[String]("gram") -> row.getAs[Long]("n_occurrences"))
    // top-1 is "a b" ×3; the rank-2/3 cut among the 1-count ties is
    // alphabetical: "b a", "b c"
    assert(r.toSeq === Seq("a b" -> 3L, "b a" -> 1L, "b c" -> 1L))
  }

  test("topNgrams plans as TakeOrderedAndProject, not a global sort") {
    val df = SparkEntry.queries("q76_top_ngrams")(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"global sort for top-k:\n$plan")
  }

  test("boilerplateWindows surfaces only windows repeated across or within docs") {
    val d = docs(
      (1L, "h1 h2 h3 h4 alpha beta gamma delta", "a"), // shares header with doc 2
      (2L, "h1 h2 h3 h4 x y z q", "b"),
      (3L, "r r r r r r r r", "c")) // one window repeated WITHIN the doc
    val rows = Corpus.boilerplateWindows(d, w = 4).collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("n_occurrences"),
        r.getAs[Long]("first_doc")))
      .toSet
    // exactly two repeated windows: the shared header (2 docs) and doc 3's
    // self-repeat (1 doc, 2 occurrences); unique tail windows never appear
    assert(rows === Set((2L, 2L, 1L), (1L, 2L, 3L)))
  }

  test("snapshotDiff classifies added/removed/modified/unchanged by content hash") {
    val v1 = Seq((1L, "same text"), (2L, "old text"), (3L, "going away"))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, "same text"), (2L, "new text"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val r = Corpus.snapshotDiff(v1, v2).collect()
      .map(row => row.getAs[Long]("doc_id") -> row.getAs[String]("status")).toMap
    assert(r === Map(1L -> "unchanged", 2L -> "modified", 3L -> "removed", 4L -> "added"))
  }

  test("quoteHits finds planted verbatim quotes and every probe hits itself") {
    val probeText = (1 to 25).map(i => s"w$i").mkString(" ") // doc 0: 25 tokens
    val quote = (9 to 20).map(i => s"w$i").mkString(" ") // its 12-token probe window
    val d = docs(
      (0L, probeText, "a"), // doc_id % 97 == 0 → probe source
      (1L, s"prefix words then $quote and a suffix", "b"), // contains the quote
      (2L, "unrelated content entirely free of probes", "c"))
    val hits = Corpus.quoteHits(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("probe_doc_id"))).toSet
    assert(hits === Set((0L, 0L), (1L, 0L)))
  }

  test("zscoreLengths: planted outlier dominates, per-source z sums to ~0") {
    val docs = ((1 to 9).map(i => (i.toLong, "t", "en", "s1", 100L + i)) :+
      (10L, "t", "en", "s1", 5000L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val z = graft.operators.Corpus.zscoreLengths(docs)
      .select("doc_id", "z").as[(Long, Double)].collect().toMap
    assert(z(10L) === z.values.max)
    assert(math.abs(z.values.sum) < 1e-9, "z-scores are centered per source")
    assert(z(10L) > 2.0, "the 50x-length doc is a strong outlier")
  }

  test("winsorize: hand-computed bounds, interior values untouched, tails clipped") {
    // source "a": n_chars 0..10 → p_lo(0.05) = 0.5, p_hi(0.95) = 9.5
    val docs = (0L to 10L).map(i => (i, "a", i)) :+ ((99L, "b", 100L))
    val df = docs.toDF("doc_id", "source", "n_chars")
    val r = Corpus.winsorize(df).collect()
      .map(row => row.getAs[Long]("doc_id") ->
        (row.getAs[Double]("clipped_chars"), row.getAs[Boolean]("was_clipped")))
      .toMap
    assert(r(0L) === ((0.5, true))) // below p_lo → clipped up
    assert(r(5L) === ((5.0, false))) // interior → untouched
    assert(r(10L) === ((9.5, true))) // above p_hi → clipped down
    // single-doc source: p_lo = p_hi = the value itself, never clipped
    assert(r(99L) === ((100.0, false)))
    // real corpus: nominal rate is lo + (1-hi) = 10%, but the discrete
    // length distribution puts tie groups at the interpolated cut points
    // (measured 15.8% here) — assert the order of magnitude, not the ideal
    val tdocs = Tables.documents(spark, TestSpark.sf)
    val w = Corpus.winsorize(tdocs)
    val rate = w.where($"was_clipped").count().toDouble / w.count()
    assert(rate > 0.0 && rate <= 0.25, s"clipped $rate of docs at 5/95 bounds")
  }

  test("winsorize bounds broadcast — the document side never shuffles") {
    val df = SparkEntry.queries("q91_winsorize")(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"bounds join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"document side shuffled:\n$plan")
  }

  test("quoteHits is gram-bucketed: broadcast equi-joins only, no nested loop, no shuffle") {
    val df = SparkEntry.queries("q70_quote_hits")(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate/verify joins are not broadcast equi-joins:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"the O(corpus x probes) nested-loop shape is back:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus side shuffled for the probe join:\n$plan")
  }

  test("hllCardinality: estimate lands within the 256-register error envelope") {
    val r = Corpus.hllCardinality(
      graft.Tables.documents(spark, TestSpark.sf)).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("n_exact").toDouble
      val est = row.getAs[Double]("est")
      val occ = row.getAs[Long]("occupied")
      assert(occ >= 1L && occ <= 256L)
      // raw-estimator regime (n > 2.5m): 1.04/sqrt(256) = 6.5% std error;
      // 3 sigma = ~20% is the hard cap a correct implementation never hits
      if (n > 640) assert(math.abs(est / n - 1.0) < 0.20,
        s"${row.getAs[String]("source")}: est $est vs exact $n")
    }
    // register state is bounded by construction: s_scaled <= 256 * 2^40
    r.foreach(row => assert(row.getAs[Long]("s_scaled") <= 256L * (1L << 40)))
  }

  test("quantileNormalize: rank mapping is monotone and hits exact order stats") {
    import spark.implicits._
    // source a: lengths 1,2 (n_s=2); source b: 10,20,30 (n_s=3); N=5
    // global sorted: [1,2,10,20,30]
    // a: rn1 -> pos ceil(5/2)=3 -> 10; rn2 -> pos 5 -> 30
    // b: rn1 -> ceil(5/3)=2 -> 2; rn2 -> ceil(10/3)=4 -> 20; rn3 -> 5 -> 30
    val docs = Seq(
      (1L, "x", "a", 1L), (2L, "xx", "a", 2L),
      (3L, "y", "b", 10L), (4L, "yy", "b", 20L), (5L, "yyy", "b", 30L))
      .toDF("doc_id", "text", "source", "n_chars")
    val r = Corpus.quantileNormalize(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("norm_chars")).toMap
    assert(r === Map(1L -> 10L, 2L -> 30L, 3L -> 2L, 4L -> 20L, 5L -> 30L))
    // real corpus: within each source the mapping is monotone in rank
    val real = Corpus.quantileNormalize(
      graft.Tables.documents(spark, TestSpark.sf)).collect()
    real.groupBy(_.getAs[String]("source")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rank_in_source"))
        .map(_.getAs[Long]("norm_chars"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
  }

  test("greedyCoverage: marginal gains, name-break ties, running union") {
    import spark.implicits._
    // A:{1,2,3,4} B:{3,4,5,9} C:{5,6}: round1 A(4); round2 tie B/C at 2
    // fresh -> B by name; round3 C adds {6}
    val sh = Seq(
      ("a", "1"), ("a", "2"), ("a", "3"), ("a", "4"),
      ("b", "3"), ("b", "4"), ("b", "5"), ("b", "9"),
      ("c", "5"), ("c", "6")).toDF("source", "g")
      .withColumn("h", org.apache.spark.sql.functions.lit(0L))
    val r = Corpus.greedyCoverageFrom(sh).collect()
      .map(x => x.getAs[Long]("round") ->
        (x.getAs[String]("source"), x.getAs[Long]("gain"),
          x.getAs[Long]("covered_total"))).toMap
    assert(r === Map(
      1L -> (("a", 4L, 4L)),
      2L -> (("b", 2L, 6L)),
      3L -> (("c", 1L, 7L))))
  }

  test("sketch family is multiplicity-insensitive: distinctGrams seam equals raw hashedGrams") {
    // The memoized seam feeds the DISTINCT (source, g) frame to all five
    // consumers; this pins the substitution's correctness — every family
    // result must be identical whether the input stream carries duplicate
    // grams or not (repeat-heavy texts so the dedup factor is real).
    val d = docs(
      (1L, "abcabcabcabcabcabcabcabc", "s1"), // heavy 8-gram repeats
      (2L, "abcabcabcXYZabcabcabcabc", "s2"), // shares grams with s1
      (3L, "the quick brown fox jumps over the lazy dog again", "s3"),
      (4L, "tiny", "s1")) // sub-k doc: contributes nothing
    val raw = Corpus.hashedGrams(d)
    val dedup = Corpus.distinctGrams(d)
    // the distinct frame really is deduped, and strictly smaller here
    assert(dedup.count() === raw.select("source", "g").distinct().count())
    assert(dedup.count() < raw.count())
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(Corpus.hllCardinalityFrom(dedup)) === rows(Corpus.hllCardinalityFrom(raw)))
    assert(rows(Corpus.hllMergeFrom(dedup)) === rows(Corpus.hllMergeFrom(raw)))
    assert(rows(Corpus.hllIntersectionFrom(dedup)) === rows(Corpus.hllIntersectionFrom(raw)))
    assert(rows(Corpus.greedyCoverageFrom(dedup)) === rows(Corpus.greedyCoverageFrom(raw)))
    assert(rows(graft.operators.Sketches.kmvCardinality(dedup)) ===
      rows(graft.operators.Sketches.kmvCardinality(raw)))
  }

  test("postingsCompression: dense postings compress to ~1 byte per gap") {
    import spark.implicits._
    // token "a" in docs 1..5 (dense: gaps 2,1,1,1,1 -> 5 varint bytes vs
    // 40 raw); token "b" only in doc 300 (gap 301 -> 2 varint bytes)
    val docs = ((1L to 5L).map(i => (i, "a", "s")) :+ ((300L, "b", "s")))
      .toDF("doc_id", "text", "source")
    val r = Corpus.postingsCompression(docs).collect()
      .map(x => x.getAs[String]("tok") ->
        (x.getAs[Long]("df"), x.getAs[Long]("raw_bytes"),
          x.getAs[Long]("varint_bytes"), x.getAs[Long]("ratio_ppm"))).toMap
    assert(r("a") === ((5L, 40L, 5L, 125000L)))
    assert(r("b") === ((1L, 8L, 2L, 250000L)))
    // real corpus: every winner compresses below raw
    val real = Corpus.postingsCompression(
      graft.Tables.documents(spark, TestSpark.sf)).collect()
    assert(real.length === 20)
    real.foreach { x =>
      assert(x.getAs[Long]("varint_bytes") < x.getAs[Long]("raw_bytes"))
      assert(x.getAs[Long]("ratio_ppm") < 1000000L)
    }
  }

  test("vocabRichness: hand count-of-counts, Chao1 and Good-Turing exact") {
    import spark.implicits._
    // source s: tokens a a a b b c d -> counts {a:3, b:2, c:1, d:1}
    // N=7, D=4, F1=2, F2=1; chao1 = 4 + 4/2 = 6; GT = 2e6/7
    val docs = Seq((1L, "a a a b b c d", "s")).toDF("doc_id", "text", "source")
    val r = Corpus.vocabRichness(docs).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_tokens") === 7L)
    assert(row.getAs[Long]("d_types") === 4L)
    assert(row.getAs[Long]("f1") === 2L && row.getAs[Long]("f2") === 1L)
    assert(row.getAs[Long]("gt_unseen_ppm") === 2000000L / 7L)
    assert(row.getAs[Double]("chao1") === 6.0)
    // f2 = 0 falls back to D alone
    val solo = Seq((1L, "x y", "s")).toDF("doc_id", "text", "source")
    assert(Corpus.vocabRichness(solo).head().getAs[Double]("chao1") === 2.0)
    // real corpus: chao1 >= observed richness, GT mass in [0, 1e6]
    val real = Corpus.vocabRichness(
      graft.Tables.documents(spark, TestSpark.sf)).collect()
    real.foreach { x =>
      assert(x.getAs[Double]("chao1") >= x.getAs[Long]("d_types").toDouble)
      val gt = x.getAs[Long]("gt_unseen_ppm")
      assert(gt >= 0L && gt <= 1000000L)
    }
  }

  test("ksDrift: disjoint supports give D=1 and W1=the mean shift") {
    import spark.implicits._
    // source a: lengths {1,1}; source b: lengths {3,3}. Each vs rest:
    // D = 1 (total separation); W1 = 2 (all mass moves distance 2)
    val docs = Seq((1L, "x", "a"), (2L, "x", "a"), (3L, "xxx", "b"), (4L, "xxx", "b"))
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "source", "CAST(length(text) AS BIGINT) AS n_chars")
    val r = Corpus.ksDrift(docs).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("d_ppm"), x.getAs[Long]("w1_micro"))).toMap
    // D = 1 -> 1e6 ppm exactly; W1 = 2 -> 2e6 micro exactly
    assert(r("a") === ((1000000L, 2000000L)))
    assert(r("b") === ((1000000L, 2000000L)))
    // real corpus: D in (0, 1], W1 >= 0, one row per source
    val real = Corpus.ksDrift(graft.Tables.documents(spark, TestSpark.sf)).collect()
    assert(real.length === graft.Tables.documents(spark, TestSpark.sf)
      .select("source").distinct().count().toInt)
    real.foreach { x =>
      val d = x.getAs[Long]("d_ppm")
      assert(d > 0L && d <= 1000000L)
      assert(x.getAs[Long]("w1_micro") >= 0L)
    }
  }

  test("phraseSearch: positional join counts occurrences and docs, ties by phrase") {
    import spark.implicits._
    val docs = Seq((1L, "x y x y", "s"), (2L, "x y z", "s"))
      .toDF("doc_id", "text", "source")
    val r = Corpus.phraseSearch(docs).collect()
      .map(x => (x.getAs[String]("phrase"), x.getAs[Long]("n_occurrences"),
        x.getAs[Long]("n_docs")))
    assert(r.toSeq === Seq(("x y", 3L, 2L), ("y x", 1L, 1L), ("y z", 1L, 1L)))
  }

  test("bpeMergeStep: overlapping counts rank, greedy application counts grade") {
    import spark.implicits._
    // "aaab aaab cd": pairs per word "aaab" -> aa, aa, ab (overlapping);
    // corpus counts: aa=4, ab=2, cd=1. Greedy merges of "aa" in "aaab":
    // ONE (aaa overlaps), so n_applied(aa) = 2 across both words.
    val docs = Seq((1L, "aaab aaab cd", "s")).toDF("doc_id", "text", "source")
    val r = Corpus.bpeMergeStep(docs).collect()
      .map(x => x.getAs[String]("pair") ->
        (x.getAs[Long]("n_pair"), x.getAs[Long]("n_applied"))).toMap
    assert(r("aa") === ((4L, 2L)))
    assert(r("ab") === ((2L, 2L)))
    assert(r("cd") === ((1L, 1L)))
    // invariant on the real corpus: greedy applications never exceed the
    // overlapping count, and every candidate applies at least once
    val real = Corpus.bpeMergeStep(
      graft.Tables.documents(spark, TestSpark.sf)).collect()
    assert(real.length === 10)
    real.foreach { x =>
      val (np, na) = (x.getAs[Long]("n_pair"), x.getAs[Long]("n_applied"))
      assert(na >= 1L && na <= np, s"${x.getAs[String]("pair")}: $na vs $np")
    }
  }

  test("hllIntersection: union sums dominate, identical shards estimate their own size") {
    import spark.implicits._
    // two identical sources: union registers == each side's registers, so
    // inclusion-exclusion reduces to est(A) + est(A) - est(A) = est(A)
    val twin = Seq((1L, "abcdefghijklmnop", "s1"), (2L, "abcdefghijklmnop", "s2"))
      .toDF("doc_id", "text", "source")
    val t = Corpus.hllIntersection(twin).collect()
    assert(t.length === 1)
    assert(t.head.getAs[Long]("s_union") === t.head.getAs[Long]("s_a"))
    assert(t.head.getAs[Long]("s_a") === t.head.getAs[Long]("s_b"))
    assert(t.head.getAs[Long]("n_inter_exact") === 9L) // 16 chars -> 9 8-grams
    // real corpus: every pair reported once, and the union register sum can
    // only dominate (element-wise max can only raise registers, which can
    // only shrink the scaled harmonic sum)
    val r = Corpus.hllIntersection(
      graft.Tables.documents(spark, TestSpark.sf)).collect()
    val nSrc = graft.Tables.documents(spark, TestSpark.sf)
      .select("source").distinct().count()
    assert(r.length === (nSrc * (nSrc - 1) / 2).toInt)
    r.foreach { row =>
      assert(row.getAs[Long]("s_union") <= row.getAs[Long]("s_a"))
      assert(row.getAs[Long]("s_union") <= row.getAs[Long]("s_b"))
      assert(row.getAs[Long]("n_inter_exact") >= 0L)
    }
  }

  test("histogramQuantiles: exact order statistics, estimate within one bucket width") {
    import spark.implicits._
    // 100 docs with lengths 1..100 in one source: p50/p90/p99 order
    // statistics are 50/90/99 by construction
    val d = (1L to 100L).map(i => (i, "x" * i.toInt, "s"))
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "source", "CAST(length(text) AS BIGINT) AS n_chars")
    val r = Corpus.histogramQuantiles(d).collect()
      .map(x => x.getAs[Int]("p") ->
        (x.getAs[Long]("exact_v"), x.getAs[Long]("est_v"), x.getAs[Long]("err"))).toMap
    assert(r.keySet === Set(50, 90, 99))
    assert(r(50)._1 === 50L && r(90)._1 === 90L && r(99)._1 === 99L)
    // 256 buckets over a range of 100 -> bucket width < 1, so the upper
    // edge can miss the exact value by at most 1
    r.values.foreach { case (_, _, err) => assert(math.abs(err) <= 1L, s"err $err") }
  }

  test("oovRate scores tokens outside the deterministic top-v vocabulary") {
    // vocab (v=2) by (count desc, token asc): "aa" ×4, then the tie at
    // count 2 breaks alphabetically -> "bb" in, "cc" out
    val docs = Seq(
      (1L, "aa aa bb cc", "s"), (2L, "aa aa bb cc", "s"), (3L, "zz qq", "s"))
      .toDF("doc_id", "text", "source")
    val r = Corpus.oovRate(docs, v = 2).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("n_oov"),
          x.getAs[Double]("oov_rate"))).toMap
    assert(r(1L) === ((4L, 1L, 0.25))) // only cc is OOV
    assert(r(2L) === ((4L, 1L, 0.25)))
    assert(r(3L) === ((2L, 2L, 1.0))) // all tokens OOV
  }

  test("hllCardinality sketch side aggregates map-side (partial_max before the exchange)") {
    val df = Corpus.hllCardinality(graft.Tables.documents(spark, TestSpark.sf))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max"),
      s"register max does not combine map-side:\n$plan")
  }

  test("hllMerge: shard-merged registers equal direct, estimate is sane") {
    val r = Corpus.hllMerge(graft.Tables.documents(spark, TestSpark.sf)).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Boolean]("merge_eq_direct"),
      "element-wise max merge of per-source registers must equal the " +
        "union's registers — HLL's defining algebraic property")
    assert(row.getAs[Long]("n_shards") >= 2L, "fixture has several sources")
    val exact = row.getAs[Long]("n_exact").toDouble
    val est = row.getAs[Double]("est")
    // 256 registers -> ~6.5% typical error; 50% is a regression alarm only
    assert(est > exact * 0.5 && est < exact * 1.5,
      s"merged estimate $est far from exact $exact")
  }

  test("tfidfSearch: hand-computed integer-log2 idf weighting and ranking") {
    val docs = Seq(
      (1L, "dup dup spark"),      // 2*idf(dup) + 1*idf(spark)
      (2L, "spark spark spark"),  // 3*idf(spark)
      (3L, "window"),             // 1*idf(window)
      (4L, "other text entirely"))
      .toDF("doc_id", "text")
    // N=4: df(dup)=1 -> idf2=len(bin(4))=3; df(spark)=2 -> len(bin(2))=2;
    // df(window)=1 -> 3
    val r = Corpus.tfidfSearch(docs, Seq("dup", "spark", "window")).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_terms_matched"), x.getAs[Long]("score")))
    assert(r.toSeq === Seq(
      1L -> ((2L, 8L)),   // 2*3 + 1*2
      2L -> ((1L, 6L)),   // 3*2
      3L -> ((1L, 3L))))  // 1*3 ; doc 4 matches nothing and is absent
  }

  test("spearmanRanks: aligned ranks give rho 1, reversed give rho -1") {
    val docs = Seq(
      // source x: char rank == token rank -> sum_d2 = 0, rho = 1
      (1L, "x", 10L, "a b"), (2L, "x", 20L, "a b c"), (3L, "x", 30L, "a b c d"),
      // source y: char rank reverses token rank -> sum_d2 = 8, rho = -1
      (4L, "y", 10L, "a b c d"), (5L, "y", 20L, "a b c"), (6L, "y", 30L, "a b"))
      .toDF("doc_id", "source", "n_chars", "text")
    val r = Corpus.spearmanRanks(docs).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("sum_d2"),
          x.getAs[Double]("rho"))).toMap
    assert(r("x") === ((3L, 0L, 1.0)))
    assert(r("y") === ((3L, 8L, -1.0)))
  }

  test("lmSurprisal: integer-log2 bits match the hand-built corpus LM") {
    // corpus: a×3, b×1, c×1, N=5 → bits(a)=len(bin(5 div 3))=1,
    // bits(b)=bits(c)=len(bin(5))=3
    val docs = Seq((1L, "a a b"), (2L, "a c"))
      .toDF("doc_id", "text")
    val r = Corpus.lmSurprisal(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("surprisal_bits"),
          x.getAs[Long]("bits_per_token_milli"))).toMap
    assert(r(1L) === ((3L, 5L, 1666L))) // 2·1 + 1·3 bits over 3 tokens
    assert(r(2L) === ((2L, 4L, 2000L))) // 1 + 3 bits over 2 tokens
  }

  test("bm25Search: cleared-denominator scores match hand numbers, tf saturates") {
    val docs = Seq((1L, "x x", "A", 3L), (2L, "x y", "A", 3L))
      .toDF("doc_id", "text", "source", "n_chars")
    val r = Corpus.bm25Search(docs, Seq("x")).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("score_micro")).toMap
    // n_docs 2, total_dl 6, idf2 = len(bin(1)) = 1
    // doc1 tf=2: 22·2·6e6/(120+18+54) = 1375000; doc2 tf=1: 132e6/132 = 1e6
    assert(r === Map(1L -> 1375000L, 2L -> 1000000L))
    // saturation: doubling tf earned 1.375x, not 2x
  }

  test("trimmedMeanLength: the outlier falls outside the cut, mean is exact") {
    // source A: lengths 1..9 and 1000 — cut ⌊10/10⌋=1 drops the 1 and
    // the 1000; mean of 2..9 = 5.5 → 5500 milli
    val docs = ((1 to 9).map(i => (i.toLong, "A", i.toLong))
      :+ (10L, "A", 1000L))
      .toDF("doc_id", "source", "n_chars")
    val r = Corpus.trimmedMeanLength(docs).collect().head
    assert(r.getAs[Long]("n_docs") === 10L)
    assert(r.getAs[Long]("n_kept") === 8L)
    assert(r.getAs[Long]("kept_chars") === 44L)
    assert(r.getAs[Long]("trimmed_mean_milli") === 5500L)
  }

  test("importanceWeights: target-like docs score high, off-target capped") {
    val docs = Seq(
      (1L, "en", "the cat"), (2L, "fr", "le chat"), (3L, "en", "the dog"))
      .toDF("doc_id", "lang", "text")
    // N_S = 6 tokens, N_T = 4 en tokens. Every en token: a = n_t·6 ≥
    // b = n_s·4 → ratio floor 1 → w = len(bin(1)) = 1. fr tokens are
    // absent from the target → the -64 cap.
    val r = Corpus.importanceWeights(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_toks"), x.getAs[Long]("dsir_score"))).toMap
    assert(r === Map(1L -> ((2L, 2L)), 2L -> ((2L, -128L)), 3L -> ((2L, 2L))))
  }

  test("hashedVectorizer: counts are conserved, dims stay in range") {
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val rows = Corpus.hashedVectorizer(docs).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("dim"),
        x.getAs[Long]("weight")))
    assert(rows.map(_._3).sum === 4L)  // every token lands exactly once
    assert(rows.filter(_._1 == 1L).map(_._3).max === 2L) // "a" twice, same dim
    assert(rows.forall(r => r._2 >= 0L && r._2 < 64L))
  }

  test("repetitionScore: looping text lights up, varied text stays low") {
    val docs = Seq(
      (1L, "a b c a b c a b c"), // 7 grams, "a b c" ×3 → 428571 ppm
      (2L, "one two three four five"), // 3 grams, all distinct → 333333
      (3L, "x y")) // < 3 tokens: dropped
      .toDF("doc_id", "text")
    val r = Corpus.repetitionScore(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_grams"), x.getAs[Long]("max_rep"),
          x.getAs[Long]("n_distinct"), x.getAs[Long]("rep_ppm"))).toMap
    assert(r === Map(1L -> ((7L, 3L, 3L, 428571L)),
      2L -> ((3L, 1L, 3L, 333333L))))
  }

  test("rrfFusion: shared-seam runs agree on ranks, floors sum exactly") {
    // terms a,b over 3 docs; density = Σtf·1e6/dl: d1 1e6, d2 1e5, d3 5e5
    // → density top-2 = (d1, d3). BM25: d1 matches both terms with the
    // shortest dl (top), d3 beats d2 on length normalization (same tf,
    // same idf2=1, dl 2 vs 10) → bm25 top-2 = (d1, d3) too.
    val docs = Seq((1L, "a a b", "A", 3L), (2L, "a", "A", 10L),
      (3L, "b", "A", 2L)).toDF("doc_id", "text", "source", "n_chars")
    val r = Corpus.rrfFusion(docs, Seq("a", "b"), k = 2).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("r_bm25"), x.getAs[Long]("r_density"),
          x.getAs[Long]("rrf_e9"))).toMap
    // rank 1 both runs: 2·(1e9 div 61); rank 2 both: 2·(1e9 div 62)
    assert(r === Map(1L -> ((1L, 1L, 32786884L)),
      3L -> ((2L, 2L, 32258064L))))
  }

  test("sourceKeywords: source-exclusive tokens outweigh shared ones") {
    val docs = Seq((1L, "apple apple common", "A"), (2L, "banana common", "B"))
      .toDF("doc_id", "text", "source")
    val r = Corpus.sourceKeywords(docs, k = 2).collect()
      .map(x => (x.getAs[String]("source"), x.getAs[String]("tok")) ->
        (x.getAs[Long]("score"), x.getAs[Long]("rank"))).toMap
    // S=2: exclusive tokens weight len(bin(2))=2, shared weight len(bin(1))=1
    assert(r(("A", "apple")) === ((4L, 1L)))  // tf 2 · 2
    assert(r(("A", "common")) === ((1L, 2L)))
    assert(r(("B", "banana")) === ((2L, 1L)))
    assert(r(("B", "common")) === ((1L, 2L)))
  }

  test("docSpanShare: repeated windows flag, unique ones do not") {
    import spark.implicits._
    // 32-token window A appears in docs 1 and 2; doc 3 is unique
    val winA = (1 to 32).map(i => "a" + i).mkString(" ")
    val winB = (1 to 32).map(i => "b" + i).mkString(" ")
    val winC = (1 to 32).map(i => "c" + i).mkString(" ")
    val docs = Seq(
      (1L, winA + " " + winB, "s"), // windows {A, B}: A shared -> 1/2
      (2L, winA, "s"),              // {A}: shared -> 1/1
      (3L, winC, "s"))              // {C}: unique -> 0/1
      .toDF("doc_id", "text", "source")
    val r = Corpus.docSpanShare(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_windows"), x.getAs[Long]("n_shared"),
          x.getAs[Long]("shared_ppm"))).toMap
    assert(r(1L) === ((2L, 1L, 500000L)))
    assert(r(2L) === ((1L, 1L, 1000000L)))
    assert(r(3L) === ((1L, 0L, 0L)))
    // self-repetition counts as shared: one doc containing A twice
    val selfRep = Seq((9L, winA + " " + winA, "s")).toDF("doc_id", "text", "source")
    val s = Corpus.docSpanShare(selfRep).collect().head
    assert(s.getAs[Long]("n_shared") === 2L)
    assert(s.getAs[Long]("shared_ppm") === 1000000L)
  }
}
