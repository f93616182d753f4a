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

  test("curriculumPhases cuts the quality score at the fixed 0.5/0.7 bounds") {
    val tdocs = Tables.documents(spark, TestSpark.sf)
    val rows = TextAnalysis.curriculumPhases(tdocs)
      .select("quality_score", "phase").as[(Double, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, p) =>
      val expected = if (q >= 0.7) 3 else if (q >= 0.5) 2 else 1
      assert(p === expected, s"score $q got phase $p")
    }
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

  test("langId separates real text across all five classes (kappa = 1)") {
    // genuine sentences, one per label — the model must be a REAL
    // classifier (every class emittable, stopword/charset profiles that
    // work on natural text). The synthetic corpus is language-blind by
    // measurement (no word rate varies >1.3x across labels), so q267/
    // q268 correctly grade chance there; THIS fixture is what proves
    // the graded model is not degenerate.
    val docs = Seq(
      (1L, "en", "the cat sat on the mat and looked out of the window"),
      (2L, "de", "der hund ist nicht in der küche und die katze schläft"),
      (3L, "fr", "le chat et la souris jouent dans les jardins des voisins"),
      (4L, "es", "el perro y los gatos corren por las calles hacia una plaza"),
      (5L, "zh", "今天天气很好我们一起去公园散步吧"))
      .toDF("doc_id", "lang", "text")
    val preds = TextAnalysis.langId(docs).select("doc_id", "pred_lang")
      .as[(Long, String)].collect().toMap
    assert(preds === Map(1L -> "en", 2L -> "de", 3L -> "fr",
      4L -> "es", 5L -> "zh"))
    val kappa = TextAnalysis.langIdKappa(docs).collect().head
    assert(kappa.getAs[Long]("kappa_ppm") === 1000000L,
      "perfect separation on real text must grade kappa = 1")
    // and the per-class report is all-perfect
    val ev = TextAnalysis.langIdEval(docs).collect()
    assert(ev.length === 5)
    ev.foreach { r =>
      assert(r.getAs[Long]("f1_ppm") === 1000000L,
        s"class ${r.getAs[String]("cls")} must be perfectly scored")
    }
  }

  test("bpeTokenCounts splits GPT-2-style classes and estimates subword pieces") {
    // words: "Hello"(2 pieces), "world"(2), "v"(1); digits: 4, 2 (2 tokens);
    // other: ! . (2 tokens)  →  n_bpe_est = 5 + 2 + 2 = 9
    val df = Seq((1L, "Hello world42, v!")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeTokenCounts(df).collect().head
    assert(r.getAs[Int]("n_words") === 3)
    assert(r.getAs[Int]("n_digit_tokens") === 2)
    assert(r.getAs[Int]("n_other_tokens") === 2)
    assert(r.getAs[Long]("n_bpe_est") === 9L)
  }

  test("rollingFingerprints hashes every char 8-gram; short text yields none") {
    val df = Seq((1L, "abcdefghij"), (2L, "short")).toDF("doc_id", "text")
    val rows = TextAnalysis.rollingFingerprints(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Int]("n_grams") === 3) // positions 1..3 of a 10-char text
    assert(rows(1L).getAs[Int]("n_distinct_fp") === 3)
    assert(rows(1L).getAs[Long]("min_fp") <= rows(1L).getAs[Long]("max_fp"))
    assert(rows(2L).getAs[Int]("n_grams") === 0)
    // identical text regions → identical fingerprints (the winnowing property)
    val dup = Seq((3L, "abcdefgh"), (4L, "abcdefgh")).toDF("doc_id", "text")
    val fps = TextAnalysis.rollingFingerprints(dup).select("min_fp")
      .as[Long].collect()
    assert(fps(0) === fps(1))
  }

  test("topTermsPerDoc ranks rare terms above common ones") {
    val df = Seq(
      (1L, "common zebra common"),
      (2L, "common common"),
      (3L, "common yak")).toDF("doc_id", "text")
    val top = TextAnalysis.topTermsPerDoc(df, k = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("term")).toMap
    // "common" appears in every doc (df=3); zebra/yak are df=1 → rarer wins
    assert(top(1L) === "zebra")
    assert(top(3L) === "yak")
    assert(top(2L) === "common") // only term present
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

  test("repetitionSignals: pure repetition scores 1.0, all-unique grams score 0 dup") {
    val df = Seq(
      (1L, "spam spam spam spam"),          // "spam spam" ×3 → total concentration
      (2L, "alpha beta gamma delta"),       // 3 distinct 2-grams, each once
      (3L, "word"))                         // < 2 tokens → no grams, no row
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(df)
      .select("doc_id", "n_grams", "top_gram_frac", "dup_gram_frac")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L)._2 === 3L && out(1L)._3 === 1.0 && out(1L)._4 === 1.0)
    assert(out(2L)._2 === 3L && out(2L)._3 === 1.0 / 3 && out(2L)._4 === 0.0)
  }

  test("piiRedact masks emails, IPs, and long digit runs; clean text untouched") {
    val df = Seq(
      (1L, "contact john.doe+x@example.com or 192.168.0.1 ref 12345678 ok"),
      (2L, "clean text with a short 123 number"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(df)
      .select("doc_id", "n_emails", "n_ips", "n_long_nums", "redacted")
      .as[(Long, Int, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === 1 && out(1L)._3 === 1 && out(1L)._4 === 1)
    assert(out(1L)._5 === "contact <EMAIL> or <IP> ref <NUM> ok")
    assert(out(2L)._2 === 0 && out(2L)._3 === 0 && out(2L)._4 === 0)
    assert(out(2L)._5 === "clean text with a short 123 number")
  }

  test("winnowing: docs sharing a substring of length >= k+w-1 share a selected fingerprint") {
    val shared = "zqxwvutsrqponmlk" // 16 chars >= 8+4-1
    val df = Seq(
      (1L, "first document prefix " + shared + " and its own tail"),
      (2L, "other beginning " + shared + " completely different end"),
      (3L, "no overlap with anybody here at all in this text"))
      .toDF("doc_id", "text")
    val sel = TextAnalysis.winnowedFingerprints(df)
      .as[(Long, Long)].collect().groupBy(_._1).map { case (d, fps) => d -> fps.map(_._2).toSet }
    assert((sel(1L) intersect sel(2L)).nonEmpty) // winnowing guarantee
    // selection is a subset of the full rolling set and strictly smaller here
    val full = TextAnalysis.rollingFingerprints(df)
      .select("doc_id", "n_distinct_fp").as[(Long, Int)].collect().toMap
    sel.foreach { case (d, fps) => assert(fps.size < full(d)) }
  }

  test("tokenDiversity: hand-counted Simpson and TTR per source") {
    // web: tokens a a a b  -> n=4 types=2 rep=3·2+0=6, simpson=6/12=0.5,
    // ttr=0.5; news: all distinct -> simpson 0, ttr 1
    val df = Seq(
      (1L, "a a", "en", "web", 3L), (2L, "a b", "en", "web", 3L),
      (3L, "x y z", "en", "news", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.tokenDiversity(df).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("n_types"),
          x.getAs[Long]("rep_pairs"), x.getAs[Double]("simpson"),
          x.getAs[Double]("ttr"))).toMap
    assert(r("web") === ((4L, 2L, 6L, 0.5, 0.5)))
    assert(r("news") === ((3L, 3L, 0L, 0.0, 1.0)))
  }

  test("tokenFertility: BPE pieces per word and chars per piece, by language") {
    val docs = Seq(
      (1L, "abcd ef", "en", 7L),        // 2 words → 1+1 pieces
      (2L, "abcdefgh x9", "de", 11L))   // words [abcdefgh, x]: 2+1 pieces +1 digit
      .toDF("doc_id", "text", "lang", "n_chars")
    val r = TextAnalysis.tokenFertility(docs).collect()
      .map(x => x.getAs[String]("lang") ->
        (x.getAs[Long]("total_words"), x.getAs[Long]("total_bpe"),
          x.getAs[Long]("fertility_milli"),
          x.getAs[Long]("chars_per_token_milli"))).toMap
    assert(r("en") === ((2L, 2L, 1000L, 3500L)))
    assert(r("de") === ((2L, 4L, 2000L, 2750L)))
  }

  test("charEntropy: floor-log2 proxy matches hand numbers, zero for runs") {
    val docs = Seq((1L, "aaab"), (2L, "aaaa")).toDF("doc_id", "text")
    val r = TextAnalysis.charEntropy(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_chars_counted"), x.getAs[Long]("n_distinct_chars"),
          x.getAs[Long]("sum_c_log"), x.getAs[Long]("entropy_milli_bits")))
      .toMap
    // "aaab": n=4 (⌊log₂⌋=2), Σc·⌊log₂c⌋ = 3·1 + 1·0 = 3 → (8−3)·1000/4
    assert(r(1L) === ((4L, 2L, 3L, 1250L)))
    // a run is perfectly compressible: n·⌊log₂n⌋ − n·⌊log₂n⌋ = 0
    assert(r(2L) === ((4L, 1L, 8L, 0L)))
  }

  test("readability: hand counts, two documented floors, fragment floor of 1") {
    import spark.implicits._
    // "the cat sat. it ran!" -> 2 sentences, 5 words, vowel groups:
    // e, a, a, i, a -> 5
    val docs = Seq((1L, "the cat sat. it ran!"), (2L, "xyz"), (3L, "!!!"))
      .toDF("doc_id", "text")
    val r = graft.functions.TextAnalysis.readability(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    val d1 = r(1L)
    assert(d1.getAs[Long]("n_sentences") === 2L)
    assert(d1.getAs[Long]("n_words") === 5L)
    assert(d1.getAs[Long]("n_syllables") === 5L)
    // 206835 - (1015*5) div 2 - (84600*5) div 5 = 206835 - 2537 - 84600
    assert(d1.getAs[Long]("fre_milli") === 206835L - 2537L - 84600L)
    // no sentence punctuation: floor of 1 sentence; y counts as a vowel
    val d2 = r(2L)
    assert(d2.getAs[Long]("n_sentences") === 1L)
    assert(d2.getAs[Long]("n_words") === 1L && d2.getAs[Long]("n_syllables") === 1L)
    // no words at all: fre is NULL, not a division error
    assert(r(3L).isNullAt(r(3L).fieldIndex("fre_milli")))
  }

  test("langIdEval: hand confusion — never-predicted classes report zeros") {
    val docs = Seq(
      (1L, "en", "the of and"),       // correct en
      (2L, "fr", "le la et"),         // correct fr
      (3L, "es", "hola mundo"),       // all-zero hits → en tiebreak: en fp
      (4L, "en", "der die und ist"))  // german stopwords: de fp, en fn
      .toDF("doc_id", "lang", "text")
    val r = TextAnalysis.langIdEval(docs).collect()
      .map(x => x.getAs[String]("cls") ->
        (x.getAs[Long]("tp"), x.getAs[Long]("fp"), x.getAs[Long]("fn"),
          x.getAs[Long]("precision_ppm"), x.getAs[Long]("recall_ppm"),
          x.getAs[Long]("f1_ppm"))).toMap
    assert(r("en") === ((1L, 1L, 1L, 500000L, 500000L, 500000L)))
    assert(r("fr") === ((1L, 0L, 0L, 1000000L, 1000000L, 1000000L)))
    assert(r("es") === ((0L, 0L, 1L, 0L, 0L, 0L)))  // never predicted
    assert(r("de") === ((0L, 1L, 0L, 0L, 0L, 0L)))  // never true
  }

  test("langIdKappa: chance-corrected agreement on the same hand confusion") {
    val docs = Seq(
      (1L, "en", "the of and"), (2L, "fr", "le la et"),
      (3L, "es", "hola mundo"), (4L, "en", "der die und ist"))
      .toDF("doc_id", "lang", "text")
    val r = TextAnalysis.langIdKappa(docs).collect().head
    // N=4, agree=2, pe = en 2·2 + fr 1·1 = 5 (es/de have a zero margin)
    assert(r.getAs[Long]("n_docs") === 4L)
    assert(r.getAs[Long]("n_agree") === 2L)
    assert(r.getAs[Long]("pe_num") === 5L)
    assert(r.getAs[Long]("kappa_ppm") === 3000000L / 11L)  // (8−5)e6/(16−5)
  }

  test("RollingPolyUtil: rolling hashes equal the direct polynomial at every position") {
    import org.apache.spark.sql.graft.RollingPolyUtil
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnopqrstuvwxyz 0123456789"
    for (_ <- 0 until 50) {
      val n = rnd.nextInt(40)
      val s = Array.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = RollingPolyUtil.hashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val bytes = s.getBytes("UTF-8")
      val want =
        if (n < RollingPolyUtil.K) Array.emptyLongArray
        else (0 to n - RollingPolyUtil.K).map { i =>
          (0 until RollingPolyUtil.K).foldLeft(0L) { (h, j) =>
            (h * RollingPolyUtil.B + (bytes(i + j) & 0xFF)) % RollingPolyUtil.M
          }
        }.toArray
      assert(got.toSeq === want.toSeq, s"text=[$s]")
    }
  }

  test("WinnowUtil: fused deque selection equals naive distinct window-min") {
    import org.apache.spark.sql.graft.{RollingPolyUtil, WinnowUtil}
    val rnd = new scala.util.Random(7)
    for (w <- Seq(2, 4, 5); _ <- 0 until 25) {
      val n = rnd.nextInt(60)
      val s = Array.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString // heavy repeats
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val fps = RollingPolyUtil.hashes(u)
      val want =
        if (fps.length < w) Set.empty[Long]
        else fps.sliding(w).map(_.min).toSet
      assert(WinnowUtil.select(u, w).toSet === want, s"text=[$s] w=$w")
    }
  }

  test("AsciiGuard: non-ASCII text fails loudly in both rolling-gram utils") {
    import org.apache.spark.sql.graft.{RollingPackUtil, RollingPolyUtil}
    val bad = org.apache.spark.unsafe.types.UTF8String.fromString("café latte")
    val e1 = intercept[IllegalArgumentException](RollingPolyUtil.hashes(bad))
    assert(e1.getMessage.contains("pure-ASCII"))
    val e2 = intercept[IllegalArgumentException](RollingPackUtil.packs(bad))
    assert(e2.getMessage.contains("pure-ASCII"))
    // ASCII passes untouched
    val ok = org.apache.spark.unsafe.types.UTF8String.fromString("cafe latte")
    assert(RollingPolyUtil.hashes(ok).nonEmpty && RollingPackUtil.packs(ok).nonEmpty)
  }

  test("rollingPoly32 codegen path equals the interpreted util") {
    import org.apache.spark.sql.graft.RollingPolyUtil
    val texts = Seq("", "short", "exactly8", "a longer text with spaces 123")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.rollingPoly32(col("text")).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = RollingPolyUtil.hashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)).toSeq
      assert(got(i.toLong) === want, s"text=[$t]")
    }
  }
}
