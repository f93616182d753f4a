package graft

import org.apache.spark.sql.functions.{array_distinct, col}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Reco

/** Property-based invariants (SURVEY.md §5.3) over small generated rating
  * tables. ScalaCheck generators sampled under fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline cache, so sampling is
  * driven manually — still property-shaped, still deterministic).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ratingGen: Gen[List[(Long, Long, Double)]] =
    Gen.listOfN(25, for {
      u <- Gen.choose(1L, 8L)
      p <- Gen.choose(1L, 6L)
      r <- Gen.oneOf(1.0, 2.0, 3.0, 4.0, 5.0)
    } yield (u, p, r))

  private def samples(n: Int): Seq[List[(Long, Long, Double)]] =
    (1 to n).flatMap(i => ratingGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("co-rating pairs are canonical, deduped, bounded by sum of C(k,2)") {
    for (rows <- samples(5)) {
      val df = rows.toDF("userId", "productId", "rating")
      val p = Reco.coRatingPairs(df).as[(Long, Long)].collect()
      assert(p.forall { case (a, b) => a < b })
      assert(p.distinct.length === p.length)
      val bound = rows.map(t => (t._1, t._2)).distinct
        .groupBy(_._2).values
        .map { g => val k = g.map(_._1).distinct.size.toLong; k * (k - 1) / 2 }
        .sum
      assert(p.length <= bound)
    }
  }

  test("recommendations exclude already-rated products (the :74 invariant)") {
    for (rows <- samples(5)) {
      val df = rows.toDF("userId", "productId", "rating").select("userId", "productId")
      val labels = df.select($"userId".as("id")).distinct()
        .withColumn("label", $"id" % 2) // arbitrary 2-community split
      val recs = Reco.recommendations(labels, df)
        .select($"userId", org.apache.spark.sql.functions.explode($"recommendedProducts").as("p"))
        .as[(Long, Long)].collect().toSet
      val rated = rows.map(t => (t._1, t._2)).toSet
      assert((recs & rated).isEmpty)
    }
  }

  test("sampleSplit buckets are a partition: disjoint and exhaustive") {
    for (rows <- samples(5)) {
      val df = rows.toDF("userId", "productId", "rating")
      val split = Reco.sampleSplit(df, maxUser = 1000)
      assert(split.count() === df.count())
      assert(split.where($"bucket" =!= 0 && $"bucket" =!= 1).count() === 0)
    }
  }

  private val docGen: Gen[List[(Long, String, String, Long)]] =
    Gen.listOfN(30, for {
      id <- Gen.choose(1L, 1000L)
      lang <- Gen.oneOf("en", "de", "fr")
      src <- Gen.oneOf("web", "news", "wiki")
      n <- Gen.choose(1L, 500L)
    } yield (id, lang, src, n)).map(_.distinctBy(_._1))

  private def docSamples(n: Int): Seq[List[(Long, String, String, Long)]] =
    (1 to n).flatMap(i => docGen.apply(Gen.Parameters.default, Seed(100L + i)))

  test("packSequences: every doc gets one bin, offsets < capacity, bins monotone per source") {
    for (rows <- docSamples(5)) {
      val df = rows.toDF("doc_id", "lang", "source", "n_chars")
      val cap = 256L
      val packed = graft.operators.TrainingMix.packSequences(df, cap)
        .select("doc_id", "source", "n_chars", "bin", "bin_offset")
        .as[(Long, String, Long, Long, Long)].collect()
      assert(packed.length === rows.length) // exactly one row per doc
      assert(packed.forall(r => r._5 >= 0 && r._5 < cap))
      packed.groupBy(_._2).values.foreach { g =>
        val inOrder = g.sortBy(_._1)
        // bins never decrease along doc_id order, and offset+size rolls
        // consistently: next prev-sum = this prev-sum + n_chars
        val prefixes = inOrder.scanLeft(0L)((acc, r) => acc + r._3)
        inOrder.zip(prefixes).foreach { case (r, prefix) =>
          assert(r._4 === prefix / cap && r._5 === prefix % cap)
        }
      }
    }
  }

  private val textGen: Gen[List[(Long, String)]] =
    Gen.listOfN(12, Gen.choose(0, 150)).map(_.zipWithIndex.map { case (n, i) =>
      // deterministic pseudo-words; n=0 yields the empty string (1 token)
      (i.toLong, (1 to n).map(j => s"w${(i * 31 + j * 7) % 40}").mkString(" "))
    })

  private def textSamples(n: Int): Seq[List[(Long, String)]] =
    (1 to n).flatMap(i => textGen.apply(Gen.Parameters.default, Seed(100L + i)))

  private val eventGen: Gen[List[(Long, java.sql.Timestamp, Long, String)]] =
    Gen.listOfN(40, for {
      u <- Gen.choose(1L, 10L)
      typ <- Gen.oneOf("view", "click", "purchase", "other")
      sec <- Gen.choose(0L, 3600L)
    } yield (u, typ, sec)).map(_.zipWithIndex.map { case ((u, typ, sec), i) =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + sec * 1000L), u, typ)
    })

  private def eventSamples(n: Int): Seq[List[(Long, java.sql.Timestamp, Long, String)]] =
    (1 to n).flatMap(i => eventGen.apply(Gen.Parameters.default, Seed(200L + i)))

  test("conversionFunnel: stage counts monotone non-increasing, rates in [0,1], exact recompute") {
    for (rows <- eventSamples(5)) {
      val df = rows.toDF("event_id", "ts", "user_id", "event_type")
      val r = graft.operators.TimeWindows.conversionFunnel(df).collect()
        .map(row => row.getAs[Int]("stage") ->
          (row.getAs[Long]("n_users"), row.getAs[Double]("conv_from_prev"),
            row.getAs[Double]("conv_from_start")))
        .toMap
      assert(r.keySet === Set(1, 2, 3))
      // the funnel can only narrow
      assert(r(1)._1 >= r(2)._1 && r(2)._1 >= r(3)._1)
      r.values.foreach { case (_, prev, start) =>
        assert(prev >= 0.0 && prev <= 1.0 && start >= 0.0 && start <= 1.0)
      }
      assert(r(1)._2 === 1.0 && r(1)._3 === 1.0)
      // direct row-wise recomputation of the temporal-order semantics
      val byUser = rows.groupBy(_._3)
      val tView = byUser.flatMap { case (u, es) =>
        es.filter(_._4 == "view").map(_._2.getTime) match {
          case Nil => None; case vs => Some(u -> vs.min)
        }
      }
      val tClick = tView.flatMap { case (u, tv) =>
        byUser(u).filter(e => e._4 == "click" && e._2.getTime >= tv).map(_._2.getTime) match {
          case Nil => None; case cs => Some(u -> cs.min)
        }
      }
      val nPurch = tClick.count { case (u, tc) =>
        byUser(u).exists(e => e._4 == "purchase" && e._2.getTime >= tc)
      }
      assert(r(1)._1 === tView.size.toLong)
      assert(r(2)._1 === tClick.size.toLong)
      assert(r(3)._1 === nPurch.toLong)
    }
  }

  test("chunkDocuments: dense chunk ids, full non-last chunks, exact tail coverage") {
    for (rows <- textSamples(5)) {
      val df = rows.toDF("doc_id", "text")
      val (k, stride) = (16, 12)
      val chunks = graft.operators.TrainingMix.chunkDocuments(df, k, stride)
        .select("doc_id", "chunk_id", "n_tokens")
        .as[(Long, Int, Int)].collect()
      val nTok = rows.map { case (id, t) => id -> t.split("\\s+").length }.toMap
      chunks.groupBy(_._1).foreach { case (id, g) =>
        val byId = g.sortBy(_._2)
        assert(byId.map(_._2).toSeq === byId.indices.toSeq) // dense 0..nc-1
        byId.init.foreach(c => assert(c._3 === k)) // non-last chunks are full
        val last = byId.last
        assert(last._3 >= 1 && last._3 <= k)
        // tail coverage: last chunk ends exactly at the doc's token count
        assert(last._2 * stride + last._3 === nTok(id))
      }
      assert(chunks.map(_._1).distinct.length === rows.length) // no doc dropped
    }
  }

  test("filterFunnel: stage arithmetic matches a row-wise recomputation") {
    for (rows <- textSamples(5)) {
      val df = rows.toDF("doc_id", "text")
        .selectExpr("doc_id", "text", "length(text) AS n_chars")
      val stages = graft.functions.TextAnalysis.filterFunnel(df).collect()
        .map(r => r.getAs[String]("stage") ->
          (r.getAs[Long]("docs_in"), r.getAs[Long]("survivors"), r.getAs[Long]("dropped")))
        .toMap
      assert(stages.keySet === Set("1_length", "2_repetition", "3_language"))
      // chain + arithmetic invariants
      assert(stages("1_length")._1 === rows.length.toLong)
      assert(stages("2_repetition")._1 === stages("1_length")._2)
      assert(stages("3_language")._1 === stages("2_repetition")._2)
      stages.values.foreach { case (in, out, drop) => assert(drop === in - out) }
      // the funnel's final survivors equal a direct conjunctive filter
      val direct = df.where(
        """n_chars >= 200
          |AND CAST(size(array_distinct(split(lower(trim(text)), '\\s+'))) AS DOUBLE)
          |    / size(split(lower(trim(text)), '\\s+')) >= 0.4
          |AND CAST(size(regexp_extract_all(lower(text),
          |      '\\b(the|of|and|to|in|der|die|und|ist|nicht|le|la|et|les|des)\\b', 0)) AS DOUBLE)
          |    / size(split(lower(trim(text)), '\\s+')) >= 0.02""".stripMargin)
        .count()
      assert(stages("3_language")._2 === direct)
    }
  }

  test("balancedMix keeps a prefix-closed set per language and stops within one doc of budget") {
    for (rows <- docSamples(5)) {
      val df = rows.toDF("doc_id", "lang", "source", "n_chars")
      val budget = 400L
      val kept = graft.operators.TrainingMix.balancedMix(df, budget)
        .select("doc_id", "lang").as[(Long, String)].collect()
        .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      rows.groupBy(_._2).foreach { case (lang, docs) =>
        val inOrder = docs.sortBy(_._1)
        val keptIds = kept.getOrElse(lang, Set.empty)
        // kept = the shortest doc_id-prefix whose char sum reaches budget
        val expected = inOrder.scanLeft(0L)((acc, d) => acc + d._4).zip(inOrder)
          .collect { case (prevSum, d) if prevSum < budget => d._1 }.toSet
        assert(keptIds === expected, s"lang=$lang")
      }
    }
  }

  test("tableChecksum: permutation/partitioning invariant; equals the hand-summed hashes") {
    val rowGen: Gen[List[(Long, String)]] =
      Gen.listOfN(20, for {
        k <- Gen.choose(1L, 50L)
        s <- Gen.oneOf("x", "y", "zz", "")
      } yield (k, s))
    for (seed <- 1 to 5; rows <- rowGen(Gen.Parameters.default, Seed(seed.toLong))) {
      val df = rows.toDF("k", "s")
      def sum(d: org.apache.spark.sql.DataFrame): Long =
        graft.operators.Relational.tableChecksum(Seq(("t", d, Seq("k", "s"))))
          .collect().head.getAs[Long]("checksum")
      val base = sum(df)
      assert(base === sum(rows.reverse.toDF("k", "s").repartition(5)))
      // cross-check against the scala-side md5 fold
      val expected = rows.map { case (k, s) =>
        val joined = s"$k\u0001$s"
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(joined.getBytes("UTF-8"))
        java.lang.Long.parseLong(md5.take(4).map("%02x".format(_)).mkString, 16)
      }.sum
      assert(base === expected)
    }
  }

  test("fused md5ShingleHashes equals the composed shingle->md5 pipeline") {
    import graft.functions.TextAnalysis
    val wordGen = Gen.listOfN(30, Gen.oneOf(
      "alpha", "beta", "gamma", "delta", "x", "", "longword" * 3))
    for (seed <- 1 to 8; words <- wordGen(Gen.Parameters.default, Seed(seed.toLong));
         n <- Seq(1, 2, 3, 8)) {
      val text = words.mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
        .select(TextAnalysis.tokens(col("text")).as("t"))
      // ALL-occurrence equality: fused == md5Prefix32Array ∘ shinglesOfTokensAll
      val fused = df.select(TextAnalysis.md5ShingleHashes(col("t"), n).as("h"))
        .head().getSeq[Long](0)
      val composed = df.select(TextAnalysis.md5Prefix32Array(
          TextAnalysis.shinglesOfTokensAll(col("t"), n)).as("h"))
        .head().getSeq[Long](0)
      assert(fused === composed, s"seed=$seed n=$n text='$text'")
      // distinct-form equality: array_distinct over both sides agrees
      // (the substitution shingleSets/bandedSignatures relies on)
      val fusedD = df.select(array_distinct(
          TextAnalysis.md5ShingleHashes(col("t"), n)).as("h"))
        .head().getSeq[Long](0)
      val composedD = df.select(array_distinct(TextAnalysis.md5Prefix32Array(
          TextAnalysis.shinglesOfTokens(col("t"), n))).as("h"))
        .head().getSeq[Long](0)
      assert(fusedD === composedD, s"distinct seed=$seed n=$n")
    }
  }

  test("distributionDrift conserves counts and keeps chi2 non-negative") {
    val evGen: Gen[List[(String, Int)]] =
      Gen.listOfN(40, for {
        t <- Gen.oneOf("a", "b", "c")
        d <- Gen.choose(0, 9)
      } yield (t, d))
    for (seed <- 1 to 5; rows <- evGen(Gen.Parameters.default, Seed(seed.toLong))) {
      val df = rows.map { case (t, d) =>
        (t, new java.sql.Timestamp((d * 86400L + 1) * 1000L))
      }.toDF("event_type", "ts")
      val out = graft.operators.Relational.distributionDrift(df).collect()
      assert(out.map(r =>
        r.getAs[Long]("n_early") + r.getAs[Long]("n_late")).sum === rows.size.toLong)
      out.foreach { r =>
        val chi2 = r.getAs[Double]("chi2_contrib")
        assert(chi2.isNaN || chi2 >= 0.0, s"negative chi2: $r")
      }
    }
  }
}
