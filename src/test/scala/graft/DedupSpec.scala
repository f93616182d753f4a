package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "spark catalyst optimizer pushes filters below joins and prunes columns " +
    "for parquet scans while tungsten generates compact bytecode for each stage"
  private val nearDup = base.replace("compact", "efficient") // 1-word edit
  private val distinctDoc = "entirely different words about streaming watermarks and state stores " +
    "that share nothing with the other documents in this corpus at all whatsoever"

  private val docs = Seq(
    (0L, base), (1L, nearDup), (2L, distinctDoc), (3L, base))
    .toDF("doc_id", "text")

  test("exactGroups collapses identical texts to min doc_id") {
    val g = Dedup.exactGroups(docs).select("doc_id", "n_copies")
      .as[(Long, Long)].collect().toMap
    assert(g(0L) === 2L) // docs 0 and 3 identical
    assert(g(1L) === 1L)
    assert(!g.contains(3L))
  }

  test("ngramJaccardPairs finds the planted near-dup with high jaccard") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .select("a_id", "b_id", "jaccard")
      .as[(Long, Long, Double)].collect()
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L))) // near-dup found
    assert(keys.contains((0L, 3L))) // exact dup: jaccard 1.0
    assert(pairs.find(p => (p._1, p._2) == (0L, 3L)).get._3 === 1.0)
    assert(!keys.exists(k => k._1 == 2L || k._2 == 2L)) // distinct doc untouched
    assert(pairs.forall(p => p._1 < p._2)) // canonical ordering, no self-pairs
  }

  test("containmentPairs finds the quote Jaccard misses; direction is correct") {
    // doc 4 = a 6-token excerpt of base (4 shingles, all inside base's 21):
    // containment(4 -> 0) = 1.0 while jaccard = 4/21 < 0.2
    val quote = (4L, "catalyst optimizer pushes filters below joins")
    val withQuote = (docs.as[(Long, String)].collect().toSeq :+ quote)
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(withQuote, threshold = 0.9)
      .select("a_id", "b_id", "c_a_in_b", "c_b_in_a")
      .as[(Long, Long, Double, Double)].collect()
      .map(p => (p._1, p._2) -> (p._3, p._4)).toMap
    assert(pairs.contains((0L, 4L)))
    assert(pairs((0L, 4L))._2 === 1.0) // the SMALLER doc is fully contained
    assert(pairs((0L, 4L))._1 < 0.3)   // ...while the reverse direction is small
    // and the same pair is invisible to the symmetric Jaccard threshold
    val jk = Dedup.ngramJaccardPairs(withQuote, threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(!jk.contains((0L, 4L)))
  }

  test("minhash signature values fit in Int: the compact form's cast is lossless") {
    // bandedSignaturesStreamCompact casts array<long> -> array<int>; under
    // Spark's default ANSI mode a value >= 2^31 would throw CAST_OVERFLOW
    // at runtime in streaming queries. The invariant comes from
    // MinHashSignature's mod-p reduction (p = 2^31-1): assert it here so a
    // future signature-range change fails loudly in this suite instead.
    val maxSig = Dedup.bandedSignaturesStream(docs).select(col("sig"))
      .select(explode(col("sig")).as("v")).agg(max(col("v"))).as[Long].head()
    assert(maxSig < Int.MaxValue.toLong,
      s"minhash value $maxSig would overflow the compact form's int cast")
  }

  test("minhashPairs surfaces the same near-dup candidates") {
    val pairs = Dedup.minhashPairs(docs)
      .select("a_id", "b_id", "est_jaccard")
      .as[(Long, Long, Double)].collect()
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 3L)))
    assert(pairs.find(p => (p._1, p._2) == (0L, 3L)).get._3 === 1.0)
    assert(keys.contains((0L, 1L)))
    assert(!keys.exists(k => k._1 == 2L || k._2 == 2L))
  }

  test("nearDupClusters: planted dups share a cluster, canonical = min doc id") {
    val out = Dedup.nearDupClusters(docs)
      .select("doc_id", "cluster", "is_canonical")
      .as[(Long, Long, Boolean)].collect()
    val byDoc = out.map(r => r._1 -> r).toMap
    assert(out.length === docs.count())
    // 0 and 3 are exact dups (same minhash) -> same cluster rooted at 0
    assert(byDoc(0L)._2 === 0L && byDoc(3L)._2 === 0L)
    assert(byDoc(0L)._3 && !byDoc(3L)._3)
    // distinct doc 2 is its own singleton cluster and canonical
    assert(byDoc(2L)._2 === 2L && byDoc(2L)._3)
    // exactly one canonical per cluster
    out.groupBy(_._2).values.foreach { members =>
      assert(members.count(_._3) === 1)
    }
  }

  test("incrementalNearDups flags only incoming docs with a corpus near-dup") {
    val corpus = Seq((10L, base), (11L, distinctDoc)).toDF("doc_id", "text")
    val incoming = Seq(
      (20L, nearDup), // planted: near-dup of corpus doc 10
      (21L, "completely unrelated sentences about connected component fingerprints " +
        "and alternating star rounds that converge in logarithmic supersteps"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNearDups(corpus, incoming)
      .select("doc_id", "n_matches", "best_est", "dup_of_min")
      .as[(Long, Long, Double, Long)].collect()
    assert(out.map(_._1).toSet === Set(20L)) // 21 untouched; corpus never self-flagged
    val r = out.head
    assert(r._2 === 1L && r._3 >= 0.5 && r._4 === 10L)
  }

  test("incrementalNearDups on testdata == minhash pairs that cross the batch/corpus split") {
    // q59's exact wiring: incoming = doc_id%10<3, corpus = the rest. The
    // flagged set must be exactly the incoming endpoints of full-corpus
    // minhashPairs whose endpoints straddle the split (banding a subset is
    // banding the full set, filtered) — this pins q59 to the planted
    // testdata near-dups without re-deriving them by hand.
    val tdocs = Tables.documents(spark, TestSpark.sf)
    val flagged = Dedup.incrementalNearDups(
      tdocs.where($"doc_id" % 10 >= 3), tdocs.where($"doc_id" % 10 < 3))
      .select("doc_id").as[Long].collect().toSet
    val expected = Dedup.minhashPairs(tdocs)
      .where(($"a_id" % 10 < 3) =!= ($"b_id" % 10 < 3))
      .select(when($"a_id" % 10 < 3, $"a_id").otherwise($"b_id").as("doc_id"))
      .as[Long].collect().toSet
    assert(flagged === expected)
    assert(flagged.nonEmpty) // the planted near-dups do cross the split
  }

  test("crossCorpusContamination finds the planted shared 8-gram and nothing else") {
    val sharedRun = "alpha beta gamma delta epsilon zeta eta theta" // exactly 8 tokens
    val train = Seq(
      (1L, "prefix words first then " + sharedRun + " with trailing content here"),
      (2L, distinctDoc)).toDF("doc_id", "text")
    val heldOut = Seq((100L, "other introduction " + sharedRun + " different tail entirely"))
      .toDF("doc_id", "text")
    val out = Dedup.crossCorpusContamination(train, heldOut)
      .select("doc_id", "n_shared_grams", "n_test_docs")
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._1).toSet === Set(1L)) // doc 2 clean
    // the 8-token run embedded in different contexts yields exactly one
    // shared 8-gram, from exactly one test doc
    assert(out.head._2 === 1L && out.head._3 === 1L)
  }

  test("simhashPairs: identical docs at hamming 0, distinct doc far away") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 8)
      .select("a_id", "b_id", "hamming")
      .as[(Long, Long, Int)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((0L, 3L)) === 0)
    assert(m.contains((0L, 1L)))
    assert(!m.keySet.exists(k => k._1 == 2L || k._2 == 2L))
  }

  test("lshQuality: counts agree with the underlying pair sets, rates bounded") {
    val tdocs = Tables.documents(spark, TestSpark.sf)
    val r = Dedup.lshQuality(tdocs).collect().head
    val nCand = r.getAs[Long]("n_candidates")
    val nTruth = r.getAs[Long]("n_truth")
    val nHits = r.getAs[Long]("n_hits")
    assert(nCand === Dedup.minhashPairs(tdocs).count())
    assert(nTruth === Dedup.ngramJaccardPairs(tdocs).count())
    assert(nHits <= math.min(nCand, nTruth))
    val (p, rec) = (r.getAs[Double]("lsh_precision"), r.getAs[Double]("lsh_recall"))
    assert(p >= 0.0 && p <= 1.0 && rec >= 0.0 && rec <= 1.0)
    // the corpus has planted near-dups (see the calibration case): a sane
    // 16x4 band config must recover a solid majority of true 0.5+ pairs
    assert(nTruth > 0 && rec >= 0.5, s"LSH recall too low: $rec of $nTruth true pairs")
  }

  test("minhash estimates are calibrated against exact jaccard on the real corpus") {
    val tdocs = Tables.documents(spark, TestSpark.sf)
    val exact = Dedup.ngramJaccardPairs(tdocs, threshold = 0.0)
      .select("a_id", "b_id", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val est = Dedup.minhashPairs(tdocs)
      .select("a_id", "b_id", "est_jaccard")
      .as[(Long, Long, Double)].collect()
    assert(est.nonEmpty)
    // every LSH-flagged pair shares ≥1 shingle, and the 64-permutation
    // estimate lands within 0.25 of exact jaccard (binomial 3-sigma ≈ 0.19)
    est.foreach { case (a, b, e) =>
      val x = exact.getOrElse((a, b), 0.0)
      assert(math.abs(e - x) <= 0.25, s"pair ($a,$b): est $e vs exact $x")
    }
  }

  test("dedupWeights down-weights near-dup clusters; weights sum to cluster count") {
    // docs 0, 1, 3 form one near-dup cluster (exact copy + 1-word edit);
    // doc 2 is a singleton
    val w = Dedup.dedupWeights(docs)
      .select("doc_id", "cluster", "weight")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(w(0L) === ((0L, 1.0 / 3)))
    assert(w(1L) === ((0L, 1.0 / 3)))
    assert(w(3L) === ((0L, 1.0 / 3)))
    assert(w(2L) === ((2L, 1.0)))
    // invariant: total weight = number of clusters (each cluster sums to 1)
    assert(w.values.map(_._2).sum === 2.0)
  }

  test("sortedNeighborhoodPairs: prefix-adjacent near-dups pair, cross-block docs never do") {
    // base/nearDup/base-copy share the first 16 chars -> same block, adjacent
    // in sort order; distinctDoc lands in another block entirely
    val pairs = Dedup.sortedNeighborhoodPairs(docs).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        (r.getAs[Int]("inter"), r.getAs[Int]("un"), r.getAs[Double]("j")))
      .toMap
    // the three "spark catalyst..." docs share a 16-char sort key, so order
    // falls back to doc_id (0, 1, 3) and w=3 yields all 3 in-window pairs
    assert(pairs.keySet === Set((0L, 1L), (0L, 3L), (1L, 3L)))
    // identical docs: J = 1
    val (i03, u03, j03) = pairs((0L, 3L))
    assert(i03 === u03 && j03 === 1.0)
    // one-word edit: 19 shared of 21 distinct union tokens
    assert(pairs((0L, 1L))._3 > 0.8 && pairs((0L, 1L))._3 < 1.0)
    // candidate bound: never more than |docs| * (w-1) pairs pre-filter
    assert(pairs.size <= docs.count() * 2)
  }

  test("editDistancePairs: one-word edit passes 20%, distinct docs never pair") {
    val r = Dedup.editDistancePairs(docs).collect()
      .map(x => (x.getAs[Long]("a_id"), x.getAs[Long]("b_id")) ->
        (x.getAs[Int]("lev"), x.getAs[Int]("max_len"))).toMap
    // identical copies at distance 0; the compact->efficient edit is
    // |"efficient"| - overlap = a small fraction of ~150 chars
    assert(r.contains((0L, 3L)) && r((0L, 3L))._1 === 0)
    assert(r.contains((0L, 1L)) && r((0L, 1L))._1 > 0)
    assert(r((0L, 1L))._1 * 100 <= r((0L, 1L))._2 * 20)
    // the distinct doc shares no block/neighborhood with the others
    assert(!r.keySet.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("rerankCandidates: cross-multiplied cos^2, identical vectors hit 1e6") {
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("a_id", "b_id")
    val vecs = Seq(
      (1L, 0L, 2L), (1L, 1L, 1L),   // ‖a‖² = 5
      (2L, 0L, 1L), (2L, 2L, 3L),   // ‖b‖² = 10, dot = 2
      (3L, 5L, 2L), (4L, 5L, 2L))   // identical → cos² = 1
      .toDF("doc_id", "dim", "weight")
    val r = Dedup.rerankCandidates(pairs, vecs).collect()
      .map(x => (x.getAs[Long]("a_id"), x.getAs[Long]("b_id")) ->
        (x.getAs[Long]("dot"), x.getAs[Long]("cos2_ppm"))).toMap
    assert(r((1L, 2L)) === ((2L, 80000L)))  // 4·1e6 div 50
    assert(r((3L, 4L)) === ((4L, 1000000L)))
  }

  test("ppjoinPairs: prefix filtering loses nothing vs the full inverted index") {
    val corpus = graft.Tables.documents(spark, TestSpark.sf)
    val pp = Dedup.ppjoinPairs(corpus)
      .select("a_id", "b_id", "inter").as[(Long, Long, Long)].collect().toSet
    val full = Dedup.ngramJaccardPairs(corpus)
      .select("a_id", "b_id", "inter").as[(Long, Long, Long)].collect().toSet
    assert(pp === full, "PPJoin must reproduce the exact inverted-index pairs")
    assert(pp.nonEmpty) // the corpus has planted near-dups
  }
}
