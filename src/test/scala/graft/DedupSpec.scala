package graft

import org.scalatest.funsuite.AnyFunSuite

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

  test("simhashPairs: identical docs at hamming 0, distinct doc far away") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 8)
      .select("a_id", "b_id", "hamming")
      .as[(Long, Long, Int)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((0L, 3L)) === 0)
    assert(m.contains((0L, 1L)))
    assert(!m.keySet.exists(k => k._1 == 2L || k._2 == 2L))
  }
}
