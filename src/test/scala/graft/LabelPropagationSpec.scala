package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Reco
import graft.plans.LabelPropagation

class LabelPropagationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lp(edges: Seq[(Long, Long)]): Map[Long, Long] =
    LabelPropagation.run(Reco.undirected(edges.toDF("src", "dst")))
      .as[(Long, Long)].collect().toMap

  test("complete triangle converges to the max label") {
    val labels = lp(Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(labels === Map(1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("disjoint components never share a label") {
    val labels = lp(Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L)))
    val c1 = Set(1L, 2L, 3L).map(labels)
    val c2 = Set(10L, 11L, 12L).map(labels)
    assert(c1.size === 1 && c2.size === 1 && c1 != c2)
  }

  test("labels are always drawn from vertex ids") {
    val labels = lp(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    val ids = Set(1L, 2L, 3L, 4L)
    assert(labels.keySet === ids)
    assert(labels.values.toSet.subsetOf(ids))
  }

  test("fixpoint form equals the fixed-round form on the reference fixture") {
    // two triangles: converges well inside 5 rounds, so the early-exit
    // variant must land on EXACTLY the reference-faithful run(5) labels,
    // and must have stopped before burning all 50 allowed supersteps
    val edges = Reco.undirected(Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L))
      .toDF("src", "dst"))
    val fixedRounds = LabelPropagation.run(edges)
      .as[(Long, Long)].collect().toMap
    val (conv, rounds) = LabelPropagation.runUntilConverged(edges)
    assert(conv.as[(Long, Long)].collect().toMap === fixedRounds)
    assert(rounds < 5,
      s"two triangles converge in <5 supersteps, ran $rounds")
  }

  test("fixpoint form terminates on a 2-cycle oscillator via maxIters") {
    // a single edge oscillates under synchronous LP (each endpoint adopts
    // the other's label every round) — the maxIters bound must end it
    val edges = Reco.undirected(Seq((1L, 2L)).toDF("src", "dst"))
    val (labels, rounds) = LabelPropagation.runUntilConverged(edges, maxIters = 6)
    assert(rounds === 6)
    assert(labels.as[(Long, Long)].collect().toMap.keySet === Set(1L, 2L))
  }
}
