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
}
