package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's first gate: `SparkEntry.entry` must return rows on sf0.001
  * with a caller-supplied session (no session config of ours can be assumed).
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry() produces recommendation rows on the smoke dataset") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSet === Set("userId", "recommendedProducts"))
    assert(df.count() > 0)
  }

  test("every oracleSql key names an existing query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracleSql without query: $unknown")
  }

  test("every registered query has an oracle twin (no silent rows-only downgrades)") {
    // the round-4 failure mode: a query without an oracleSql entry silently
    // drops from hash-grading to a weaker rows-only check
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"query without oracle: $unoracled")
  }

  test("registry split: families are key-disjoint and compose losslessly") {
    // r11 mechanical split of the single-file registry: `++` composition
    // would silently SHADOW a duplicated key, so disjointness is the
    // invariant that makes the split zero-risk
    val perFamily = SparkEntry.registries.map { case (name, qs, os) =>
      assert(qs.keySet === os.keySet,
        s"family $name: queries and oracles must pair 1:1")
      (name, qs.keySet)
    }
    val total = perFamily.map(_._2.size).sum
    assert(total === SparkEntry.queries.size,
      "family key sets overlap: composed map lost entries")
    assert(SparkEntry.queries.size >= 277,
      "registry shrank below the r10 suite")
    perFamily.foreach { case (name, ks) =>
      assert(ks.nonEmpty, s"family $name registered no queries")
    }
  }
}
