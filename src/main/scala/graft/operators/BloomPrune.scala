package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning — the manual form of Spark's runtime bloom
  * filter (`spark.sql.optimizer.runtime.bloomFilter.*`), exposed as an
  * operator so a pipeline can prune a huge probe side *before* the shuffle
  * of an equi-join whenever the build side is selective.
  *
  * Why this matters at 100 TB: a shuffled inner join moves every probe-side
  * row to its hash partition, including the (often vast) majority that will
  * never match. Building a compact bloom bitmap over the build side's keys
  * and filtering the probe side at the scan turns those rows around before
  * the exchange — the same rows-never-shuffled win as a broadcast join, but
  * the bitmap stays kilobytes-to-megabytes when the build side is far too
  * big to broadcast as rows.
  *
  * The bitmap travels driver-side as a single aggregated value — identical
  * data movement to the scalar-subquery broadcast Spark's own
  * InjectRuntimeFilter performs; this is NOT a `collect()` of row data.
  * False positives are removed by the exact join that follows, so the
  * result is provably identical to the plain join (which is what the q58
  * oracle checks).
  *
  * Uses the built-in Catalyst [[BloomFilterAggregate]] /
  * [[BloomFilterMightContain]] pair (both codegen'd, keyed on xxhash64),
  * not a hand-rolled bitmap.
  */
object BloomPrune {

  /** Inner equi-join `big ⋈ small` with the big side pre-filtered by a bloom
    * filter over `small`'s join keys. Result is identical to
    * `big.join(small, big(bigKey) === small(smallKey))`.
    *
    * @param expectedItems sizing hint for the bitmap (overestimating only
    *                      costs memory: 8 bits/item at the default).
    */
  def bloomPruneJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
                     expectedItems: Long = 4L * 1000 * 1000): DataFrame = {
    val numBits = math.min(expectedItems * 8, 8L * 64 * 1024 * 1024) // cap 64 MB
    val bloomAgg = new BloomFilterAggregate(
      new XxHash64(Seq(shim.expression(small(smallKey)))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bf = small.select(shim.column(bloomAgg).as("bf")).head.getAs[Array[Byte]](0)
    // Empty build side aggregates to a null bitmap; the inner join is empty
    // regardless, so skip the pruning filter rather than probe a null bloom.
    val pruned =
      if (bf == null) big
      else big.where(shim.column(BloomFilterMightContain(
        Literal(bf, BinaryType),
        new XxHash64(Seq(shim.expression(big(bigKey)))))))
    pruned.join(small, pruned(bigKey) === small(smallKey))
  }
}
