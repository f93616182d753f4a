package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for when AQE's runtime skew-split isn't available
  * (e.g. a build side too large to broadcast joined on a power-law key).
  */
object Skew {

  /** Salted inner equi-join: the big (skewed) side spreads each hot key over
    * `salts` synthetic sub-keys; the small side is replicated `salts`×.
    * Result set is identical to `big.join(small, key)` for any salt
    * assignment — salting only changes partitioning, so the hottest
    * reduce bucket shrinks by ~`salts`×  at the cost of replicating the
    * small side.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig
      .join(replicatedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }
}
