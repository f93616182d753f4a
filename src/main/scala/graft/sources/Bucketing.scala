package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-shuffle fact tables once at write time so
  * every subsequent equi-join/aggregation on the bucket key is exchange-free.
  *
  * At 100 TB this is the difference between shuffling the fact table per
  * query and never shuffling it again: `bucketBy(N, key) + sortBy(key)`
  * writes hash-partitioned, sorted files; a join of two tables bucketed the
  * same way plans as a zip of co-located sorted buckets (no Exchange in the
  * plan — asserted in BucketingSpec).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    // a fresh metastore can meet a leftover table directory (e.g. new
    // session, old warehouse) — clear both before writing
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
