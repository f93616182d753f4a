package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{BloomPrune, Corpus, Dedup, Reco, Relational, Similarity, Sketches, Skew, TimeWindows, TrainingMix}
import graft.plans.LabelPropagation
import graft.sources.{Bucketing, Multimodal}
import graft.streaming.RealTime

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named entry in
  * [[queries]]; every SQL-expressible one has matching ANSI SQL in
  * [[oracleSql]] (run by the driver in DuckDB over the same parquet tables).
  * Column names and types are kept identical on both sides — the driver
  * hash-compares values after sorting columns by name.
  */

import graft.EntryHelpers._

/** The driver contract: the flagship `entry` query plus the full graded
  * registry, composed from the per-family registry objects (r11 split of
  * the former 7.3k-line single file — zero semantic change, spec-asserted
  * disjoint keys and identical totals).
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7 step 4): the full J2 recommendation
    * pipeline — good ratings → co-rating graph → label-propagation
    * communities → per-user recommendation sets. Driver smoke-checks rows>0
    * on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    qRecommendations(spark, "/root/testdata/sf0.001")

  /** Every per-family registry, in composition order. */
  private[graft] val registries: Seq[(String, Map[String, (SparkSession, String) => DataFrame], Map[String, String])] = Seq(
    ("relational", RelationalRegistry.queries, RelationalRegistry.oracles),
    ("reco", RecoRegistry.queries, RecoRegistry.oracles),
    ("dedup", DedupRegistry.queries, DedupRegistry.oracles),
    ("similarity", SimilarityRegistry.queries, SimilarityRegistry.oracles),
    ("text", TextRegistry.queries, TextRegistry.oracles),
    ("graph", GraphRegistry.queries, GraphRegistry.oracles),
    ("streaming", StreamingRegistry.queries, StreamingRegistry.oracles),
    ("timeseries", TimeSeriesRegistry.queries, TimeSeriesRegistry.oracles),
    ("sketches", SketchesRegistry.queries, SketchesRegistry.oracles),
    ("pipeline", PipelineRegistry.queries, PipelineRegistry.oracles),
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.iterator.map(_._2).reduce(_ ++ _)

  /** Production twins (same keys as their graded forms): the sketch-only
    * register-algebra forms and the degree-capped CF family — benched
    * separately via SPARK_GRAFT_SKETCH_PROD=1, never driver-graded
    * (SketchProdSpec / CfProdSpec pin them to the graded outputs).
    */
  def prodQueries: Map[String, (SparkSession, String) => DataFrame] =
    TextRegistry.prodQueries ++ RecoRegistry.prodQueries

  def oracleSql: Map[String, String] =
    registries.iterator.map(_._3).reduce(_ ++ _)
}
