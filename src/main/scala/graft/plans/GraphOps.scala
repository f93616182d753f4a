package graft.plans

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.graphx.lib.{ConnectedComponents, LabelPropagation => GxLP}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** GraphX interop for the graph stage of J2 (`batch/Recommendations.java:
  * 100-134` builds Gelly graphs for community detection).
  *
  * The primary label-propagation implementation is the relational one in
  * [[LabelPropagation]] (deterministic tiebreak → DuckDB-oracle-able); these
  * GraphX forms exist as (a) an independent cross-check of the community
  * structure and (b) the idiomatic path when a user already has GraphX
  * graphs. GraphX's Pregel supersteps are the same shuffle pattern as the
  * DataFrame rounds — per superstep, messages shuffle on the dst vertex.
  */
object GraphOps {

  private def toGraph(spark: SparkSession, edges: DataFrame): Graph[Long, Long] = {
    val edgeRdd = edges.select("src", "dst").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1L))
    Graph.fromEdges(edgeRdd, defaultValue = 0L)
  }

  /** Connected components (min vertex id per component — deterministic). */
  def connectedComponents(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    ConnectedComponents.run(toGraph(spark, edges))
      .vertices.map { case (id, comp) => (id, comp) }
      .toDF("id", "component")
  }

  /** GraphX label propagation (Pregel). NOTE: GraphX breaks frequency ties
    * arbitrarily (hash-map iteration order), so per-vertex labels are NOT
    * comparable to [[LabelPropagation.run]]; community *structure* is — see
    * GraphSpec.
    */
  def labelPropagationGraphX(spark: SparkSession, edges: DataFrame, iters: Int = 5): DataFrame = {
    import spark.implicits._
    GxLP.run(toGraph(spark, edges), iters)
      .vertices.map { case (id, label) => (id, label) }
      .toDF("id", "label")
  }
}
