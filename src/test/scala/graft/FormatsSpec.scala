package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Formats

/** Source/sink format surface (SURVEY §2 rows 1.1/4.1/4.6 + the ORC
  * alternative): schema-explicit round trips and the pushdown contract
  * that makes a format usable as a 100-TB table layout.
  */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val edges = Seq(
    (1L, 10L, 4.5, 1000L), (2L, 11L, 3.0, 1001L), (1500L, 12L, 5.0, 1002L))

  test("CSV round trip preserves the declared edge schema and rows") {
    val dir = Files.createTempDirectory("edges-csv").toString
    Formats.writeEdgesCsv(edges.toDF("userId", "productId", "rating", "timestamp"), dir)
    val back = Formats.readEdgesCsv(spark, dir)
    assert(back.schema === Formats.edgeSchema)
    assert(back.as[(Long, Long, Double, Long)].collect().toSet === edges.toSet)
  }

  test("ORC round trip preserves rows and pushes predicates to the scan") {
    val dir = Files.createTempDirectory("edges-orc").toString
    Formats.writeEdgesOrc(edges.toDF("userId", "productId", "rating", "timestamp"), dir)
    val back = Formats.readEdgesOrc(spark, dir)
    assert(back.as[(Long, Long, Double, Long)].collect().toSet === edges.toSet)

    // the same pushdown contract PlanSpec asserts for parquet
    val filtered = back.where(col("userId") < 1000L)
    val plan = filtered.queryExecution.executedPlan
    val scans = plan.collect {
      case a: AdaptiveSparkPlanExec =>
        a.executedPlan.collect { case f: FileSourceScanExec => f }
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", ""))
    assert(pushed.exists(_.contains("LessThan(userId,1000)")),
      s"ORC scan did not push the predicate: $pushed")
    assert(filtered.count() === 2)
  }
}
