package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the sf1.0 derivation ([[ScaleUp.derive]]), asserted on a
  * small reps=3 derivation from sf0.001 — the properties the 10×
  * scale-certification rests on:
  *
  *   1. per-key density preserved: the {events-per-user} histogram scales
  *      exactly by reps (more keys, not hotter keys);
  *   2. calendar span unchanged (growth adds volume per day, not years);
  *   3. cross-replica document similarity stays far below every dedup
  *      threshold (replica docs are NEW documents, not planted dups), while
  *      n_chars = len(text) still holds on perturbed text;
  *   4. the planted near-dup structure scales exactly: q36's pair count at
  *      reps=3 is exactly 3× the source's (each replica keeps the
  *      generator's planted pairs; the perturbation plants no new ones);
  *   5. referential integrity WITHIN a replica: every derived event user is
  *      a customer of the SAME replica (user_id shifts by the customer
  *      stride — the round-12 ADVICE aliasing fix).
  */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val src = TestSpark.sf
  private val reps = 3

  // one derivation shared by all tests in this suite
  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-scaleup").toString
    ScaleUp.derive(spark, src, dir, reps)
    dir
  }

  private def srcStride(table: String, key: String): Long =
    spark.read.parquet(s"$src/$table.parquet")
      .agg(max(col(key))).head().getLong(0) + 1L

  test("per-user event density histogram scales exactly by reps") {
    def hist(dir: String) =
      Tables.events(spark, dir).groupBy("user_id").count()
        .groupBy("count").agg(count(lit(1)).as("n_users"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = hist(src)
    val d = hist(out)
    assert(s.nonEmpty)
    assert(d === s.map { case (k, v) => k -> v * reps })
  }

  test("calendar span unchanged: growth adds volume per day, not years") {
    def span(dir: String) = Tables.events(spark, dir)
      .agg(min(col("ts")), max(col("ts"))).head()
    assert(span(out) === span(src))
  }

  test("cross-replica doc similarity below dedup thresholds; n_chars exact") {
    val dS = srcStride("documents", "doc_id")
    val docs = spark.read.parquet(s"$out/documents.parquet")
    // n_chars = len(text) must survive the perturbation
    assert(docs.where(col("n_chars") =!= length(col("text"))).count() === 0L)
    // word-3-gram Jaccard between each doc's replica-0 and replica-1 twin
    val sh = expr(
      """filter(transform(split(text, ' '), (w, i) ->
        |  concat_ws(' ', slice(split(text, ' '), i + 1, 3))),
        |  (g, i) -> i + 3 <= size(split(text, ' ')))""".stripMargin)
    val r0 = docs.where(col("doc_id") < dS)
      .select(col("doc_id"), array_distinct(sh).as("g0"))
    val r1 = docs.where(col("doc_id") >= dS && col("doc_id") < 2 * dS)
      .select((col("doc_id") - dS).as("doc_id"), array_distinct(sh).as("g1"))
    val jac = r0.join(r1, "doc_id")
      .select((size(array_intersect(col("g0"), col("g1"))).cast("double") /
        size(array_union(col("g0"), col("g1")))).as("j"))
      .agg(max(col("j")), avg(col("j"))).head()
    assert(jac.getDouble(0) < 0.5, s"max cross-replica Jaccard ${jac.getDouble(0)}")
    assert(jac.getDouble(1) < 0.35, s"mean cross-replica Jaccard ${jac.getDouble(1)}")
  }

  test("planted q36 near-dup pairs scale exactly with reps") {
    val q36 = SparkEntry.queries("q36_ngram_jaccard")
    val srcPairs = q36(spark, src).count()
    assert(srcPairs > 0L)
    assert(q36(spark, out).count() === srcPairs * reps)
  }

  test("replica embeddings are new vectors with within-replica geometry intact") {
    val vS = srcStride("embeddings", "vec_id")
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    val srcEmb = spark.read.parquet(s"$src/embeddings.parquet")
    val nSrc = srcEmb.count()
    // de-collapsed: every replica's vectors are distinct VALUES (identity
    // replication left |distinct| = |source| at any reps — the sf10 defect)
    assert(emb.select(col("embedding")).distinct().count() === nSrc * reps)

    // exact micro-grid cosine numerator/norms, all-integer like the
    // Similarity operators' arithmetic
    def microDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) =>
        floor(x.cast("double") * 1000000L).cast("long") *
          floor(y.cast("double") * 1000000L).cast("long")), lit(0L), _ + _)

    // cross-replica: a replica's copy of a vector is DECORRELATED from the
    // original — |cos| far below every near-dup threshold (identity
    // replication had cos = 1 for all reps·|src| such pairs)
    val copies = emb.where(col("vec_id") >= vS) // replicas 1..reps-1
      .select((col("vec_id") % vS).as("vec_id"), col("embedding").as("e1"))
      .join(srcEmb.select(col("vec_id"), col("embedding").as("e0")), "vec_id")
      .select((microDot(col("e0"), col("e1")).cast("double") /
        sqrt(microDot(col("e0"), col("e0")).cast("double")) /
        sqrt(microDot(col("e1"), col("e1")).cast("double"))).as("cos"))
    assert(copies.agg(max(abs(col("cos")))).head().getDouble(0) < 0.7)

    // within-replica: the signed permutation is orthogonal, so pairwise
    // cosines inside replica r match replica 0's (1e-5 tolerance covers
    // the micro-grid wobble of sign-flipped components)
    val r1 = emb.where(col("vec_id") >= vS && col("vec_id") < 2 * vS)
      .select((col("vec_id") % vS).as("vid"), col("embedding"))
    def pairCos(df: org.apache.spark.sql.DataFrame) = df.as("a")
      .join(df.as("b"), col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("i"), col("b.vid").as("j"),
        (microDot(col("a.embedding"), col("b.embedding")).cast("double") /
          sqrt(microDot(col("a.embedding"), col("a.embedding")).cast("double")) /
          sqrt(microDot(col("b.embedding"), col("b.embedding")).cast("double")))
          .as("cos"))
    val r0 = srcEmb.limit(30).select(col("vec_id").as("vid"), col("embedding"))
    val r1s = r1.join(r0.select(col("vid")), "vid")
    val drift = pairCos(r0).as("p0")
      .join(pairCos(r1s).as("p1"), Seq("i", "j"))
      .agg(max(abs(col("p0.cos") - col("p1.cos")))).head().getDouble(0)
    assert(drift < 1e-5, s"within-replica cosine drift $drift")
  }

  test("skew mode: zipf head reassignment conserves rows, keys, and replica 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scaleup-skew").toString
    val (h, pm) = (20, 200) // strong skew on the tiny fixture
    ScaleUp.derive(spark, src, dir, reps, skew = Some((h, pm)))
    val oS = srcStride("orders", "o_orderkey")
    val srcOrders = spark.read.parquet(s"$src/orders.parquet")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val plainOrders = spark.read.parquet(s"$out/orders.parquet")

    // row conservation: reassignment, not addition
    assert(orders.count() === srcOrders.count() * reps)
    assert(spark.read.parquet(s"$dir/lineitem.parquet").count() ===
      spark.read.parquet(s"$out/lineitem.parquet").count())

    // referential integrity: every order customer exists
    val cust = spark.read.parquet(s"$dir/customer.parquet").select(col("c_custkey"))
    assert(orders.join(cust, orders("o_custkey") === cust("c_custkey"), "left_anti")
      .count() === 0L)

    // replica 0 is bit-identical to the source
    val r0 = orders.where(col("o_orderkey") < oS).select("o_orderkey", "o_custkey")
    assert(r0.exceptAll(srcOrders.select("o_orderkey", "o_custkey")).count() === 0L)

    // determinism: a second derivation produces identical orders
    val dir2 = java.nio.file.Files.createTempDirectory("graft-scaleup-skew2").toString
    ScaleUp.derive(spark, src, dir2, reps, tables = Some(Set("orders")),
      skew = Some((h, pm)))
    assert(orders.exceptAll(spark.read.parquet(s"$dir2/orders.parquet")).count() === 0L)

    // the reassigned mass is ~permille of replica>=1 orders, and its rank
    // histogram is zipf-shaped: P(rank=1) = log_H(2), and rank 1 gets
    // more than ranks 2.. individually (monotone head)
    val cS = srcStride("customer", "c_custkey")
    val reassigned = orders.where(col("o_orderkey") >= oS && col("o_custkey") <= h)
      .groupBy("o_custkey").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nRe = reassigned.values.sum.toDouble
    val nRep = srcOrders.count().toDouble * (reps - 1)
    assert(math.abs(nRe / nRep - pm / 1000.0) < 0.05, s"gate rate ${nRe / nRep}")
    val p1 = reassigned.getOrElse(1L, 0L) / nRe
    val expected1 = math.log(2) / math.log(h)
    assert(math.abs(p1 - expected1) < 0.08, s"rank-1 share $p1 vs $expected1")
    assert(reassigned.getOrElse(1L, 0L) > reassigned.getOrElse(2L, 0L))
    assert(reassigned.getOrElse(2L, 0L) > reassigned.getOrElse(8L, 0L))

    // the point of the mode: the max per-user rating degree explodes vs
    // the plain derivation's scale-invariant head
    def maxDeg(d: String) = Tables.ratings(spark, d)
      .groupBy("userId").count().agg(max("count")).head().getLong(0)
    assert(maxDeg(dir) > 4 * maxDeg(out),
      s"skew head ${maxDeg(dir)} vs plain ${maxDeg(out)}")
  }

  test("events.user_id keeps within-replica referential integrity") {
    val cS = srcStride("customer", "c_custkey")
    val eS = srcStride("events", "event_id")
    val ev = spark.read.parquet(s"$out/events.parquet")
    val cust = spark.read.parquet(s"$out/customer.parquet")
      .select(col("c_custkey"))
    // every event user is a customer...
    assert(ev.join(cust, ev("user_id") === cust("c_custkey"), "left_anti")
      .count() === 0L)
    // ...of the SAME replica (event_id and user_id agree on the replica)
    assert(ev.where(floor(col("event_id") / eS) =!= floor(col("user_id") / cS))
      .count() === 0L)
  }
}
