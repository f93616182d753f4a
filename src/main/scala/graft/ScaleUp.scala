package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1.0 derivation main — the 10× scale-certification dataset.
  *
  * `/root/testdata` is read-only and the driver only generated
  * sf{0.001,0.01,0.1}, so the 10× step is DERIVED from sf0.1, inside the
  * repo (gitignored): each fact table becomes `reps` key-shifted replicas
  * with referential integrity preserved WITHIN a replica (the same
  * key-space partitioning a real corpus grows by — new users place new
  * orders for new parts; the dimension tables region/nation stay 1×, as
  * dimensions do). Everything is a pure deterministic function of the
  * source rows and the replica index — no RNG, so the dataset is
  * reproducible bit-for-bit.
  *
  * Distribution fidelity:
  *  - per-key densities (ratings per user, events per user, docs per
  *    source, raters per product) stay EXACTLY sf0.1's — the corpus gets
  *    10× more keys, not 10× hotter keys, which is how real data grows;
  *  - the calendar span is unchanged, so |days|-bounded plans stay
  *    |days|-bounded (growth adds volume per day, not years);
  *  - document text is perturbed per replica (each token keeps or gains a
  *    replica suffix by an md5 gate on (token, doc_id, replica)) so
  *    cross-replica near-dup similarity lands ~1/3, far below every
  *    dedup threshold — replica docs are NEW documents, not planted
  *    duplicates, while each replica retains the generator's own planted
  *    dup structure at the original density. `n_chars` is recomputed to
  *    keep the n_chars = len(text) invariant.
  *  - embeddings are perturbed per replica by a signed permutation of the
  *    dimensions (orthogonal: within-replica geometry exact, cross-replica
  *    similarity ~0) — identity replication collapsed IVF cells by reps
  *    and made cell self-joins quadratic (the round-14 sf10 finding);
  *  - timestamps are written back as TIMESTAMP_NTZ microseconds — the
  *    exact parquet encoding the driver's generator used, so both Spark's
  *    loaders and the DuckDB oracle read sf1.0 identically to sf0.1.
  *
  * Output layout matches the driver's: one flat `<table>.parquet` FILE per
  * table (coalesce(1) + rename), so `tools/oracle_check.py` and Verify use
  * the directory unchanged.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("testdata_sf1.0")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    // optional 4th arg: comma-separated table subset (e.g. "documents" for
    // the q36 next-decade candidate-volume probe, where deriving 1000×
    // lineitem would cost hours for data the probe never reads)
    val tables = args.lift(3).map(_.split(",").toSet).filterNot(_.contains("-"))
    // optional 5th/6th args: power-law skew mode — headUsers zipfPermille
    // (see [[skewedCustkey]]); "-" as the 4th arg = all tables + skew.
    // Require BOTH or NEITHER: a truncated invocation (headUsers without
    // permille) must not silently write a plain derivation to the
    // requested output path and masquerade as a skewed dataset.
    require(args.lift(4).isEmpty == args.lift(5).isEmpty,
      s"skew mode needs both headUsers and zipfPermille (got args ${args.mkString(" ")})")
    val skew = args.lift(5).map(p => (args(4).toInt, p.toInt))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-graft"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    derive(spark, src, out, reps, tables, skew)
    spark.stop()
  }

  /** Power-law (zipf s≈1) reassignment of a replica order's customer onto a
    * HEAD user — the skew mode (round-16 VERDICT #1). The plain derivation
    * replicates the key space, so per-user degree is scale-invariant BY
    * CONSTRUCTION and the CF degree cap can never be observed winning on
    * it; real corpora grow hot keys too. In skew mode each replica-r≥1
    * order keeps its shifted customer except for `permille`/1000 of them
    * (md5 gate on (orderkey, rep) — deterministic, no RNG), which are
    * reassigned to head user `rank` = ⌊H^u⌋ with u uniform from a second
    * md5 draw: P(rank = j) = log_H((j+1)/j) ≈ 1/(j·ln H), the classic
    * zipf-1 inverse-CDF. Head users are source custkeys 1..H (replica 0),
    * so referential integrity holds at any reps; all other tables —
    * including lineitem — are untouched, so |ratings| is conserved
    * (reassignment, not addition) and the exact-vs-capped A/B isolates
    * the DEGREE DISTRIBUTION as the only variable.
    */
  private def skewedCustkey(base: Column, headUsers: Int, permille: Int): Column = {
    val gate = functions.TextAnalysis.md5Prefix32(
      concat(lit("skew:"), col("o_orderkey"), lit(":"), col("rep")))
    val u = functions.TextAnalysis.md5Prefix32(
      concat(lit("zipf:"), col("o_orderkey"), lit(":"), col("rep")))
      .cast("double") / 4294967296.0
    val rank = least(floor(pow(lit(headUsers.toDouble), u)).cast("long"),
      lit(headUsers.toLong))
    when(col("rep") > 0 && gate % 1000 < permille, rank).otherwise(base)
  }

  /** The derivation itself, session-injected so ScaleUpSpec can run a small
    * `reps=3` derivation under the shared test session and assert the
    * invariants the sf1.0 certificate rests on.
    */
  def derive(spark: SparkSession, src: String, out: String, reps: Int,
      tables: Option[Set[String]] = None,
      skew: Option[(Int, Int)] = None): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    Files.createDirectories(Paths.get(out))

    def writeOne(name: String, df: => DataFrame): Unit =
      if (tables.forall(_.contains(name))) writeOneAll(name, df)

    def writeOneAll(name: String, df: DataFrame): Unit = {
      val tmp = s"$out/.tmp_$name"
      // repartition(1), NOT coalesce(1) (the Verify.scala lesson): coalesce
      // collapses the whole shuffle-free derivation — source scan is ONE
      // small file, crossJoin(rep) is broadcast — into a single task, which
      // at reps=1000 means ~10⁹ md5 calls on one core. repartition keeps
      // the perturbation parallel and funnels only the write through one
      // task (single-file contract preserved; row order within the file is
      // not part of any content contract — Verify hashes sort rows).
      df.repartition(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      Files.move(Paths.get(part), Paths.get(s"$out/$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      println(s"[scaleup] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    def raw(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    /** key-space stride: one past the table's max key, so replica key
      * ranges never collide */
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    /** the replica axis — a broadcast 10-row side every fact crosses */
    val rep = broadcast(spark.range(reps.toLong).select(col("id").as("rep")))

    def shifted(df: DataFrame, shifts: Map[String, Long],
                extra: Map[String, Column] = Map.empty): DataFrame =
      df.crossJoin(rep).select(df.columns.map { c =>
        extra.get(c)
          .orElse(shifts.get(c).map(s => col(c) + col("rep") * s))
          .getOrElse(col(c)).as(c)
      }: _*)

    // dimensions stay 1×
    writeOne("region", raw("region"))
    writeOne("nation", raw("nation"))

    val customer = raw("customer")
    val supplier = raw("supplier")
    val part = raw("part")
    val orders = raw("orders")
    val lineitem = raw("lineitem")
    val events = raw("events")
    val documents = raw("documents")
    val embeddings = raw("embeddings")

    val cS = stride(customer, "c_custkey")
    val sS = stride(supplier, "s_suppkey")
    val pS = stride(part, "p_partkey")
    val oS = stride(orders, "o_orderkey")
    val eS = stride(events, "event_id")
    val dS = stride(documents, "doc_id")
    val vS = stride(embeddings, "vec_id")

    writeOne("customer", shifted(customer, Map("c_custkey" -> cS)))
    writeOne("supplier", shifted(supplier, Map("s_suppkey" -> sS)))
    writeOne("part", shifted(part, Map("p_partkey" -> pS)))
    writeOne("orders", shifted(orders,
      Map("o_orderkey" -> oS, "o_custkey" -> cS),
      extra = skew.map { case (h, p) =>
        "o_custkey" -> skewedCustkey(col("o_custkey") + col("rep") * cS, h, p)
      }.toMap))
    writeOne("lineitem", shifted(lineitem,
      Map("l_orderkey" -> oS, "l_partkey" -> pS, "l_suppkey" -> sS)))
    // user_id shifts by the CUSTOMER stride, not its own: the generator's
    // event users are the first |users| customer keys, so the customer
    // stride is the one that keeps replica-r's event users inside
    // replica-r's customer block at any reps (shifting by max(user_id)+1
    // aliased replica-r event users onto replica-0's customer range —
    // the round-12 ADVICE finding).
    writeOne("events", shifted(events,
      Map("event_id" -> eS, "user_id" -> cS)))

    // replica docs are NEW documents: each token keeps or gains a replica
    // suffix by a deterministic md5 gate keyed on (token, rep) ONLY — a
    // per-replica injective dictionary substitution (the vocabulary is
    // digit-free, so `t + digits` can never collide with another token).
    // An injective token renaming preserves every within-replica word-
    // n-gram Jaccard EXACTLY, so each replica retains the generator's
    // planted near-dup structure at the original density (ScaleUpSpec
    // asserts q36 pairs = reps × source; keying the gate on doc_id too —
    // the pre-round-13 form — broke planted pairs in replicas ≥ 1 because
    // the two docs of a pair drew different substitutions). Cross-replica
    // token overlap is the ~half of the vocabulary left unperturbed, so
    // cross-replica Jaccard sits far below every dedup threshold; replica
    // 0 is the original.
    val perturbedText = when(col("rep") === 0, col("text")).otherwise(
      array_join(transform(split(col("text"), " "), t =>
        when(functions.TextAnalysis.md5Prefix32(
            concat(t, lit(":"), col("rep"))) % 2 === 0,
          concat(t, col("rep"))).otherwise(t)), " "))
    // fan the single-file source scan out BEFORE the broadcast crossJoin:
    // without this the whole reps× token-md5 perturbation runs in the one
    // scan task (1 small parquet = 1 input split), which at reps=1000 is
    // ~10⁹ single-core md5 calls
    val par = spark.sparkContext.defaultParallelism
    writeOne("documents",
      documents.repartition(par).crossJoin(rep)
        .withColumn("new_text", perturbedText)
        .select((col("doc_id") + col("rep") * dS).as("doc_id"),
          col("new_text").as("text"), col("lang"), col("source"),
          length(col("new_text")).cast("long").as("n_chars")))

    // replica embeddings are NEW vectors: a per-replica SIGNED PERMUTATION
    // of the dimensions. An orthogonal transform preserves every
    // within-replica inner product and cosine (planted near-dup structure
    // survives; sign flips wobble the 1e-6 micro-quantization grid but
    // nothing near any threshold), while a cross-replica copy decorrelates
    // to ~0 similarity. Identity-replicated values — the pre-round-14
    // form — collapsed every distance-based operator at scale: with reps
    // replicas of the same 2k vectors, nearest-centroid ties sent all
    // copies of a value into the SAME IVF cell, so cell populations grew
    // by reps and cell self-joins by reps² (the sf10 probe measured q200
    // quadratic for exactly this reason — a defect of the DATA, not the
    // plans). Permutation = argsort of xxhash64("rep:dim"); sign = parity
    // of xxhash64("dim;rep"). Deterministic, no RNG; replica 0 is the
    // original, like text.
    val keyed = transform(sequence(lit(0), size(col("embedding")) - 1), i =>
      struct(
        xxhash64(concat_ws(":", col("rep"), i)).as("k"),
        when(xxhash64(concat_ws(";", i, col("rep"))) % 2 === 0,
          element_at(col("embedding"), i + 1))
          .otherwise(-element_at(col("embedding"), i + 1)).as("x")))
    val permEmb = when(col("rep") === 0, col("embedding"))
      .otherwise(transform(array_sort(keyed), p => p.getField("x")))
    writeOne("embeddings",
      embeddings.repartition(par).crossJoin(rep).select(
        (col("vec_id") + col("rep") * vS).as("vec_id"),
        permEmb.as("embedding"), col("label")))
  }
}
