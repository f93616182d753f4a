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

    import java.nio.file.{Files, Paths, StandardCopyOption}
    Files.createDirectories(Paths.get(out))

    def writeOne(name: String, df: DataFrame): Unit = {
      val tmp = s"$out/.tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
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
    val uS = stride(events, "user_id")
    val dS = stride(documents, "doc_id")
    val vS = stride(embeddings, "vec_id")

    writeOne("customer", shifted(customer, Map("c_custkey" -> cS)))
    writeOne("supplier", shifted(supplier, Map("s_suppkey" -> sS)))
    writeOne("part", shifted(part, Map("p_partkey" -> pS)))
    writeOne("orders", shifted(orders,
      Map("o_orderkey" -> oS, "o_custkey" -> cS)))
    writeOne("lineitem", shifted(lineitem,
      Map("l_orderkey" -> oS, "l_partkey" -> pS, "l_suppkey" -> sS)))
    writeOne("events", shifted(events,
      Map("event_id" -> eS, "user_id" -> uS)))

    // replica docs are NEW documents: each token keeps or gains a replica
    // suffix by a deterministic md5 gate, putting cross-replica Jaccard
    // ~1/3 (below every near-dup threshold); replica 0 is the original
    val perturbedText = when(col("rep") === 0, col("text")).otherwise(
      array_join(transform(split(col("text"), " "), t =>
        when(functions.TextAnalysis.md5Prefix32(
            concat(t, lit(":"), col("doc_id"), lit(":"), col("rep"))) % 2 === 0,
          concat(t, col("rep"))).otherwise(t)), " "))
    writeOne("documents",
      documents.crossJoin(rep)
        .withColumn("new_text", perturbedText)
        .select((col("doc_id") + col("rep") * dS).as("doc_id"),
          col("new_text").as("text"), col("lang"), col("source"),
          length(col("new_text")).cast("long").as("n_chars")))

    writeOne("embeddings", shifted(embeddings, Map("vec_id" -> vS)))
    spark.stop()
  }
}
