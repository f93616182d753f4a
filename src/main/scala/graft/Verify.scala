package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Also emits verify_hashes.json — a CANONICAL content hash per query
  * (columns sorted by name, rows sorted, explicit NULL/NaN/−0.0/decimal
  * rendering) — so a driver-side hash disagreement can be root-caused
  * against a representation-free fingerprint: if two engines' canonical
  * hashes agree but a fetch-path hash does not, the divergence is in the
  * fetch path's value representation (e.g. HUGEINT/DECIMAL→float64
  * conversions), not in the data.
  */
object Verify {
  /** Representation-pinning render: the SAME digits for a value whether
    * it arrived as int64, decimal128, or float — NULL → ␀ sentinel,
    * NaN → "NaN", −0.0 → "0.0", decimals in plain (non-scientific)
    * trailing-zero-free form, arrays element-rendered in brackets.
    */
  private def canon(v: Any): String = v match {
    case null => "␀"
    case d: Double =>
      if (d.isNaN) "NaN" else if (d == 0.0) "0.0" else d.toString
    case f: Float =>
      val d = f.toDouble
      if (d.isNaN) "NaN" else if (d == 0.0) "0.0" else d.toString
    case b: java.math.BigDecimal =>
      val s = b.stripTrailingZeros
      (if (s.signum == 0) java.math.BigDecimal.ZERO else s).toPlainString
    case a: scala.collection.Seq[_] =>
      a.map(canon).mkString("[", ",", "]")
    case a: Array[_] => a.map(x => canon(x)).mkString("[", ",", "]")
    // Temporal types render as epoch integers, NOT toString — toString
    // formats in the JVM default timezone, which would make the
    // "representation-pinning" hash machine-TZ-dependent the day a
    // graded query surfaces a temporal column.
    case t: java.sql.Timestamp =>
      "ts:" + (Math.multiplyExact(Math.floorDiv(t.getTime, 1000L), 1000000L)
        + t.getNanos / 1000)
    case i: java.time.Instant =>
      "ts:" + (Math.multiplyExact(i.getEpochSecond, 1000000L)
        + i.getNano / 1000)
    case d: java.sql.Date => "d:" + d.toLocalDate.toEpochDay
    case d: java.time.LocalDate => "d:" + d.toEpochDay
    case other => other.toString
  }

  private def contentHash(df: org.apache.spark.sql.DataFrame): (Long, String) = {
    val cols = df.columns.sorted
    val rows = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map(r => (0 until r.length).map(i => canon(r.get(i))).mkString("\u0001"))
      .sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    rows.foreach { r => md.update(r.getBytes("UTF-8")); md.update('\n'.toByte) }
    (rows.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, rest @ _*) = args
    // optional 3rd arg: comma-separated query-name filter (local iteration)
    val only: Option[Set[String]] = rest.headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // shuffle partitions sized to data when a scale probe needs it
      // (see Bench.shufflePartitions); default stays = cpus
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // tmpfs shuffle scratch (see Bench): keeps the correctness run off
      // this VM's throttled block device
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-graft"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val hashes = scala.collection.mutable.LinkedHashMap[String, (Long, String)]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // repartition(1), NOT coalesce(1): coalesce collapses a
        // shuffle-free upstream (broadcast join + partial agg pipelines)
        // into ONE task — measured at sf1.0: a 10-minute single-core
        // stall on queries that run in seconds at full parallelism.
        // repartition adds a shuffle boundary after the computed result,
        // so the query itself keeps every core and only the tiny result
        // set funnels to one writer (the single-file driver contract).
        df.repartition(1).write.mode("overwrite").parquet(s"$outDir/$name")
        // hash from the parquet just written (what the driver reads),
        // not the live plan — one computation, same bytes
        hashes(name) = contentHash(spark.read.parquet(s"$outDir/$name"))
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Per-query hash of the oracle SQL TEXT alongside the output hash:
    // recert's hash-transfer keys on this whole record, so a changed
    // oracle twin forces a fresh DuckDB run even when the Spark output is
    // bit-identical (ADVICE r14: a cert must never claim oracle-green
    // against an oracle that never executed). Queries without an oracle
    // twin (rows-only checks) omit the key on both sides.
    def sqlSha(name: String): String = SparkEntry.oracleSql.get(name).map { s =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.map(h => s", \"oracle_sha256\": ${q(h)}").getOrElse("")
    val hj = hashes
      .map { case (k, (n, h)) =>
        s"${q(k)}: {\"rows\": $n, \"sha256\": ${q(h)}${sqlSha(k)}}" }
      .mkString("{", ",", "}")
    // Filtered (local-iteration) runs write to a SUFFIXED file: a full
    // verify_hashes.json overwritten with the filtered subset while
    // oracle_sql.json keeps the full map would read as regressions to a
    // driver diffing the two.
    val hashFile =
      if (only.isDefined) "verify_hashes.partial.json" else "verify_hashes.json"
    Files.writeString(Paths.get(s"$outDir/$hashFile"), hj)
    spark.stop()
  }
}
