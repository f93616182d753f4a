package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp–Rabin rolling polynomial over a document's bytes — the hash the
  * winnowing paper itself prescribes (Schleimer et al., SIGMOD 2003 §2:
  * "use a rolling hash function" so each window is O(1), not O(k)).
  *
  * h(i) = Σ_{j<K} byte(i+j)·B^{K−1−j} mod M, with B=257, M=2³¹−1, K=8 —
  * every position advanced in O(1) from the previous window, so a document
  * costs O(n) integer ops TOTAL. The md5-per-gram form this replaces paid
  * a full digest (+hex) per position: ~50× more work per byte, which at
  * sf1.0 made the winnowing query the single most expensive in the suite.
  *
  * Cross-engine contract: the oracle twin computes the same Σ codepoint·Bʲ
  * mod M per position with DuckDB list arithmetic. Byte values and
  * codepoints coincide on ASCII, and the corpus (plus every ScaleUp
  * perturbation, which substitutes same-vocabulary tokens) is pure
  * lowercase ASCII — the oracle hash-gate enforces this equivalence at
  * every scale it runs.
  */
/** The rolling-gram family's cross-engine equality with its DuckDB twins
  * holds only for pure-ASCII text: Spark hashes UTF-8 BYTES while the
  * oracle hashes CODEPOINTS (equal iff every byte < 0x80), and
  * [[RollingPackUtil]]'s base-256 signed-64 packing additionally needs the
  * leading byte's high bit clear. A non-ASCII document would silently
  * diverge the engines (ADVICE r13) — so the contract is asserted here at
  * the source, once per document, as one branch-predictable scan.
  */
private[graft] object AsciiGuard {
  def require(bytes: Array[Byte]): Unit = {
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) throw new IllegalArgumentException(
        s"rolling-gram functions require pure-ASCII text (oracle twins hash " +
          s"codepoints, Spark hashes UTF-8 bytes); found byte 0x${(bytes(i) & 0xFF).toHexString} at offset $i")
      i += 1
    }
  }
}

object RollingPolyUtil {
  val K = 8
  val B = 257L
  val M = 2147483647L // 2^31 − 1 (Mersenne prime)
  /** B^(K−1) mod M — the weight of the byte leaving the window. */
  val BK1: Long = {
    var p = 1L; var i = 0
    while (i < K - 1) { p = p * B % M; i += 1 }
    p
  }
  /** SQL literals B^(K−1−j) mod M, j = 0..K−1 — generated here so the
    * DuckDB twin's constants can never drift from the Scala ones.
    */
  def powers: Seq[Long] =
    Iterator.iterate(1L)(p => p * B % M).take(K).toSeq.reverse

  def hashes(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length
    AsciiGuard.require(bytes)
    if (n < K) return Array.emptyLongArray
    val out = new Array[Long](n - K + 1)
    var h = 0L
    var i = 0
    while (i < K) { h = (h * B + (bytes(i) & 0xFF)) % M; i += 1 }
    out(0) = h
    var p = 1
    while (p <= n - K) {
      // drop the leaving byte's weight, shift, add the entering byte —
      // every intermediate stays under 2^40, well inside long range
      h = ((h - (bytes(p - 1) & 0xFF) * BK1 % M + M) % M * B
        + (bytes(p + K - 1) & 0xFF)) % M
      out(p) = h
      p += 1
    }
    out
  }
}

object WinnowUtil {
  /** Full winnowing selection in one pass: the distinct minima of every
    * `w` consecutive rolling hashes, via the standard monotonic-deque
    * sliding-window minimum — O(n) total, no materialized hash array
    * escaping the row. Result order is first-selection order; consumers
    * explode it into an unordered fingerprint set, and the oracle twin's
    * list_distinct(window-min list) produces the same SET.
    */
  def select(s: UTF8String, w: Int): Array[Long] = {
    val fps = RollingPolyUtil.hashes(s)
    val n = fps.length
    if (n < w) return Array.emptyLongArray
    val deque = new Array[Int](n) // indices, increasing fps values
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.HashSet[Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    while (i < n) {
      while (tail > head && fps(deque(tail - 1)) >= fps(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = fps(deque(head))
        if (seen.add(m)) out += m
      }
      i += 1
    }
    out.toArray
  }
}

/** Native Catalyst expression: string → array<long> of [[RollingPolyUtil]]
  * window hashes, one per byte position (empty below K bytes). One compiled
  * O(n) loop inside whole-stage codegen — no per-position gram strings, no
  * digest allocation.
  */
case class RollingPoly32Array(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_poly32_array"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(RollingPolyUtil.hashes(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val gad = classOf[GenericArrayData].getName
      val util = RollingPolyUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = new $gad($util.hashes($s));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingPackUtil {
  /** All K-byte windows of a string packed EXACTLY into one long each —
    * base-256 positional packing (8 bytes = 64 bits), computed rolling in
    * O(1) per position. Injective on byte content: two windows pack equal
    * iff their bytes are equal, so `count(DISTINCT packed)` IS the exact
    * distinct-gram count, with no hash-collision caveat and no gram
    * strings materialized. Values stay in the positive signed-64 range for
    * any leading byte < 0x80 — i.e. all ASCII text, the same contract as
    * [[RollingPolyUtil]] (the DuckDB twin packs codepoints; the oracle
    * hash gate enforces the equivalence at every scale it runs).
    */
  val K = 8
  private val TOPW = 1L << 56 // 256^(K-1): weight of the leaving byte

  def packs(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length
    AsciiGuard.require(bytes)
    if (n < K) return Array.emptyLongArray
    val out = new Array[Long](n - K + 1)
    var h = 0L
    var i = 0
    while (i < K) { h = (h << 8) | (bytes(i) & 0xFFL); i += 1 }
    out(0) = h
    var p = 1
    while (p <= n - K) {
      h = ((h - (bytes(p - 1) & 0xFFL) * TOPW) << 8) | (bytes(p + K - 1) & 0xFFL)
      out(p) = h
      p += 1
    }
    out
  }
}

/** Native Catalyst expression: string → array<long> of
  * [[RollingPackUtil.packs]] — the exact 8-byte gram identities, one O(n)
  * compiled pass, no per-gram strings.
  */
case class RollingPack64Array(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_pack64_array"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(RollingPackUtil.packs(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val gad = classOf[GenericArrayData].getName
      val util = RollingPackUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = new $gad($util.packs($s));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramMixUtil {
  /** 64→32-bit finalizer for the packed gram: two multiply–xorshift
    * rounds over the 32-bit halves (the classic integer-hash finalizer
    * shape), replacing the md5 prefix as the sketch-side hash. Every
    * intermediate is exact in signed-64 on BOTH engines — the DuckDB twin
    * spells the same five steps with `%`/`//`/xor() (see the oracle CTE
    * builder), so sketch registers can never drift. Uniformity serves
    * HLL/KMV register assignment; the EXACT sides never touch it.
    */
  def mix32(g: Long): Long = {
    val lo = g & 0xFFFFFFFFL
    val hi = g >>> 32
    val t = (lo * 1640531527L % 4294967296L + hi * 2654435761L % 4294967296L) % 4294967296L
    val v = t ^ (t >>> 16)
    val u = v * 1103515245L % 4294967296L
    u ^ (u >>> 16)
  }
}

/** Native Catalyst expression: long → long [[GramMixUtil.mix32]]. */
case class GramMix32(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_mix32"

  override def nullSafeEval(input: Any): Any =
    GramMixUtil.mix32(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => {
      val util = GramMixUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $util.mix32($g);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: string → array<long> of the DISTINCT
  * winnowing-selected fingerprints ([[WinnowUtil.select]]) — rolling hash,
  * sliding-window minimum, and per-document dedup fused into one O(n)
  * compiled pass. Replaces a materialized-hash-array barrier plus an
  * interpreted slice/array_min lambda per window: nothing per-position
  * ever escapes the row.
  */
case class WinnowedFps32Array(child: Expression, w: Int = 4)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnowed_fps32_array"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(WinnowUtil.select(input.asInstanceOf[UTF8String], w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val gad = classOf[GenericArrayData].getName
      val util = WinnowUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = new $gad($util.select($s, $w));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
