package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-thread MD5 digest shared by interpreted and generated code paths —
  * `MessageDigest.getInstance` per row would dominate the hash itself.
  */
object Md5Util {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 32 bits of md5(utf8 bytes) as a non-negative long — identical to
    * `conv(substring(md5(s), 1, 8), 16, 10)` (first 4 digest bytes,
    * big-endian) and to the DuckDB hex-digit fold in the oracle twins.
    */
  def prefix32(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(s.getBytes)
    ((b(0) & 0xFFL) << 24) | ((b(1) & 0xFFL) << 16) | ((b(2) & 0xFFL) << 8) | (b(3) & 0xFFL)
  }

  /** One-pass [[prefix32]] over every n-token shingle of a token array —
    * the kernel of [[Md5ShingleHash32]] (see its scaladoc for the exact
    * composed-form equivalence). The digest consumes each shingle's token
    * bytes with single-space separators, so the hashed bytes are exactly
    * the composed form's `array_join(slice(t, i+1, n), " ")` string. Token
    * bytes are extracted once per token (not once per shingle ×n); null
    * elements hash as empty strings, as in [[Md5Prefix32Array]].
    */
  def shingleHashes(tokens: ArrayData, n: Int): Array[Long] = {
    val m = tokens.numElements()
    if (m < n) return Array.emptyLongArray
    val bytes = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      bytes(i) =
        if (tokens.isNullAt(i)) Array.emptyByteArray
        else tokens.getUTF8String(i).getBytes
      i += 1
    }
    val d = md.get()
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i <= m - n) {
      d.reset()
      var j = 0
      while (j < n) {
        if (j > 0) d.update(' '.toByte)
        d.update(bytes(i + j))
        j += 1
      }
      val b = d.digest()
      out(i) = ((b(0) & 0xFFL) << 24) | ((b(1) & 0xFFL) << 16) |
        ((b(2) & 0xFFL) << 8) | (b(3) & 0xFFL)
      i += 1
    }
    out
  }
}

/** Native Catalyst expression: element-wise cross-engine hash of a string
  * array — array<string> → array<long> of [[Md5Util.prefix32]] values.
  *
  * Why an Expression: the equivalent `transform(arr, s →
  * conv(substring(md5(s),1,8),16,10))` runs an interpreted lambda per
  * element (millions of evaluations per scan in MinHash dedup); this is one
  * compiled loop that stays inside whole-stage codegen, keeping signature
  * construction pure map-side work.
  *
  * Null elements hash as the empty string (md5("") prefix), keeping output
  * positions aligned with input positions and the output array null-free.
  * In-repo inputs are `split`/`transform` products that never contain
  * nulls, so the guard is purely defensive.
  */
case class Md5Prefix32Array(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_prefix32_array"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = Md5Util.prefix32(
        if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val gad = classOf[GenericArrayData].getName
      val util = Md5Util.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |final int $n = $a.numElements();
         |final long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $util.prefix32($a.isNullAt($i)
         |    ? org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
         |    : $a.getUTF8String($i));
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
