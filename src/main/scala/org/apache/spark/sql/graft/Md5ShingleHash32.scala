package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Fused word-shingle hasher: token array → array<long> of
  * [[Md5Util.prefix32]] over each n-token shingle's joined-by-space bytes —
  * byte-identical to
  * `md5_prefix32_array(transform(sequence(0, size(t)-n), i ->
  * array_join(slice(t, i+1, n), ' ')))` evaluated over the SAME tokens
  * (property-tested), minus that form's cost: Spark evaluates higher-order
  * lambdas interpreted, so the composed pipeline allocates a slice array
  * plus a joined string per shingle and then re-hashes them — measured at
  * ~1 ms/doc single-core on the documents corpus, 10× the md5+minhash work
  * it feeds. This expression is one compiled loop over the token bytes: no
  * shingle strings, no slices, no distinct.
  *
  * Emits EVERY shingle occurrence (no per-doc dedup). MinHash — the only
  * consumer — is multiset-invariant (a min over duplicates is unchanged),
  * so signatures built from this equal signatures built from the distinct
  * form exactly; relational shingle consumers (q36's explode + join) keep
  * the string-building form because they need the strings themselves.
  *
  * Documents shorter than n tokens yield an empty array, like the
  * composed form's `when(size(t) >= n, ...).otherwise(array())` guard.
  */
case class Md5ShingleHash32(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "shingle width must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_shingle_hash32"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Md5Util.shingleHashes(input.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val gad = classOf[GenericArrayData].getName
      val util = Md5Util.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = new $gad($util.shingleHashes($a, $n));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
