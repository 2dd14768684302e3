package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled word-n-gram tokenizers (r20): text → the doc's DISTINCT
  * n-gram array in first-occurrence order, in ONE pass — the fused form
  * of `split` + `transform(sequence(...), i -> …)` + `array_distinct`,
  * whose higher-order steps evaluate interpreted per element and were
  * the heaviest map-side work of the whole dedup/graph/recursion
  * surface (every posting-list, minhash, and LSH query starts here).
  *
  * == Bit-identity ==
  * - Tokenization calls the SAME `UTF8String.split(" ", -1)` the
  *   built-in `split(text, " ")` evaluates — identical token arrays by
  *   construction (including trailing-empty behavior).
  * - [[NgramIdsKernel]] replays `xxhash64(tok_i, …, tok_{i+n−1})`: the
  *   builtin's left fold from seed 42 via the same public
  *   `XXH64.hashUTF8String` — identical 64-bit ids.
  * - [[NgramStringsKernel]] replays `concat_ws(' ', slice(toks, i, n))`
  *   via the same `UTF8String.concatWs` — identical strings.
  * - Dedup keeps the FIRST occurrence, `array_distinct`'s order.
  * Docs with fewer than n tokens yield an empty array (the old CASE
  * guard's value).
  */
case class NgramIdsKernel(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def ids(text: UTF8String): ArrayData = {
    val toks = text.split(NgramKernels.Space, -1)
    val m = toks.length - (n - 1)
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    var cnt = 0
    var i = 0
    while (i < m) {
      var h = 42L
      var j = 0
      while (j < n) { h = XXH64.hashUTF8String(toks(i + j), h); j += 1 }
      if (seen.add(h)) { out(cnt) = h; cnt += 1 }
      i += 1
    }
    new GenericArrayData(
      if (cnt == m) out else java.util.Arrays.copyOf(out, cnt))
  }

  override protected def nullSafeEval(input: Any): Any =
    ids(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramIds", this,
      classOf[NgramIdsKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.ids($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NgramIdsKernel = copy(child = newChild)
}

/** String twin of [[NgramIdsKernel]] — distinct `' '`-joined n-gram
  * STRINGS (the portable/oracle-facing shingle form). See the
  * bit-identity note above.
  */
case class NgramStringsKernel(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  def grams(text: UTF8String): ArrayData = {
    val toks = text.split(NgramKernels.Space, -1)
    val m = toks.length - (n - 1)
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val seen = new java.util.HashSet[UTF8String](m * 2)
    val piece = new Array[UTF8String](n)
    var cnt = 0
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) { piece(j) = toks(i + j); j += 1 }
      val g = UTF8String.concatWs(NgramKernels.Space, piece: _*)
      if (seen.add(g)) { out(cnt) = g; cnt += 1 }
      i += 1
    }
    new GenericArrayData(
      if (cnt == m) out
      else java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], cnt)
        .asInstanceOf[Array[Any]])
  }

  override protected def nullSafeEval(input: Any): Any =
    grams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramStrings", this,
      classOf[NgramStringsKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.grams($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NgramStringsKernel = copy(child = newChild)
}

object NgramKernels {
  private[functions] val Space: UTF8String = UTF8String.fromString(" ")

  /** Distinct n-gram xxhash64 ids of a text column. */
  def ngramIds(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(NgramIdsKernel(
      org.apache.spark.sql.GraftBridge.expression(text), n))

  /** Distinct n-gram strings of a text column. */
  def ngramStrings(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(NgramStringsKernel(
      org.apache.spark.sql.GraftBridge.expression(text), n))
}
