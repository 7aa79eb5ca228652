package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native array kernels for the shingle/dedup pipeline.
  *
  * Both replace higher-order-function Column trees (`zip_with` chains,
  * `transform(arr, s => md5-conv-substring(s))`): HOF lambdas are
  * interpreted per ELEMENT with no common-subexpression elimination, and
  * the optimizer additionally duplicates the whole tree into inferred
  * filters and both sides of self-joins — the dedup_* suite queries spent
  * >90% of their wall in those interpreted evals (measured via the r06
  * before-plans: the zip_with chain appears 9+ times across the
  * dedup_ngram_jaccard plan). Each kernel is one codegen'd loop via a
  * static helper, so the duplicated occurrences cost microseconds each.
  */
object ShingleUtil {
  private val Space = UTF8String.fromString(" ")

  /** Word k-shingles of a word array: element i = words[i..i+k-1] joined
    * by single spaces, windows extending past the end dropped — exactly
    * the `filter(zip_with-chain, isnotnull)` form this replaces (concat
    * is null-strict there, so a window containing a NULL word drops). */
  def shingles(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var outN = 0
    val window = new Array[UTF8String](2 * k - 1)
    var j = 1
    while (j < window.length) { window(j) = Space; j += 2 }
    var i = 0
    while (i < m) {
      var ok = true
      var w = 0
      while (w < k && ok) {
        if (words.isNullAt(i + w)) ok = false
        else window(2 * w) = words.getUTF8String(i + w)
        w += 1
      }
      if (ok) { out(outN) = UTF8String.concat(window: _*); outN += 1 }
      i += 1
    }
    if (outN == m) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], outN))
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `conv(substring(md5(s), 1, hexChars), 16, 10)` as one native call:
    * the first `hexChars` hex digits of the md5 of the UTF-8 bytes,
    * parsed as an unsigned integer. hexChars ≤ 15 keeps the value inside
    * a positive signed 64-bit long (same bound the Column form relies
    * on). */
  def md5Prefix(s: UTF8String, hexChars: Int): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // big-endian value of the first ceil(hexChars/2) bytes, then shift
    // off the low nibble when hexChars is odd
    var v = 0L
    val fullBytes = hexChars / 2
    var i = 0
    while (i < fullBytes) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    if ((hexChars & 1) == 1) v = (v << 4) | ((d(fullBytes) & 0xF0L) >>> 4)
    v
  }

  /** Element-wise [[md5Prefix]] over a string array (null in → null out,
    * mirroring the `transform(arr, s => ...)` tree this replaces). */
  def md5PrefixArray(arr: ArrayData, hexChars: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) null
        else java.lang.Long.valueOf(md5Prefix(arr.getUTF8String(i), hexChars))
      i += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] trait StringArrayInput extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<string>, got $other")
    }
}

/** Word k-shingles over a word array — see [[ShingleUtil.shingles]]. */
case class ShingleJoin(child: Expression, k: Int)
  extends UnaryExpression with StringArrayInput {
  require(k >= 1, "shingle width k must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_join"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, arr =>
      s"graft.functions.ShingleUtil.shingles($arr, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleJoin =
    copy(child = newChild)
}

object ShingleJoin {
  def apply(words: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(ShingleJoin(graftbridge.expression(words), k))
  }
}

/** Element-wise md5-hex-prefix integer hash — see [[ShingleUtil.md5Prefix]].
  * Value-identical to `transform(arr, s =>
  * conv(substring(md5(s), 1, hexChars), 16, 10).cast("long"))`, the form
  * the DuckDB twin oracles mirror as
  * `CAST('0x' || substr(md5(x), 1, n) AS BIGINT)`. */
case class Md5PrefixLongArray(child: Expression, hexChars: Int)
  extends UnaryExpression with StringArrayInput {
  require(hexChars >= 1 && hexChars <= 15,
    "hexChars must be in [1, 15] to stay inside a signed 64-bit long")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "md5_prefix_long_array"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.md5PrefixArray(input.asInstanceOf[ArrayData], hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, arr =>
      s"graft.functions.ShingleUtil.md5PrefixArray($arr, $hexChars)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5PrefixLongArray =
    copy(child = newChild)
}

object Md5PrefixLongArray {
  def apply(arr: Column, hexChars: Int): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(
      Md5PrefixLongArray(graftbridge.expression(arr), hexChars))
  }
}
