package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native signed-random-projection signature: `planes.length` sign bits of
  * `vec · plane_p` packed into a long.
  *
  * Why a custom Catalyst Expression instead of the equivalent
  * `aggregate(zip_with(...))` Column tree: higher-order functions are
  * interpreted per ELEMENT with no codegen — the HOF form measured
  * ~0.5 ms/row for 32 planes × 64 dims (allocating an index array and a
  * plane column per element), which made the LSH ANN path slower than the
  * brute-force baseline it exists to beat. This expression compiles to a
  * tight two-level loop over the raw `ArrayData` with the plane matrix as
  * a codegen reference object — the preference order the engine follows:
  * compose built-ins where they're codegen'd, drop to a native Expression
  * (with doGenCode) where they're not, never a black-box UDF.
  *
  * Deterministic: the plane matrix is a plan-time constant (seeded), so
  * signatures are stable across runs, partitionings and cluster sizes.
  */
case class SrpSignature(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "srp_signature"

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"srp_signature needs array<float|double>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val np = planes.length
    val sums = new Array[Double](np)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        var p = 0
        while (p < np) {
          val plane = planes(p)
          if (i < plane.length) sums(p) += x * plane(i)
          p += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < np) { if (sums(p) >= 0.0) sig |= (1L << p); p += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    val cast = if (isFloat) "(double) " else ""
    nullSafeCodeGen(ctx, ev, arr => {
      val sums = ctx.freshName("sums")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val x = ctx.freshName("x")
      val n = ctx.freshName("n")
      s"""
         |final int $n = $arr.numElements();
         |final double[] $sums = new double[${planes.length}];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    final double $x = $cast$arr.$getter($i);
         |    for (int $p = 0; $p < ${planes.length}; $p++) {
         |      if ($i < $planesRef[$p].length) {
         |        $sums[$p] += $x * $planesRef[$p][$i];
         |      }
         |    }
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $p = 0; $p < ${planes.length}; $p++) {
         |  if ($sums[$p] >= 0.0) ${ev.value} |= (1L << $p);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
}

object SrpSignature {
  def apply(vec: Column, planes: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(SrpSignature(graftbridge.expression(vec), planes))
  }
}
