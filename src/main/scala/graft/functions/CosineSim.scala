package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two `array<float|double>` columns.
  *
  * Replaces the interpreted `aggregate(zip_with(...))` HOF tree that was
  * the dominant per-pair cost of BOTH ANN paths (the band-join rerank and
  * the brute-force scoring): HOFs evaluate per element with no codegen,
  * allocating a zipped row per element, three times per pair (dot, |a|²,
  * |b|²). This expression compiles one fused loop via doGenCode — the
  * same preference order as [[SrpSignature]]/[[SimHashBits]]: compose
  * built-ins where codegen'd, drop to a native Expression where not,
  * never a UDF.
  *
  * Semantics are EXACTLY the HOF form's (SimilaritySpec pins 1e-9, and in
  * fact the FP operation order is identical — sequential element order,
  * per-element double casts — so results are bit-equal):
  *  - any NULL element, or a length mismatch (zip_with pads with null),
  *    yields NULL;
  *  - `nn = sqrt(dot(a,a)) * sqrt(dot(b,b)); if (nn == 0.0) 0.0 else d/nn`
  *    — empty or all-zero vectors score 0.0, not NaN.
  */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // null is also produced for non-null inputs (null element / mismatch)
  override def nullable: Boolean = true

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<float|double> columns, got " +
        s"${left.dataType} / ${right.dataType}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    val af = isFloat(left); val bf = isFloat(right)
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) 0.0 else d / nn
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (isFloat(left)) "getFloat" else "getDouble"
    val bGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val nn = ctx.freshName("nn")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ($b.numElements() != $n);
         |double $d = 0.0, $na = 0.0, $nb = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    final double $x = (double) $a.$aGet($i);
         |    final double $y = (double) $b.$bGet($i);
         |    $d += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double $nn = Math.sqrt($na) * Math.sqrt($nb);
         |  ${ev.value} = ($nn == 0.0) ? 0.0 : $d / $nn;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(CosineSim(
      graftbridge.expression(a), graftbridge.expression(b)))
  }
}
