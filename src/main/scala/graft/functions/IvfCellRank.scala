package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Full IVF cell ranking for one vector: all `centroids.length` cell ids
  * ordered best-first by `(cosine DESC, cell ASC)`. Cell assignment is
  * `element_at(rank, 1)`; the query-side probe list is `slice(rank, 1,
  * nProbe)` — one expression serves both sides of the IVF join.
  *
  * Why a native Expression instead of the equivalent
  * `array_max`/`array_sort` over per-centroid `struct(CosineSim(vec,
  * lit(c)), -cell)` columns: that Column tree embeds every centroid as a
  * 64-element literal and expands to nCells independent CosineSim calls —
  * a plan large enough that codegen COMPILATION dominated the measured
  * wall (the |Q|=500 crossover ran SLOWER than brute force). Here the
  * centroid matrix rides as ONE codegen reference object and the whole
  * ranking is a fused elements×cells loop plus an nCells-wide insertion
  * sort — the [[SrpSignature]] pattern.
  *
  * FP semantics per cell are EXACTLY [[CosineSim]]'s (so the DuckDB
  * oracle's index-order double arithmetic reproduces the ranking):
  * per-element double casts, element-index accumulation order,
  * `nn == 0 → 0.0`. A cell whose centroid length mismatches the vector,
  * or any null vector element, scores -2.0 (below any real cosine) —
  * mirroring the Column form's `coalesce(cosine, -2.0)`, keeping the
  * operator total.
  */
case class IvfCellRank(child: Expression, centroids: Array[Array[Double]])
  extends UnaryExpression {
  require(centroids.nonEmpty)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_cell_rank"

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** `sqrt(Σ c_j²)` per centroid — a plan-time constant (the centroids
    * are), precomputed ONCE instead of per input row: recomputing the
    * norms inside the row loop roughly doubled the scoring FLOPs of the
    * map-only assignment scan this expression exists to accelerate.
    * FP-identical to the inline form: each `nb` sums the same squares in
    * the same index order, just once. */
  private lazy val centroidNorms: Array[Double] =
    centroids.map { cent =>
      var nb = 0.0
      var j = 0
      while (j < cent.length) { nb += cent(j) * cent(j); j += 1 }
      math.sqrt(nb)
    }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = centroids.length
    val dots = new Array[Double](k)
    var na = 0.0
    var nullSeen = false
    var i = 0
    while (i < n && !nullSeen) {
      if (arr.isNullAt(i)) nullSeen = true
      else {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        na += x * x
        var c = 0
        while (c < k) {
          val cent = centroids(c)
          if (i < cent.length) dots(c) += x * cent(i)
          c += 1
        }
      }
      i += 1
    }
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      if (nullSeen || cent.length != n) scores(c) = -2.0
      else {
        val nn = math.sqrt(na) * centroidNorms(c)
        scores(c) = if (nn == 0.0) 0.0 else dots(c) / nn
      }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(rankCells(scores))
  }

  /** Indices 0..k-1 sorted by (score DESC, index ASC) — insertion sort,
    * k is small (a centroid count). */
  private def rankCells(scores: Array[Double]): Array[Int] = {
    val k = scores.length
    val out = Array.tabulate(k)(identity)
    var i = 1
    while (i < k) {
      val v = out(i)
      var j = i - 1
      while (j >= 0 && scores(out(j)) < scores(v)) { out(j + 1) = out(j); j -= 1 }
      out(j + 1) = v
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val normsRef = ctx.addReferenceObj("centroidNorms", centroidNorms, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    val cast = if (isFloat) "(double) " else ""
    val k = centroids.length
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val dots = ctx.freshName("dots")
      val na = ctx.freshName("na")
      val nullSeen = ctx.freshName("nullSeen")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val nn = ctx.freshName("nn")
      val scores = ctx.freshName("scores")
      val ranks = ctx.freshName("ranks")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $arr.numElements();
         |final double[] $dots = new double[$k];
         |double $na = 0.0;
         |boolean $nullSeen = false;
         |for (int $i = 0; $i < $n && !$nullSeen; $i++) {
         |  if ($arr.isNullAt($i)) { $nullSeen = true; break; }
         |  final double $x = $cast$arr.$getter($i);
         |  $na += $x * $x;
         |  for (int $c = 0; $c < $k; $c++) {
         |    if ($i < $centsRef[$c].length) {
         |      $dots[$c] += $x * $centsRef[$c][$i];
         |    }
         |  }
         |}
         |final double[] $scores = new double[$k];
         |for (int $c = 0; $c < $k; $c++) {
         |  if ($nullSeen || $centsRef[$c].length != $n) {
         |    $scores[$c] = -2.0;
         |  } else {
         |    final double $nn = java.lang.Math.sqrt($na) * $normsRef[$c];
         |    $scores[$c] = ($nn == 0.0) ? 0.0 : $dots[$c] / $nn;
         |  }
         |}
         |final int[] $ranks = new int[$k];
         |for (int $c = 0; $c < $k; $c++) { $ranks[$c] = $c; }
         |for (int $i = 1; $i < $k; $i++) {
         |  final int $v = $ranks[$i];
         |  int $j = $i - 1;
         |  while ($j >= 0 && $scores[$ranks[$j]] < $scores[$v]) {
         |    $ranks[$j + 1] = $ranks[$j]; $j--;
         |  }
         |  $ranks[$j + 1] = $v;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($ranks);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IvfCellRank =
    copy(child = newChild)
}

object IvfCellRank {
  def apply(vec: Column, centroids: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(IvfCellRank(graftbridge.expression(vec), centroids))
  }
}
