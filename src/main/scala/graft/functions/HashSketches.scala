package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native sketch folds over a pre-hashed feature array (`array<long>`,
  * typically `transform(shingles, xxhash64)`).
  *
  * Both replace `aggregate(zip_with(...))` Column trees: HOFs are
  * interpreted per element with no common-subexpression elimination, so a
  * 64-bit fold over N shingles costs N×64 interpreted expression nodes
  * plus per-element array allocations — measured as the two most
  * expensive queries in the whole suite (dedup_simhash 10.6s,
  * dedup_minhash_lsh 7.1s at sf0.1). These expressions compile the fold
  * to a two-level loop via doGenCode.
  *
  * A further benefit for MinHash: generated Java is free of Spark's ANSI
  * overflow checks, so the universal hash `a·h + b mod p` runs on plain
  * 64-bit arithmetic (operands are 31-bit-masked, so it cannot overflow —
  * the Column form needed the same masking to survive ANSI mode).
  */
private[functions] trait HashArrayInput extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<bigint> (pre-hashed features), got $other")
    }
}

/** SimHash sign-vote fold: per feature hash, each of `nBits` bit positions
  * votes +1 (bit set) or -1; output bit p is set iff votes(p) > 0. */
case class SimHashBits(child: Expression, nBits: Int)
  extends UnaryExpression with HashArrayInput {
  require(nBits >= 1 && nBits <= 64)

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](nBits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < nBits) {
          votes(b) += (if (((h >>> b) & 1L) != 0L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < nBits) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      s"""
         |final int $n = $arr.numElements();
         |final int[] $votes = new int[$nBits];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    final long $h = $arr.getLong($i);
         |    for (int $b = 0; $b < $nBits; $b++) {
         |      $votes[$b] += ((($h >>> $b) & 1L) != 0L) ? 1 : -1;
         |    }
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $b = 0; $b < $nBits; $b++) {
         |  if ($votes[$b] > 0) ${ev.value} |= (1L << $b);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  def apply(hashes: Column, nBits: Int): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(SimHashBits(graftbridge.expression(hashes), nBits))
  }
}

/** MinHash signature fold: slot i keeps min over features of
  * `(a_i·(h & 2³¹-1) + b_i) mod p` with p = 2³¹-1 (Mersenne). Returns
  * `array<bigint>` of length `as.length`; all-null/empty input yields a
  * signature of Long.MaxValue sentinels (matches the Column-form
  * `array_repeat(MaxValue)` seed). */
case class MinHashSig(child: Expression, as: Array[Long], bs: Array[Long])
  extends UnaryExpression with HashArrayInput {
  require(as.length == bs.length && as.nonEmpty)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private val Mask = 0x7FFFFFFFL
  private val Prime = 2147483647L

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i) & Mask
        var s = 0
        while (s < k) {
          val v = (as(s) * h + bs(s)) % Prime
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("as", as, "long[]")
    val bRef = ctx.addReferenceObj("bs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      s"""
         |final int $n = $arr.numElements();
         |final long[] $mins = new long[${as.length}];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    final long $h = $arr.getLong($i) & ${Mask}L;
         |    for (int $s = 0; $s < ${as.length}; $s++) {
         |      final long $v = ($aRef[$s] * $h + $bRef[$s]) % ${Prime}L;
         |      if ($v < $mins[$s]) $mins[$s] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(hashes: Column, as: Array[Long], bs: Array[Long]): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.column(MinHashSig(graftbridge.expression(hashes), as, bs))
  }
}
