package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineSim, LatestBy, MinHashSig, SimHashBits, SrpSignature}

/** The engine's `SparkSessionExtensions` entry point — the idiomatic
  * cluster deployment surface: `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`) makes
  * every native Catalyst expression callable from SQL and installs the
  * [[graft.plans.PushSemiBelowCollapse]] optimizer rule session-wide, so a
  * SQL-only user (the reference's audience writes T-SQL —
  * /root/reference/ArchitecturePlan.md:37-39) gets the engine's codegen'd
  * sketch/similarity kernels and plan rewrites with zero Scala.
  *
  * The programmatic path is unchanged: the Column-API companions build the
  * same expressions, and the lake read path still calls
  * `PushSemiBelowCollapse.ensureInstalled` per session — the injection here
  * just makes the rule present from session construction (injected rules
  * run in the operator-optimization batch; the experimental hook remains
  * idempotent alongside it, the rule object is a no-op on already-pushed
  * plans).
  *
  * Static parameters (dims / plane counts / hash counts) must be INT
  * literals — they parameterize plan-time constants (the SRP hyperplane
  * matrix, the universal-hash coefficient arrays), exactly like the Column
  * API, never per-row values.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.PushSemiBelowCollapse)
    GraftExtensions.functions.foreach(ext.injectFunction)
  }
}

object GraftExtensions {

  private def litInt(fn: String, what: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an INT literal (a plan-time constant), got $other")
  }

  private def arity(fn: String, args: Seq[Expression], ns: Int*): Unit =
    require(ns.contains(args.length),
      s"$fn takes ${ns.mkString(" or ")} arguments, got ${args.length}")

  private def fun(name: String, clazz: Class[_], usage: String)(
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getCanonicalName, null, name, usage, ""),
      builder)

  /** (identifier, info, builder) triples, shared by [[GraftExtensions]]
    * and tests. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(

    fun("cosine_sim", classOf[CosineSim],
        "_FUNC_(a, b) - cosine similarity of two array<float|double>") {
      args =>
        arity("cosine_sim", args, 2)
        CosineSim(args(0), args(1))
    },

    fun("srp_signature", classOf[SrpSignature],
        "_FUNC_(vec, dims, nPlanes[, seed]) - signed-random-" +
          "projection sign bits packed in a BIGINT") { args =>
      arity("srp_signature", args, 3, 4)
      val dims = litInt("srp_signature", "dims", args(1))
      val nPlanes = litInt("srp_signature", "nPlanes", args(2))
      val seed = if (args.length == 4) litInt("srp_signature", "seed", args(3)) else 42
      require(nPlanes <= 63, "srp_signature: nPlanes must be <= 63")
      SrpSignature(args.head,
        graft.operators.Similarity.planeMatrix(dims, nPlanes, seed))
    },

    fun("minhash_sig", classOf[MinHashSig],
        "_FUNC_(hashes, numHashes) - MinHash signature " +
          "(array<bigint>) over an array<bigint> of feature hashes") { args =>
      arity("minhash_sig", args, 2)
      val n = litInt("minhash_sig", "numHashes", args(1))
      val (as, bs) = graft.operators.Dedup.minHashCoefficients(n)
      MinHashSig(args.head, as, bs)
    },

    fun("simhash_bits", classOf[SimHashBits],
        "_FUNC_(hashes, nBits) - SimHash sign-vote fold of an " +
          "array<bigint> of feature hashes into an nBits-wide BIGINT") { args =>
      arity("simhash_bits", args, 2)
      SimHashBits(args.head, litInt("simhash_bits", "nBits", args(1)))
    },

    fun("latest_by", classOf[LatestBy],
        "_FUNC_(payload, ord) - aggregate: payload of the row with the " +
          "greatest ord (the lake's merge-on-read collapse winner)") { args =>
      arity("latest_by", args, 2)
      LatestBy(args(0), args(1)) // Analyzer wraps AggregateFunction results
    })
}
