package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two paths:
  *
  *  - brute-force cosine top-k: correctness baseline. The query set is
  *    broadcast (it is small by construction), so the "cross join" is a
  *    BroadcastNestedLoopJoin that streams the corpus exactly once — no
  *    shuffle of the corpus, scales linearly with corpus size;
  *  - LSH-bucketed (random signed projections): the 100-TB path. Signatures
  *    are deterministic (seeded hyperplanes derived from xxhash64), buckets
  *    join as equi-joins, exact cosine reranks within buckets.
  *
  * All vector math is `zip_with`/`aggregate` Column expressions — codegen'd,
  * no UDF, no Python.
  */
object Similarity {

  /** dot(a,b) as a Column over two array<float/double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(0.0)).otherwise(d / nn)
  }

  /** Brute-force cosine top-k: for every query vector, the k nearest corpus
    * vectors (excluding self-matches by id). Deterministic tie-break on
    * candidate id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "cos", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (seed, plane, dim):
    * maps xxhash64 to a value in [-1, 1). No Math.random — reproducible. */
  private def planeComponent(plane: Int, dim: Column, seed: Int): Column =
    (pmod(xxhash64(lit(seed), lit(plane), dim), lit(2000001L)).cast("double")
      - 1000000.0) / 1000000.0

  /** Signed-random-projection signature: `nPlanes` sign bits packed in a
    * long. Vectors with equal signatures are cosine-close candidates. */
  def srpSignature(vec: Column, nPlanes: Int, seed: Int = 42): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i, seed)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** LSH-bucketed ANN: bucket by SRP signature bands, exact-cosine rerank
    * within buckets, top-k per query. Trades recall for never comparing a
    * query against the full corpus — the IVF/LSH scale path. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nPlanes: Int = 16, bands: Int = 4, seed: Int = 42): DataFrame = {
    require(nPlanes % bands == 0)
    val width = nPlanes / bands
    def banded(df: DataFrame, side: String): DataFrame = {
      val s = df.select(col(idCol).as(s"${side}_id"), col(vecCol).as(s"${side}_v"))
        .withColumn("sig", srpSignature(col(s"${side}_v"), nPlanes, seed))
      s.select(col(s"${side}_id"), col(s"${side}_v"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("sig"), b * width).bitwiseAND((1L << width) - 1)
              .as("bucket"))
        }: _*)).as("bb"))
        .select(col(s"${side}_id"), col(s"${side}_v"), col("bb.band"), col("bb.bucket"))
    }
    val c = banded(corpus, "cand")
    val q = banded(queries, "query")
    val candidates = c.join(q, Seq("band", "bucket"))
      .filter(col("cand_id") =!= col("query_id"))
      .select("query_id", "query_v", "cand_id", "cand_v").distinct()
    val scored = candidates.withColumn("cos", cosine(col("query_v"), col("cand_v")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "cos", "rank")
  }
}
