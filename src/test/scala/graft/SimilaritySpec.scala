package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Independent verification of the ANN operators: exact cosine math vs
  * plain-Scala arithmetic, and LSH recall measured against the brute-force
  * top-k on the deterministic sf0.001 embedding corpus (500 × 64-dim).
  * Floors are MEASURED constants pinned as regressions (deterministic
  * corpus + seeded hyperplanes ⇒ exact reproducibility). */
class SimilaritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 5)

  private lazy val vectors: Map[Long, Array[Float]] =
    emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def cosScala(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) 0.0 else d / nn
  }

  private def bruteTopK(q: Long, k: Int): Seq[Long] =
    vectors.toSeq.filter(_._1 != q)
      .map { case (id, v) => (id, cosScala(vectors(q), v)) }
      .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)

  test("Column cosine equals plain-Scala cosine (sampled rows)") {
    val got = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got.foreach { case ((q, c), v) =>
      assert(math.abs(v - cosScala(vectors(q), vectors(c))) < 1e-9, s"($q,$c)")
    }
  }

  test("brute-force top-k matches the plain-Scala ranking exactly") {
    val got = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq }
    (0L until 5L).foreach { q => assert(got(q) == bruteTopK(q, 10), s"query $q") }
  }

  test("LSH top-k achieves pinned recall@10 vs brute force, ids shuffle w/o vectors") {
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
      k = 10, dims = 64, nPlanes = 32, bands = 8)
    val got = lsh.collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recalls = (0L until 5L).map { q =>
      val truth = bruteTopK(q, 10).toSet
      got.getOrElse(q, Set.empty).count(truth.contains).toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // Pinned MEASURED floor (0.62 on this corpus with 32 planes / 8
    // bands). Context: this corpus's rank-10 neighbors sit at cos
    // 0.25-0.39 (θ≈70°, per-plane agreement p≈0.6) — a similarity regime
    // where SRP-LSH theory gives 1-(1-p⁴)⁸ ≈ 0.65 expected recall and
    // where NO band shape reaches high recall without the candidate set
    // degenerating to all-pairs (at width 2 × 16 bands even cos≈0 pairs
    // collide with P≈0.99). On near-dup-grade similarity (cos ≥ 0.8,
    // where the dedup pipeline operates) the same banding recalls ≥
    // 1-(1-0.93⁴)⁸ ≈ 0.999; the brute-force operator remains the exact
    // baseline path.
    assert(mean >= 0.6, f"mean recall@10 $mean%.2f < pinned 0.6 (${recalls.mkString(",")})")
    // candidate pairs are unique (id-level dedupe happened)
    val pairs = lsh.select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.distinct.length)
  }

  test("IVF assignment matches a plain-Scala argmax and is partition-invariant") {
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding",
      nCells = 16, sampleMod = 31)
    // sampling contract: lowest 16 ids ≡ 0 (mod 31), id order
    assert(cents.length == 16)
    assert(cents(0).sameElements(vectors(0L)))
    assert(cents(1).sameElements(vectors(31L)))
    assert(cents(15).sameElements(vectors(465L)))

    def scalaAssign(v: Array[Float]): Int =
      cents.zipWithIndex
        .map { case (c, i) => (cosScala(v, c), i) }
        .maxBy { case (cos, i) => (cos, -i) }._2 // ties → lowest cell

    val got = emb.select(col("vec_id"),
        Similarity.ivfAssign(col("embedding"), cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vectors.foreach { case (id, v) =>
      assert(got(id) == scalaAssign(v), s"vec $id")
    }
    // partition count must not change assignment (map-only determinism)
    val got7 = emb.repartition(7).select(col("vec_id"),
        Similarity.ivfAssign(col("embedding"), cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got7 == got)
    // the assignment plans with no join and no shuffle
    val plan = emb.select(Similarity.ivfAssign(col("embedding"), cents))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
  }

  test("IVF top-k achieves pinned recall@10 vs brute force; BHJ on cell; ids-only exchange") {
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 10, nCells = 16, nProbe = 4, sampleMod = 31)
    val rows = ivf.collect()
    val got = rows.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recalls = (0L until 5L).map { q =>
      val truth = bruteTopK(q, 10).toSet
      got.getOrElse(q, Set.empty).count(truth.contains).toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // Pinned MEASURED floor: 0.64 mean on this corpus (per-query
    // 1.0/0.5/0.5/0.7/0.5) — deterministic corpus + modulo centroid
    // sample ⇒ exact reproducibility. Context: nProbe/nCells = 4/16
    // scores ~25% of the corpus per query when cells are balanced; in
    // this corpus's diffuse cos 0.25-0.39 neighbor regime recall tracks
    // the probed fraction plus query-neighbor cell correlation —
    // comparable to SRP-LSH's 0.62 above on the same corpus. On
    // clustered (real-embedding) corpora IVF recall concentrates sharply
    // because neighbors share cells by construction.
    info(f"IVF mean recall@10 = $mean%.2f (${recalls.mkString(",")})")
    assert(mean >= 0.6, f"mean recall@10 $mean%.2f < pinned 0.6 (${recalls.mkString(",")})")
    // each (query, cand) pair appears at most once — structural, no dedupe
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.distinct.length)
    // plan shape: broadcast equi-join on cell, never a cartesian; the
    // rerank exchange carries ids+score only (vectors dropped map-side)
    val plan = ivf.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty &&
      exchanges.forall(l => !l.contains("cv") && !l.contains("qv")),
      exchanges.mkString("\n"))
  }

  test("ivfTopK accepts array<double> vectors and ranks identically to " +
      "the float corpus (float→double widening is exact)") {
    val embD = emb.withColumn("embedding",
      expr("transform(embedding, x -> cast(x as double))"))
    val qD = embD.filter(col("vec_id") < 5)
    def ranks(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.select("query_id", "cand_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val f = ranks(Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 10, nCells = 16, nProbe = 4, sampleMod = 31))
    val d = ranks(Similarity.ivfTopK(embD, qD, "vec_id", "embedding",
      k = 10, nCells = 16, nProbe = 4, sampleMod = 31))
    assert(d == f)
  }

  test("IvfCellRank edge semantics: zero vector, null element, dims mismatch stay total") {
    import spark.implicits._
    val cents = Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f), Array(1.0f, 1.0f))
    val rows = Seq(
      (1L, Seq(Some(0.0f), Some(0.0f))),   // zero vector: nn==0 → cos 0.0 everywhere
      (2L, Seq(Some(1.0f), None)),          // null element → all cells -2.0
      (3L, Seq(Some(1.0f))),                // dims mismatch → all cells -2.0
      (4L, Seq.empty[Option[Float]]),       // empty: mismatch vs every centroid
      (5L, Seq(Some(1.0f), Some(0.1f))))    // ordinary: nearest cell 0, then 2, then 1
    val df = rows.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val got = df.select(col("id"),
        graft.functions.IvfCellRank(col("vec"),
          cents.map(_.map(_.toDouble))).as("rank"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    // ties (all-equal scores) keep ascending cell order — the documented
    // (cos DESC, cell ASC) tie-break; no row errors, the operator is total
    assert(got(1L) == List(0, 1, 2))
    assert(got(2L) == List(0, 1, 2))
    assert(got(3L) == List(0, 1, 2))
    assert(got(4L) == List(0, 1, 2))
    assert(got(5L) == List(0, 2, 1))
    // assignment lands every malformed row in cell 0 instead of failing
    val cells = df.select(col("id"),
        Similarity.ivfAssign(col("vec"), cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 0))
  }

  test("SRP signatures are deterministic, native-codegen'd, and match a Scala reference") {
    val s1 = emb.select(col("vec_id"),
        Similarity.srpSignature(col("embedding"), 64, 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = emb.repartition(7).select(col("vec_id"),
        Similarity.srpSignature(col("embedding"), 64, 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == s2)
    // independent plain-Scala reference over the same (seeded) planes
    val planes = Array.tabulate(16, 64)((p, d) => {
      val h = graft.gen.ChangeGen.mix64(42L * 0x9E3779B9L + p * 100003L + d)
      ((h >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    })
    vectors.foreach { case (id, v) =>
      var sig = 0L
      (0 until 16).foreach { p =>
        val dot = v.indices.map(d => v(d).toDouble * planes(p)(d)).sum
        if (dot >= 0.0) sig |= (1L << p)
      }
      assert(sig == s1(id), s"vec $id")
    }
    // the native expression plans (no interpreted HOF tree, no hash calls)
    val plan = emb.select(Similarity.srpSignature(col("embedding"), 64, 16))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("srp_signature"), plan)
    assert(!plan.contains("xxhash64"), "plane matrix must be plan-time constant")
  }
}
