package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Independent verification of the near-dup operators against BRUTE-FORCE
  * plain-Scala ground truth on the sf0.001 corpus (500 docs; 28 true
  * near-dup pairs, all with trigram Jaccard ≥ 0.8, next pair below 0.3 —
  * a clean separation band).
  *
  * These are the correctness gates for the seeded-xxhash64 LIBRARY
  * DEFAULTS of the sketch operators (the driver-checked query surfaces
  * run the same code paths over md5-derived hashes a DuckDB oracle
  * recomputes exactly; xxhash64's seeding is not expressible there):
  * recall/precision floors here are MEASURED values pinned as
  * regressions, not aspirations — corpus and hash seeds are
  * deterministic, so the numbers are exact constants.
  */
class DedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  /** Ground truth: word-trigram shingle sets with the SAME normalization
    * as TextAnalysis.shingles (trim, lowercase, split on \s+). */
  private lazy val shingleSets: Map[Long, Set[String]] = {
    val rows = docs.select("doc_id", "text").collect()
    rows.map { r =>
      val w = r.getString(1).trim.toLowerCase.split("\\s+")
      r.getLong(0) -> w.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    }.toMap
  }

  /** Stop-shingle document frequency (mirrors maxShingleDocs pruning). */
  private lazy val shingleDf: Map[String, Int] =
    shingleSets.values.flatten.toSeq.groupBy(identity).map { case (g, xs) => g -> xs.size }

  /** All pairs with PRUNED-intersection Jaccard ≥ minJ — the exact formula
    * ngramJaccard computes: shingles with df > maxDocs are excluded from
    * the intersection but still count in |A|, |B|. */
  private def truthPairs(minJ: Double, maxDocs: Int = 100): Map[(Long, Long), Double] = {
    val ids = shingleSets.keys.toSeq.sorted
    (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      inter = (shingleSets(a) & shingleSets(b)).count(g => shingleDf(g) <= maxDocs)
      if inter > 0
      jac = inter.toDouble / (shingleSets(a).size + shingleSets(b).size - inter)
      if jac >= minJ
    } yield (a, b) -> jac).toMap
  }

  test("ngramJaccard equals brute-force ground truth EXACTLY") {
    val got = Dedup.ngramJaccard(docs, "doc_id", "text", k = 3,
        minJaccard = 0.5, maxShingleDocs = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val want = truthPairs(0.5)
    assert(got.keySet == want.keySet,
      s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-9, s"$k: $v vs ${want(k)}") }
    assert(want.nonEmpty, "fixture must contain near-dup pairs")
  }

  test("minHash-LSH candidates achieve measured recall on true J>=0.8 pairs") {
    val truth = truthPairs(0.8).keySet
    assert(truth.size >= 20, s"expected a rich truth set, got ${truth.size}")
    val cand = Dedup.minHashLsh(docs, "doc_id", "text",
        k = 3, numHashes = 16, bands = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val candSet = cand.map(_._1).toSet
    val recall = truth.count(candSet.contains).toDouble / truth.size
    // bands=8, r=2: P(collision) = 1-(1-J²)⁸ ≥ 0.9997 at J=0.8 — measured
    // 1.0 on this corpus; pinned as an exact regression floor
    assert(recall >= 1.0, f"minhash recall $recall%.3f < pinned 1.0")
    // signature estimate tracks true Jaccard on the true pairs
    val errs = cand.filter(c => truth.contains(c._1))
      .map { case (p, est) => math.abs(est - truthPairs(0.8)(p)) }
    assert(errs.nonEmpty && errs.sum / errs.size <= 0.15,
      f"est_jaccard MAE ${errs.sum / errs.size}%.3f too high")
  }

  test("simHash banding: pair set equals in-JVM banding over the same signatures") {
    // verifies the DISTRIBUTED half (banded self-join + hamming + cap)
    // against a plain-Scala reference over the identical signatures; the
    // signature function itself is pinned by the recall test below
    val sigs = docs.select(col("doc_id"),
        Dedup.simHash(col("text"), nBits = 64, shingleK = 2).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = sigs.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      // candidate iff some 8-bit chunk of the 64-bit hash matches
      if (0 until 8).exists(c =>
        ((sigs(a) >>> (c * 8)) & 0xFF) == ((sigs(b) >>> (c * 8)) & 0xFF))
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
      if h <= 8
    } yield (a, b) -> h).toMap
    val got = Dedup.simHashPairs(docs, "doc_id", "text", nBits = 64, chunks = 8)
      .filter(col("hamming") <= 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == expected,
      s"missing=${expected.keySet -- got.keySet} extra=${got.keySet -- expected.keySet}")
  }

  test("simHash near-dup recall/precision vs true J>=0.8 pairs (pinned)") {
    val truth = truthPairs(0.8).keySet
    val got = Dedup.simHashPairs(docs, "doc_id", "text", nBits = 64, chunks = 8)
      .filter(col("hamming") <= 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(got.contains).toDouble / truth.size
    val truthLoose = truthPairs(0.3).keySet // anything with real overlap
    val falsePos = got -- truthLoose
    // measured 27/28 = 0.964: one pair at the J≈0.8 boundary lands at
    // hamming 9 — inherent simhash quantization, pinned as the floor
    assert(recall >= 0.96, f"simhash recall $recall%.3f < pinned 0.96")
    assert(falsePos.size <= 2,
      s"shingle simhash@hamming<=8 admitted ${falsePos.size} unrelated pairs " +
        s"(head: ${falsePos.take(5)})")
  }

  test("exact dedupe: canonical min-id per digest, counts preserved") {
    val dup = docs.select("doc_id", "text")
      .unionByName(docs.select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val res = Dedup.exact(dup, "text", "doc_id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    assert(res.length == docs.select("text").distinct().count().toInt)
    assert(res.forall(_._2._2 >= 2), "every content occurs at least twice")
    assert(res.forall(_._2._1 < 10000), "canonical id must be the min (original)")
  }
}
