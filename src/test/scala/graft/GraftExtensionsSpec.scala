package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** The `spark.sql.extensions` deployment surface: a session built with
  * [[GraftExtensions]] exposes the native Catalyst expressions to plain
  * SQL, with values EQUAL to the Column-API forms (same expression
  * classes, so equality is structural, not approximate), and carries the
  * PushSemiBelowCollapse rule from construction. */
class GraftExtensionsSpec extends SparkSpec {

  /** A sibling session over the SAME SparkContext built with the given
    * extensions (getOrCreate builds a NEW SparkSession when no
    * active/default one is set; the shared context is reused —
    * `withExtensions` is the in-JVM equivalent of launching with
    * `--conf spark.sql.extensions=graft.GraftExtensions`, which is read
    * from the CONTEXT conf and so can't be exercised against a live test
    * context). The shared test session is restored as default/active so
    * later suites are untouched. */
  private def siblingSession(ext: Option[GraftExtensions]): SparkSession = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
    ext.foreach(b.withExtensions)
    val s = b.getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    assert(s ne base, "sibling session must be a fresh SparkSession")
    s
  }

  private lazy val extSpark: SparkSession =
    siblingSession(Some(new GraftExtensions))

  private val sf = "/root/testdata/sf0.001"

  test("SQL cosine_sim / srp_signature equal the Column-API forms") {
    val emb = extSpark.read.parquet(s"$sf/embeddings.parquet")
    emb.createOrReplaceTempView("emb")
    val sqlRows = extSpark.sql(
      """SELECT vec_id, cosine_sim(embedding, embedding) AS self_cos,
                srp_signature(embedding, 64, 16) AS sig
         FROM emb""").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val colRows = emb.select(col("vec_id"),
        Similarity.cosine(col("embedding"), col("embedding")).as("c"),
        Similarity.srpSignature(col("embedding"), 64, 16).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(sqlRows == colRows)
    assert(sqlRows.values.forall { case (c, _) => math.abs(c - 1.0) < 1e-9 })
  }

  test("SQL minhash_sig / simhash_bits equal the Column-API forms") {
    // the shingle→hash prep is Column-composed (itself DuckDB-oracled via
    // dedup_ngram_jaccard); what's under test is the SQL registration of
    // the native FOLDS over the same hash arrays
    val docs = extSpark.read.parquet(s"$sf/documents.parquet").limit(50)
    val shing = graft.functions.TextAnalysis.shingles(col("text"), 3)
    val hashed = docs.select(col("doc_id"), col("text"),
      transform(shing, s => xxhash64(s)).as("hs"))
    hashed.createOrReplaceTempView("hashed_docs")
    val sqlRows = extSpark.sql(
      """SELECT doc_id, minhash_sig(hs, 16) AS mh, simhash_bits(hs, 64) AS sh
         FROM hashed_docs""").collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    val (as, bs) = Dedup.minHashCoefficients(16)
    val colRows = hashed.select(col("doc_id"),
        graft.functions.MinHashSig(col("hs"), as, bs).as("mh"),
        graft.functions.SimHashBits(col("hs"), 64).as("sh"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    assert(sqlRows.keySet == colRows.keySet && sqlRows.nonEmpty)
    sqlRows.foreach { case (id, (mh, sh)) =>
      assert(mh == colRows(id)._1, s"minhash doc $id")
      assert(sh == colRows(id)._2, s"simhash doc $id")
    }
    // and the SQL form equals the end-to-end library helper too
    val lib = docs.select(col("doc_id"),
        Dedup.minHashSignature(col("text"), 3, 16).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    sqlRows.foreach { case (id, (mh, _)) => assert(mh == lib(id), s"doc $id") }
  }

  test("SQL latest_by aggregates to the latest-wins winner") {
    import extSpark.implicits._
    Seq((1L, 1L, "a"), (1L, 3L, "c"), (1L, 2L, "b"), (2L, 9L, "z"))
      .toDF("k", "seq", "v").createOrReplaceTempView("ev")
    val got = extSpark.sql(
      """SELECT k, latest_by(v, seq) AS v FROM ev GROUP BY k ORDER BY k""")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "c"), (2L, "z")))
  }

  test("static sketch parameters must be literals (plan-time constants)") {
    val emb = extSpark.read.parquet(s"$sf/embeddings.parquet")
    emb.createOrReplaceTempView("emb2")
    val ex = intercept[Exception] {
      extSpark.sql(
        "SELECT srp_signature(embedding, CAST(vec_id AS INT), 16) FROM emb2")
        .collect()
    }
    val messages = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.toString).mkString("\n")
    assert(messages.contains("INT literal"), messages)
  }

  test("the extensions session carries PushSemiBelowCollapse without an explicit install") {
    // The real lake shape (snapshot = scan ∪ deltas → latest_by collapse →
    // tombstone filter → project), where Spark's own
    // PushDownLeftSemiAntiJoin refuses the push. The lake read path ALSO
    // installs the rule into `experimental` — so clear that hook before
    // optimizing: only the extensions-injected copy (baked immutably into
    // the optimizer's batches at session construction) can do the push.
    // Control: a no-extensions sibling with the hook cleared must NOT push.
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import graft.engine.Replayer
    import graft.lake.LakeTable

    val source = new LakeTable(tmpDir("ext-push-src"), 4)
    val events = graft.gen.ChangeGen.stream(extSpark,
      graft.gen.GenConfig(numEvents = 400, epochSize = 200)).toDF()
    Replayer.run(extSpark, events, source, maxEpoch = 1)
    assert(source.currentManifest.get.deltaFiles.nonEmpty,
      "collapse must be active for this test")

    def restricted(s: SparkSession) = {
      import s.implicits._
      source.snapshot(s).join(
        broadcast(Seq("repo-1", "repo-2").toDF("repo")), Seq("repo"), "left_semi")
    }
    def semiBelowCollapse(df: org.apache.spark.sql.DataFrame): Boolean = {
      val opt = df.queryExecution.optimizedPlan
      val semis = opt.collect { case j: Join if j.joinType == LeftSemi => j }
      semis.nonEmpty && semis.forall(j =>
        j.left.collect { case a: Aggregate => a }.isEmpty)
    }

    val df = restricted(extSpark) // snapshot() installs the experimental hook
    extSpark.experimental.extraOptimizations = Seq.empty
    assert(semiBelowCollapse(df),
      s"injected rule did not push:\n${df.queryExecution.optimizedPlan}")

    val ctrl = siblingSession(None)
    val dfc = restricted(ctrl)
    ctrl.experimental.extraOptimizations = Seq.empty
    assert(!semiBelowCollapse(dfc),
      "control session without extensions pushed too — test is not discriminating")
  }
}
