package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.engine.Replayer
import graft.gen.{ChangeGen, GenConfig}
import graft.lake.LakeTable

/** Point-lookup read path ([[graft.lake.LakeTable.lookupKeys]]): an
  * explicit key list must read only the buckets those keys hash to, and
  * the pruned result must equal the full-scan filter exactly — including
  * the absence of deleted keys (tombstones filtered by the live view). */
class LookupSpec extends SparkSpec {

  private val cfg = GenConfig(seed = 91L, numEvents = 4000L, numRepos = 10,
    pathsPerRepo = 50, epochSize = 1000L)

  private def builtTable(): LakeTable = {
    val table = new LakeTable(tmpDir("lookup"), 8)
    Replayer.run(spark, ChangeGen.stream(spark, cfg).toDF(), table,
      maxEpoch = 3)
    table
  }

  /** `bucket=N/part-...` tails of the parquet files a plan's scans would
    * read. A part basename alone repeats across a commit's bucket dirs
    * (one write job, same uuid in every `bucket=N/`), so the identifying
    * unit is the last two path components; comparing those against the
    * manifest's per-bucket file lists also sidesteps scheme differences
    * (`file:/...` vs plain paths) between planner and manifest. Uses the
    * pre-adaptive `sparkPlan` — under AQE the executed plan wraps the
    * scans out of `collectLeaves`' reach until execution. */
  private def tail2(p: String): String = p.split('/').takeRight(2).mkString("/")

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.queryExecution.sparkPlan.collectLeaves().collect {
      case s: FileSourceScanExec =>
        s.relation.location.inputFiles.map(tail2).toSet
    }.flatten.toSet

  private def basenames(fs: Seq[graft.lake.ManifestFile]): Set[String] =
    fs.map(f => tail2(f.path)).toSet

  test("lookup equals the full-scan filter and scans only the key's bucket") {
    val table = builtTable()
    val snap = table.snapshot(spark).cache()
    try {
      val live = snap.select("repo", "path").orderBy("repo", "path")
        .head(3).map(r => Seq[Any](r.getString(0), r.getString(1)))
      live.foreach { k =>
        val got = table.lookupKeys(spark, Seq(k))
        val want = snap.filter(col("repo") === k(0) && col("path") === k(1))
        assert(got.count() == 1L)
        assert(got.collect().toSeq == want.collect().toSeq, s"key $k")
        // pruning is real AND exact: the scan reads precisely the
        // manifest's files of ONE bucket, not the whole table
        val m = table.currentManifest.get
        val byBucket = m.files.groupBy(_.bucket)
        val scanned = scannedFiles(got)
        val matched = byBucket.filter { case (_, fs) =>
          basenames(fs) == scanned }
        assert(matched.size == 1, s"scanned files of key $k must be " +
          s"exactly one bucket's manifest files (scanned ${scanned.size} " +
          s"of ${m.files.size})")
      }
    } finally snap.unpersist()
  }

  test("multi-key lookup spans multiple buckets, absent and deleted keys return nothing") {
    val table = builtTable()
    val snap = table.snapshot(spark).cache()
    try {
      val keys = snap.select("repo", "path").distinct()
        .orderBy("repo", "path").head(5)
        .map(r => Seq[Any](r.getString(0), r.getString(1))).toSeq
      val got = table.lookupKeys(spark, keys)
      val pred = keys.map(k =>
        col("repo") === k(0) && col("path") === k(1)).reduce(_ || _)
      assert(got.collect().toSet == snap.filter(pred).collect().toSet)
      // 5 keys hash to at most 5 of the table's 8 buckets, and every
      // bucket holds files at this scale — the scan is a strict subset
      // deterministically, whatever the 5 keys' bucket spread
      val m = table.currentManifest.get
      val scanned = scannedFiles(got)
      assert(scanned.subsetOf(basenames(m.files)))
      assert(scanned.size < m.files.size)
      // a key that never existed
      assert(table.lookupKeys(spark,
        Seq(Seq("no-such-repo", "no/such/path"))).count() == 0L)
      // a key whose latest event is a delete: raw holds its tombstone,
      // the live lookup must not return it
      val deleted = table.readRaw(spark)
        .filter(col("__deleted")).select("repo", "path").head(1)
      deleted.foreach { r =>
        val k = Seq[Any](r.getString(0), r.getString(1))
        val isLive = snap.filter(
          col("repo") === k(0) && col("path") === k(1)).count() > 0
        if (!isLive)
          assert(table.lookupKeys(spark, Seq(k)).count() == 0L,
            s"deleted key $k resurrected by lookup")
      }
    } finally snap.unpersist()
  }

  test("changesForKeys tails only the keys' buckets and folds to the head lookup") {
    val table = new LakeTable(tmpDir("lookup-cdc"), 8)
    val events = ChangeGen.stream(spark, cfg).toDF()
    Replayer.run(spark, events, table, maxEpoch = 3, upToEpoch = Some(1))
    val vMid = table.currentVersion
    Replayer.run(spark, events, table, maxEpoch = 3)
    val keys = table.snapshot(spark).select("repo", "path")
      .orderBy("repo", "path").head(3)
      .map(r => Seq[Any](r.getString(0), r.getString(1))).toSeq
    val pred = keys.map(k =>
      col("repo") === k(0) && col("path") === k(1)).reduce(_ || _)
    val got = table.changesForKeys(spark, vMid, keys)
    // differential: exactly the keyed slice of the full change stream
    assert(got.collect().toSet ==
      table.changesSince(spark, vMid).filter(pred).collect().toSet)
    // pruning: reads a strict subset of the interval's delta files
    // (3 keys hash to at most 3 of 8 buckets; both epochs of the
    // interval touch every bucket at this scale)
    val scannedKeyed = scannedFiles(got)
    val scannedFull = scannedFiles(table.changesSince(spark, vMid))
    assert(scannedKeyed.subsetOf(scannedFull))
    assert(scannedKeyed.size < scannedFull.size)
    // the keyed consumer contract: per-key old state + keyed changes
    // folds (engine's own latest-wins collapse) to the head lookup
    val old = table.readAt(spark, vMid).filter(pred)
    val folded = graft.lake.MergeUpsert.latestPerKey(
      old.unionByName(got, allowMissingColumns = true),
      Seq("updated_seq", "commit"), table.keyCols)
      .filter(!col("__deleted")).drop("__deleted")
    assert(folded.collect().toSet ==
      table.lookupKeys(spark, keys).collect().toSet)
  }

  test("arity mismatch and empty key list are loud errors") {
    val table = builtTable()
    intercept[IllegalArgumentException] {
      table.lookupKeys(spark, Seq(Seq("only-repo")))
    }
    intercept[IllegalArgumentException] {
      table.lookupKeys(spark, Seq.empty)
    }
  }
}
