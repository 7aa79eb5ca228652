package graft

import org.apache.spark.sql.functions._
import graft.gen.{ChangeGen, GenConfig}
import graft.lake.{LakeTable, MergeUpsert}
import graft.engine.Replayer
import graft.oracle.FoldOracle

/** Replay-equivalence suites (SURVEY.md §5, north_rule): the Spark engine's
  * incremental merge must converge to the independent single-threaded fold
  * oracle under chunked replay, duplicate delivery, resume-from-checkpoint,
  * and crash-between-write-and-commit. Compared by whole-table sha256
  * digest over per-row content sha256 (input_hint).
  */
class ReplaySpec extends SparkSpec {

  private def freshTable(buckets: Int = 8): LakeTable =
    new LakeTable(tmpDir("lake"), buckets)

  private val cfg = GenConfig(seed = 7L, numEvents = 5000L, numRepos = 20,
    pathsPerRepo = 60, epochSize = 500L)

  private def oracleDigest(c: GenConfig): String =
    FoldOracle.digestOfState(FoldOracle.expectedState(c))

  test("full replay reproduces the fold-oracle final state (sha256 equality)") {
    val table = freshTable()
    val events = ChangeGen.stream(spark, cfg).toDF()
    val report = Replayer.run(spark, events, table, maxEpoch = 9)
    assert(report.epochs.size == 10)
    assert(FoldOracle.digestOfTable(table.snapshot(spark)) == oracleDigest(cfg))
  }

  test("chunked replay (different epoch sizes) converges to the same state") {
    val small = cfg.copy(epochSize = 100L)  // 50 epochs
    val big = cfg.copy(epochSize = 2500L)   // 2 epochs
    val t1 = freshTable(); val t2 = freshTable()
    Replayer.run(spark, ChangeGen.stream(spark, small).toDF(), t1, maxEpoch = 49)
    Replayer.run(spark, ChangeGen.stream(spark, big).toDF(), t2, maxEpoch = 1)
    val d1 = FoldOracle.digestOfTable(t1.snapshot(spark))
    val d2 = FoldOracle.digestOfTable(t2.snapshot(spark))
    assert(d1 == d2)
    assert(d1 == oracleDigest(small))
  }

  test("duplicate delivery is neutralized by idempotent merge") {
    val dup = cfg.copy(duplicateRate = 100) // +10% re-delivered events
    val table = freshTable()
    Replayer.run(spark, ChangeGen.stream(spark, dup).toDF(), table, maxEpoch = 9)
    assert(FoldOracle.digestOfTable(table.snapshot(spark)) == oracleDigest(cfg))
  }

  test("duplicate EPOCH delivery is a no-op (exactly-once)") {
    val table = freshTable()
    val events = ChangeGen.stream(spark, cfg).toDF()
    Replayer.run(spark, events, table, maxEpoch = 9)
    val digest1 = FoldOracle.digestOfTable(table.snapshot(spark))
    val v1 = table.currentVersion
    // re-deliver epochs 3..7 wholesale
    (3L to 7L).foreach { e =>
      val r = MergeUpsert.mergeEpoch(spark, table,
        events.filter(col("epoch") === e), e)
      assert(r.isEmpty, s"epoch $e should be skipped")
    }
    assert(table.currentVersion == v1)
    assert(FoldOracle.digestOfTable(table.snapshot(spark)) == digest1)
  }

  test("resume from checkpoint: kill after epoch 4, resume, same state") {
    val table = freshTable()
    val events = ChangeGen.stream(spark, cfg).toDF()
    Replayer.run(spark, events, table, maxEpoch = 9, upToEpoch = Some(4))
    assert(table.lastCommittedEpoch == 4)
    // "restart": a new Replayer run picks up from the manifest watermark
    val resumed = Replayer.run(spark, events, table, maxEpoch = 9)
    assert(resumed.epochs.map(_.epoch) == (5L to 9L))
    assert(FoldOracle.digestOfTable(table.snapshot(spark)) == oracleDigest(cfg))
  }

  test("crash between data-file write and manifest commit leaves state recoverable") {
    val table = freshTable()
    val events = ChangeGen.stream(spark, cfg).toDF()
    Replayer.run(spark, events, table, maxEpoch = 9, upToEpoch = Some(3))
    // simulate the crash: next version's data dir exists with garbage,
    // but no manifest was committed for it
    val orphanDir = table.newCommitDir(table.currentVersion + 1)
    java.nio.file.Files.createDirectories(orphanDir)
    java.nio.file.Files.writeString(orphanDir.resolve("bucket=0"), "garbage")
    // resume overwrites the orphan dir and commits normally
    Replayer.run(spark, events, table, maxEpoch = 9)
    assert(FoldOracle.digestOfTable(table.snapshot(spark)) == oracleDigest(cfg))
  }

  test("deletes remove keys; later updates re-insert them") {
    import graft.model.ChangeEvent
    val evs = Seq(
      ChangeEvent(0, 0, "I", "r", "a", "c0", "scala", "v0", 1),
      ChangeEvent(1, 0, "U", "r", "a", "c1", "scala", "v1", 1),
      ChangeEvent(2, 1, "D", "r", "a", "c2", "scala", "", 1),
      ChangeEvent(3, 1, "I", "r", "b", "c3", "scala", "vb", 1),
      ChangeEvent(4, 2, "U", "r", "a", "c4", "scala", "v4", 1))
    import spark.implicits._
    val table = freshTable(2)
    Replayer.run(spark, evs.toDF(), table, maxEpoch = 2)
    val state = table.snapshot(spark).select("repo", "path", "commit", "content")
      .collect().map(r => (r.getString(1), (r.getString(2), r.getString(3)))).toMap
    assert(state == Map("a" -> ("c4", "v4"), "b" -> ("c3", "vb")))
    assert(FoldOracle.digestOfTable(table.snapshot(spark)) ==
      FoldOracle.digestOfState(FoldOracle.expectedState(evs)))
  }

  test("manifest CAS: stale version commit loses the race") {
    val table = freshTable()
    val events = ChangeGen.stream(spark, cfg).toDF()
    Replayer.run(spark, events, table, maxEpoch = 2)
    val m = table.currentManifest.get
    assert(!table.tryCommit(m)) // same version again → CAS failure
    assert(table.tryCommit(m.copy(version = m.version + 1)))
  }

  test("lineage metrics are recorded per epoch") {
    val table = freshTable()
    Replayer.run(spark, ChangeGen.stream(spark, cfg).toDF(), table, maxEpoch = 9)
    val lin = Replayer.lineage(table)
    assert((0 to 9).forall(e => lin.contains(s"epoch_$e")))
    assert(lin("epoch_0").contains("events="))
    assert(lin("epoch_0").contains("bytes="))
  }

  test("an epoch overtaken without ever committing throws; a committed one skips") {
    val table = freshTable()
    val events = ChangeGen.stream(spark, cfg).toDF()
    Replayer.run(spark, events, table, maxEpoch = 4)
    // committed epoch below the watermark → exactly-once no-op
    assert(MergeUpsert.mergeEpoch(spark, table,
      events.filter(col("epoch") === 2), 2L).isEmpty)
    // forge a manifest whose watermark jumped PAST an uncommitted epoch
    // (epoch 7 has no lineage entry): merging 7 must throw, not silently
    // orphan its events — the single-sequential-writer ordering contract
    val m = table.currentManifest.get
    assert(table.tryCommit(m.copy(version = m.version + 1, epochWatermark = 9L)))
    val ex = intercept[IllegalStateException] {
      MergeUpsert.mergeEpoch(spark, table, events.filter(col("epoch") === 7), 7L)
    }
    assert(ex.getMessage.contains("never committed"))
  }

  test("lineage registry is bounded; truncated epochs still skip exactly-once") {
    val key = "graft.lineage.cap"
    val prev = sys.props.get(key)
    sys.props(key) = "6"
    try {
      val small = cfg.copy(epochSize = 250L) // 20 epochs >> cap 6
      val table = freshTable()
      val events = ChangeGen.stream(spark, small).toDF()
      Replayer.run(spark, events, table, maxEpoch = 19)
      val m = table.currentManifest.get
      assert(m.lineage.size <= 6, s"lineage must be capped: ${m.lineage.size}")
      assert(m.lineageEpochFloor > 0, "floor must advance over truncation")
      assert(m.lineage.contains("epoch_19"), "newest entries retained")
      // a re-delivered epoch BELOW the floor is recognized as committed
      // (contiguity proof), not mistaken for an ordering violation
      assert(MergeUpsert.mergeEpoch(spark, table,
        events.filter(col("epoch") === 0), 0L).isEmpty)
      assert(FoldOracle.digestOfTable(table.snapshot(spark)) ==
        oracleDigest(small))
    } finally {
      prev match { case Some(v) => sys.props(key) = v
                   case None => sys.props -= key }
    }
  }

  test("a root whose FIRST commit is at epoch N>0 truncates lineage cleanly") {
    // the rebuildDomain shape: a fresh root seeded at the source watermark
    // (first commit at N=8). The floor must seed at N, not 0 — otherwise
    // the first lineage truncation finds the oldest entry (epoch_8) above
    // a floor of 0, fails the contiguity require, and every subsequent
    // merge/compact on the table throws permanently.
    val key = "graft.lineage.cap"
    val prev = sys.props.get(key)
    sys.props(key) = "6"
    try {
      val small = cfg.copy(epochSize = 250L) // 20 epochs
      val table = freshTable()
      val events = ChangeGen.stream(spark, small).toDF()
      (8L to 19L).foreach { e => // 12 commits >> cap 6 → truncation fires
        assert(MergeUpsert.mergeEpoch(spark, table,
          events.filter(col("epoch") === e), e).isDefined)
      }
      val m = table.currentManifest.get
      assert(m.lineage.size <= 6, s"lineage must be capped: ${m.lineage.size}")
      assert(m.lineageEpochFloor > 8L,
        s"floor must advance past the first committed epoch: ${m.lineageEpochFloor}")
      // epochs below the FIRST commit are treated as incorporated by the
      // rebuild — re-delivery is an exactly-once no-op, not an ordering error
      assert(MergeUpsert.mergeEpoch(spark, table,
        events.filter(col("epoch") === 3), 3L).isEmpty)
    } finally {
      prev match { case Some(v) => sys.props(key) = v
                   case None => sys.props -= key }
    }
  }

  test("mid-run incremental compaction interleaves with active replay") {
    // compactEvery=2 over 10 epochs: hot-bucket folds fire WHILE later
    // epochs keep appending deltas, then a full fold closes the run —
    // digest must still equal the oracle and the base tier must be pure
    val table = freshTable()
    val events = ChangeGen.stream(spark, cfg).toDF()
    val report = Replayer.run(spark, events, table, maxEpoch = 9,
      compactEvery = 2)
    assert(report.compactions >= 3,
      s"expected several mid-run folds + the final one, got ${report.compactions}")
    assert(table.currentManifest.get.deltaFiles.isEmpty,
      "final state must be a pure base tier")
    assert(FoldOracle.digestOfTable(table.snapshot(spark)) == oracleDigest(cfg))
  }
}
