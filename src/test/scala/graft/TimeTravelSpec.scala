package graft

import graft.engine.Replayer
import graft.gen.{ChangeGen, GenConfig}
import graft.lake.{LakeTable, Maintenance}
import graft.oracle.FoldOracle

/** Bounded time travel over the manifest log: every commit is an immutable
  * snapshot, so `snapshotAt(version)` reproduces the table exactly as of
  * that commit — until vacuum's retention floor reclaims the manifests and
  * the files only they reference. */
class TimeTravelSpec extends SparkSpec {

  private val cfg = GenConfig(seed = 17L, numEvents = 3000L, numRepos = 12,
    pathsPerRepo = 40, epochSize = 500L)

  private def digestUpToEpoch(k: Long): String =
    FoldOracle.digestOfState(FoldOracle.expectedState(
      (0L until math.min(cfg.numEvents, (k + 1) * cfg.epochSize))
        .map(ChangeGen.eventAt(cfg, _))))

  test("snapshotAt(version) reproduces the state as of each epoch's commit") {
    val table = new LakeTable(tmpDir("tt"), 4)
    val events = ChangeGen.stream(spark, cfg).toDF()
    val versionAfter = (0L to 5L).map { e =>
      Replayer.run(spark, events, table, maxEpoch = 5, upToEpoch = Some(e))
      e -> table.currentVersion
    }.toMap
    // every historical epoch state remains addressable and exact
    (0L to 5L).foreach { e =>
      assert(FoldOracle.digestOfTable(
        table.snapshotAt(spark, versionAfter(e))) == digestUpToEpoch(e),
        s"epoch $e via version ${versionAfter(e)}")
    }
  }

  test("changesSince: old snapshot + change stream folds to the head snapshot") {
    import org.apache.spark.sql.functions._
    val table = new LakeTable(tmpDir("tt-cdc"), 4)
    val events = ChangeGen.stream(spark, cfg).toDF()
    Replayer.run(spark, events, table, maxEpoch = 5, upToEpoch = Some(2))
    val vMid = table.currentVersion
    // continue INCLUDING a mid-run compaction — compaction commits must
    // contribute no rows to the change stream, and delta files it folds
    // away must still be readable as changes
    Replayer.run(spark, events, table, maxEpoch = 4, compactEvery = 2)
    Replayer.run(spark, events, table, maxEpoch = 5)
    val changes = table.changesSince(spark, vMid)
    assert(changes.count() > 0)
    // the consumer contract: fold the changes over the old snapshot with
    // the engine's own latest-wins collapse → exactly the head snapshot
    val old = table.readAt(spark, vMid)
    val folded = graft.lake.MergeUpsert.latestPerKey(
      old.unionByName(changes, allowMissingColumns = true),
      Seq("updated_seq", "commit"), table.keyCols)
      .filter(!col("__deleted")).drop("__deleted")
    assert(FoldOracle.digestOfTable(folded) ==
      FoldOracle.digestOfTable(table.snapshot(spark)))
    // and a no-op interval is empty
    assert(table.changesSince(spark, table.currentVersion).count() == 0)
  }

  test("changesSince survives a rename + FULL compaction: pre-rename " +
      "change files are canonicalized under their own manifest, never " +
      "read as NULL against the head's cleared mapping") {
    import org.apache.spark.sql.functions._
    val table = new LakeTable(tmpDir("tt-ren"), 4)
    val events = ChangeGen.stream(spark, cfg).toDF()
    Replayer.run(spark, events, table, maxEpoch = 5, upToEpoch = Some(1))
    val v0 = table.currentVersion
    // epoch 2's delta files are written with the PRE-rename physical name
    Replayer.run(spark, events, table, maxEpoch = 5, upToEpoch = Some(2))
    table.renameColumn("lang", "language")
    // post-rename epochs (batches still feeding 'lang' are normalized),
    // then a FULL compaction — which clears the head's rename mapping
    Replayer.run(spark, events, table, maxEpoch = 5, upToEpoch = Some(4))
    Maintenance.compact(spark, table)
    assert(table.currentManifest.get.renames.isEmpty, "mapping cleared")
    // once compaction materializes the rename, the FEED must be migrated
    // too (a still-'lang' feed would re-introduce the retired name as a
    // genuinely new column — mergeEpoch's documented semantics)
    Replayer.run(spark, events.withColumnRenamed("lang", "language"),
      table, maxEpoch = 5)

    val changes = table.changesSince(spark, v0)
    // the epoch-2 pre-rename files must surface real values under the
    // head-canonical name — the silent-NULL regression this test pins
    assert(changes.filter(col("language").isNull).count() == 0,
      "pre-rename change files read as NULL language")
    // consumer contract across the rename: old snapshot (renamed by the
    // consumer, who observed the DDL) + changes folds to the head state
    val old = table.readAt(spark, v0).withColumnRenamed("lang", "language")
    val folded = graft.lake.MergeUpsert.latestPerKey(
      old.unionByName(changes, allowMissingColumns = true),
      Seq("updated_seq", "commit"), table.keyCols)
      .filter(!col("__deleted")).drop("__deleted")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("repo", "path", "commit", "language", "content")
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(rows(folded) == rows(table.snapshot(spark)))
  }

  test("changesSince maps CHAINED renames (a→b then b→c) forward across " +
      "the interval") {
    import org.apache.spark.sql.functions._
    val table = new LakeTable(tmpDir("tt-ren2"), 4)
    val events = ChangeGen.stream(spark, cfg).toDF()
    Replayer.run(spark, events, table, maxEpoch = 5, upToEpoch = Some(0))
    val v0 = table.currentVersion
    Replayer.run(spark, events, table, maxEpoch = 5, upToEpoch = Some(1))
    table.renameColumn("lang", "language")        // epoch-1 files say 'lang'
    Replayer.run(spark, events, table, maxEpoch = 5, upToEpoch = Some(3))
    table.renameColumn("language", "dialect")     // 2-3 files say 'language'
    Replayer.run(spark,
      events.withColumnRenamed("lang", "language"), // feed may use any alias
      table, maxEpoch = 5, upToEpoch = Some(4))
    Maintenance.compact(spark, table)             // clears BOTH mappings
    Replayer.run(spark, events.withColumnRenamed("lang", "dialect"),
      table, maxEpoch = 5)
    val changes = table.changesSince(spark, v0)
    assert(changes.columns.contains("dialect") &&
      !changes.columns.contains("lang") && !changes.columns.contains("language"))
    assert(changes.filter(col("dialect").isNull).count() == 0,
      "every generation of physical name must fold into the head column")
    val old = table.readAt(spark, v0).withColumnRenamed("lang", "dialect")
    val folded = graft.lake.MergeUpsert.latestPerKey(
      old.unionByName(changes, allowMissingColumns = true),
      Seq("updated_seq", "commit"), table.keyCols)
      .filter(!col("__deleted")).drop("__deleted")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("repo", "path", "commit", "dialect", "content")
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(rows(folded) == rows(table.snapshot(spark)))
  }

  test("compaction does not disturb history; vacuum bounds it") {
    val table = new LakeTable(tmpDir("tt-vac"), 4)
    val events = ChangeGen.stream(spark, cfg).toDF()
    Replayer.run(spark, events, table, maxEpoch = 5, upToEpoch = Some(2))
    val vMid = table.currentVersion
    val midDigest = FoldOracle.digestOfTable(table.snapshotAt(spark, vMid))
    Replayer.run(spark, events, table, maxEpoch = 5)
    Maintenance.compact(spark, table)
    // the compacted head is a NEW snapshot; vMid still reads the old files
    assert(FoldOracle.digestOfTable(table.snapshotAt(spark, vMid)) == midDigest)
    val head = FoldOracle.digestOfTable(table.snapshot(spark))

    // vacuum to the current version only: old manifests drop, and the
    // files only they referenced are reclaimed — time travel is bounded
    val vr = Maintenance.vacuum(table, retainVersions = 1, graceMillis = 0L)
    assert(vr.manifestsDropped > 0)
    assert(vr.filesDeleted > 0, "pre-compaction files must be reclaimed")
    val ex = intercept[IllegalArgumentException] {
      table.snapshotAt(spark, vMid)
    }
    assert(ex.getMessage.contains("vacuumed") ||
      ex.getMessage.contains("does not exist"))
    assert(FoldOracle.digestOfTable(table.snapshot(spark)) == head,
      "the retained head must be unaffected")
  }

  test("versionAtEpoch resolves the most-compacted retained manifest at a " +
      "watermark; vacuumed epochs resolve to None") {
    val table = new LakeTable(tmpDir("tt-vae"), 4)
    val events = ChangeGen.stream(spark, cfg).toDF()
    Replayer.run(spark, events, table, maxEpoch = 4)
    // every committed epoch resolves, and to a manifest AT that watermark
    (0L to 4L).foreach { e =>
      val v = table.versionAtEpoch(e)
      assert(v.isDefined, s"epoch $e")
      assert(table.readManifest(v.get).epochWatermark == e)
    }
    assert(table.versionAtEpoch(5L).isEmpty, "never-committed epoch")
    // a compaction commits a new version at the SAME watermark; the
    // resolution must pick the newer (most-compacted) manifest
    val before = table.versionAtEpoch(4L).get
    assert(Maintenance.compact(spark, table).isDefined)
    val after = table.versionAtEpoch(4L).get
    assert(after > before && after == table.currentVersion)
    // vacuum reclaims old manifests → old epochs resolve to None
    Maintenance.vacuum(table, retainVersions = 1, graceMillis = 0L)
    assert(table.versionAtEpoch(1L).isEmpty)
    assert(table.versionAtEpoch(4L).contains(table.currentVersion))
  }
}
