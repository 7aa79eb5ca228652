package graft

import org.apache.spark.sql.functions._
import graft.gen.{ChangeGen, GenConfig}
import graft.lake.LakeTable
import graft.engine.Replayer
import graft.oracle.FoldOracle

/** `Replayer.backfill` — the reference's `$(isInc)='N'` full-refresh branch
  * (/root/reference/MQ/mosaiq_visit_occurrence.sql:89-98) and the S8
  * TRUNCATE-reload shape, expressed through the same merge path as
  * incremental replay. The §2 claim this pins: backfill and incremental
  * replay produce digest-identical final states, including when backfill
  * runs over a table that already held (divergent) prior state.
  */
class BackfillSpec extends SparkSpec {

  private val cfg = GenConfig(seed = 11L, numEvents = 4000L, numRepos = 15,
    pathsPerRepo = 50, epochSize = 500L)

  private def oracleDigest(c: GenConfig): String =
    FoldOracle.digestOfState(FoldOracle.expectedState(c))

  test("backfill of a fresh root equals incremental replay (sha256 digest)") {
    val events = ChangeGen.stream(spark, cfg).toDF()
    val inc = new LakeTable(tmpDir("bf-inc"), 8)
    Replayer.run(spark, events, inc, maxEpoch = 7)
    val root = tmpDir("bf-full")
    val (full, report) = Replayer.backfill(spark, events, root,
      numBuckets = 8, maxEpoch = 7)
    assert(report.epochs.size == 8)
    val d = FoldOracle.digestOfTable(full.snapshot(spark))
    assert(d == FoldOracle.digestOfTable(inc.snapshot(spark)))
    assert(d == oracleDigest(cfg))
  }

  test("backfill over a table with divergent prior state truncates it first") {
    val root = tmpDir("bf-prior")
    // prior state from a DIFFERENT stream (other seed → other contents)
    val prior = ChangeGen.stream(spark, cfg.copy(seed = 99L)).toDF()
    Replayer.run(spark, prior, new LakeTable(root, 8), maxEpoch = 7)
    // full refresh: replays the real stream from epoch 0 on a clean slate
    val events = ChangeGen.stream(spark, cfg).toDF()
    val (table, report) = Replayer.backfill(spark, events, root,
      numBuckets = 8, maxEpoch = 7, compactEvery = 4)
    assert(report.epochs.forall(_.result.isDefined),
      "every epoch must commit on the truncated table (watermark reset)")
    assert(FoldOracle.digestOfTable(table.snapshot(spark)) == oracleDigest(cfg))
    assert(table.currentManifest.get.deltaFiles.isEmpty,
      "compactEvery run ends as a pure base tier")
  }

  test("backfill refuses to truncate a directory that is not a lake table") {
    val dir = tmpDir("bf-guard")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "precious.txt"), "do not delete")
    val events = ChangeGen.stream(spark, cfg).toDF()
    val ex = intercept[IllegalArgumentException] {
      Replayer.backfill(spark, events, dir, numBuckets = 8, maxEpoch = 7)
    }
    assert(ex.getMessage.contains("refusing to truncate"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "precious.txt")))
  }
}
