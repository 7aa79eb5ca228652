package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicReference}
import org.apache.spark.sql.functions._
import graft.gen.{ChangeGen, GenConfig}
import graft.lake.{LakeTable, Maintenance, MergeUpsert}
import graft.oracle.FoldOracle

/** Composition stress for the commit protocol: the individually-tested
  * guarantees (unique staging dirs, CAS re-base on loss, vacuum grace
  * window, exactly-once lineage registry) must hold when they all race at
  * once. A sequential merger drives ~100 epochs while a compactor thread
  * folds hot buckets and a vacuum thread reclaims with the default grace —
  * continuously, with no coordination beyond the manifest CAS. Afterwards
  * the table must hold exactly the fold-oracle state with every epoch in
  * the lineage registry.
  */
class ConcurrencySpec extends SparkSpec {

  test("mergeEpoch races compactHotBuckets and vacuum for ~100 epochs " +
      "without losing an epoch (digest vs fold oracle)") {
    val cfg = GenConfig(seed = 33L, numEvents = 6000L, numRepos = 25,
      pathsPerRepo = 50, epochSize = 60L) // 100 epochs
    val epochs = (cfg.numEvents / cfg.epochSize).toInt
    val table = new LakeTable(tmpDir("conc"), 8)
    // local event materialization: eventAt is pure, so per-epoch batches
    // are cheap parallelized Seqs instead of re-scanning a generated stream
    val all = (0L until cfg.numEvents).map(ChangeGen.eventAt(cfg, _))
    import spark.implicits._

    val done = new AtomicBoolean(false)
    val failure = new AtomicReference[Throwable]()
    val compactions = new AtomicInteger(0)
    val vacuums = new AtomicInteger(0)

    val compactor = new Thread(() => {
      try {
        while (!done.get()) {
          if (Maintenance.compactHotBuckets(spark, table,
            minDeltaFiles = 3).isDefined) compactions.incrementAndGet()
          Thread.sleep(5)
        }
      } catch { case t: Throwable => failure.compareAndSet(null, t) }
    }, "graft-compactor")
    val vacuumer = new Thread(() => {
      try {
        while (!done.get()) {
          // default grace: in-flight staging files are never reclaimable,
          // which is what makes vacuum safe to run DURING ingestion
          Maintenance.vacuum(table, retainVersions = 2)
          vacuums.incrementAndGet()
          Thread.sleep(7)
        }
      } catch { case t: Throwable => failure.compareAndSet(null, t) }
    }, "graft-vacuumer")
    compactor.start(); vacuumer.start()

    try {
      (0 until epochs).foreach { e =>
        val batch = all.slice(e * cfg.epochSize.toInt,
          (e + 1) * cfg.epochSize.toInt)
        val r = MergeUpsert.mergeEpoch(spark, table, batch.toDF(), e.toLong)
        assert(r.isDefined && r.get.committed, s"epoch $e must commit")
        assert(failure.get() == null,
          s"background thread failed: ${failure.get()}")
      }
    } finally {
      done.set(true); compactor.join(30000); vacuumer.join(30000)
    }
    assert(failure.get() == null, s"background thread failed: ${failure.get()}")
    assert(compactions.get() > 0, "the race must actually exercise compaction")
    assert(vacuums.get() > 0)

    // every epoch present in the lineage registry — none lost to a race
    val lin = table.currentManifest.get.lineage
    val missing = (0 until epochs).filterNot(e => lin.contains(s"epoch_$e"))
    assert(missing.isEmpty, s"epochs lost: $missing")

    // final state byte-equal to the independent fold oracle
    val oracle = FoldOracle.digestOfState(FoldOracle.expectedState(cfg))
    assert(FoldOracle.digestOfTable(table.snapshot(spark)) == oracle)

    // post-drain maintenance still converges: full fold, then an
    // aggressive vacuum (grace 0 is safe once ingestion stopped) that
    // reclaims every CAS loser's orphaned staging dir — digest unchanged
    assert(Maintenance.compact(spark, table).isDefined ||
      table.currentManifest.get.deltaFiles.isEmpty)
    val vr = Maintenance.vacuum(table, retainVersions = 1, graceMillis = 0L)
    assert(vr.filesDeleted >= 0)
    assert(FoldOracle.digestOfTable(table.snapshot(spark)) == oracle)
  }
}
