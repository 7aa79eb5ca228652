package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicReference}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Pipeline
import graft.gen.{ChangeGen, GenConfig}
import graft.lake.{LakeTable, Maintenance, MergeUpsert}
import graft.oracle.{DomainOracle, FoldOracle}

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
        // Ingest think-time every ~20 epochs: a compaction attempt only
        // wins its CAS if no merge commits between its manifest read and
        // tryCommit, and the r6 merge path got fast enough that
        // back-to-back epochs starved the compactor of every slot
        // (compactions == 0 → the "race exercised" precondition below
        // failed). Real feeds have inter-batch gaps; these pauses keep
        // maintenance racing MID-ingest without weakening any assertion.
        if (e % 20 == 19) Thread.sleep(1200)
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

  test("TWO pipeline drivers race the same roots over overlapping epoch " +
      "ranges: per-(table,epoch) commits stay exactly-once, every table " +
      "equals its oracle (the double-scheduled nightly run)") {
    // The single-table CAS guarantees are individually tested; this
    // asserts their COMPOSITION across the multi-table pipeline: two
    // uncoordinated Pipeline.run drivers (the reference's double-scheduled
    // nightly job) replaying the same epochs against one source + five
    // domain tables. Every commit slot must be won by exactly one driver
    // (the loser's merge re-bases into a duplicate-epoch no-op), and a
    // loser recomputing a domain from a source snapshot NEWER than its
    // epoch must still converge: the last epoch touching a group always
    // recomputes it from source state that is final for that group.
    val cfg = GenConfig(seed = 37L, numEvents = 3000L, numRepos = 12,
      pathsPerRepo = 40, epochSize = 500L) // 6 epochs
    val source = new LakeTable(tmpDir("race-src"), 8)
    val domains = Pipeline.omopDomains(spark)
    val tables = Pipeline.openDomainTables(tmpDir("race-dom"), domains, 4)
    val events = ChangeGen.stream(spark, cfg).toDF()

    val gate = new java.util.concurrent.CyclicBarrier(2)
    val reports = new Array[Pipeline.PipelineReport](2)
    val failure = new AtomicReference[Throwable]()
    val drivers = Array.tabulate(2) { i =>
      new Thread(() => {
        try {
          gate.await()
          // driver 0 also compacts mid-run: merges on one driver race
          // compaction commits on the other, like the prod schedule
          reports(i) = Pipeline.run(spark, events, source, domains, tables,
            maxEpoch = 5, compactEvery = if (i == 0) 3 else 0)
        } catch { case t: Throwable => failure.compareAndSet(null, t) }
      }, s"graft-pipeline-driver-$i")
    }
    drivers.foreach(_.start()); drivers.foreach(_.join(600000))
    assert(failure.get() == null, s"a driver failed: ${failure.get()}")
    assert(reports.forall(_ != null) && reports.forall(_.updates.nonEmpty),
      "both drivers must enter the replay loop (the race must be real)")

    // exactly-once composition: each (table, epoch) slot committed by
    // EXACTLY one driver — the union covers every epoch, the overlap is
    // empty (the loser observed a duplicate-epoch no-op, never a double
    // apply, never a lost epoch)
    ("source" +: domains.map(_.name)).foreach { t =>
      val a = reports(0).applied(t); val b = reports(1).applied(t)
      assert((a ++ b).sorted == (0L to 5L),
        s"$t: epochs lost or doubled — driver0=$a driver1=$b")
      assert(a.toSet.intersect(b.toSet).isEmpty,
        s"$t: both drivers claim a commit — driver0=$a driver1=$b")
    }

    // final state: source byte-equal to the fold oracle, every domain
    // line-equal to its independent plain-Scala oracle
    val st = FoldOracle.expectedState(cfg)
    assert(FoldOracle.digestOfTable(source.snapshot(spark)) ==
      FoldOracle.digestOfState(st))
    def lines(df: DataFrame, cols: String*): Seq[String] =
      df.select(cols.map(col): _*).collect()
        .map(r => (0 until r.length).map(i =>
          Option(r.get(i)).map(_.toString).getOrElse("∅")).mkString("|"))
        .toSeq.sorted
    assert(lines(tables("person").snapshot(spark), "person_source_value",
      "n_paths", "n_langs", "langs", "first_path", "modified_seq")
      == DomainOracle.personLines(st), "person")
    assert(lines(tables("visit_occurrence").snapshot(spark), "repo", "path",
      "commit", "source_seq", "preceding_commit")
      == DomainOracle.visitLines(st), "visit_occurrence")
    assert(lines(tables("condition_occurrence").snapshot(spark), "repo",
      "condition_group", "start_seq", "end_seq", "updt_seq", "n_occurrences")
      == DomainOracle.conditionLines(st), "condition_occurrence")
    assert(lines(tables("drug_exposure").snapshot(spark), "repo", "path",
      "exposure_concept", "source_seq", "content_len")
      == DomainOracle.drugLines(st), "drug_exposure")
    assert(lines(tables("measurement").snapshot(spark), "repo", "path",
      "measurement_concept", "value_source_value", "repo_n_langs")
      == DomainOracle.measurementLines(st), "measurement")
  }

  test("TWO drivers race ALGEBRAIC domains: the pinned-post-version fold " +
      "converges to the oracle regardless of interleaving") {
    // The delta fold's exactness claim under concurrency: each commit
    // records the exact source manifest version it folded to (srcv_v<e>),
    // so a driver whose source ran AHEAD mid-update (the other driver
    // advancing it) folds to the pinned head — the recorded state is
    // self-describing and the LAST commit equals rollup(source head). A
    // group-key that is NOT a function of the merge key (code_value's
    // lang) and a distinct-count sub-grain (location) both race here.
    val cfg = GenConfig(seed = 91L, numEvents = 2400L, numRepos = 10,
      pathsPerRepo = 30, epochSize = 400L, pctInsert = 50, pctUpdate = 30,
      pctDelete = 20) // 6 epochs, delete-heavy enough to drive tombstones
    val source = new LakeTable(tmpDir("race-alg-src"), 8)
    val domains = Pipeline.omopDomainsDeep(spark)
      .filter(d => d.name == "code_value" || d.name == "location")
    val tables = Pipeline.openDomainTables(tmpDir("race-alg-dom"), domains, 4)
    val events = ChangeGen.stream(spark, cfg).toDF()

    val gate = new java.util.concurrent.CyclicBarrier(2)
    val reports = new Array[Pipeline.PipelineReport](2)
    val failure = new AtomicReference[Throwable]()
    val drivers = Array.tabulate(2) { i =>
      new Thread(() => {
        try {
          gate.await()
          reports(i) = Pipeline.run(spark, events, source, domains, tables,
            maxEpoch = 5, compactEvery = if (i == 0) 2 else 0)
        } catch { case t: Throwable => failure.compareAndSet(null, t) }
      }, s"graft-alg-driver-$i")
    }
    drivers.foreach(_.start()); drivers.foreach(_.join(600000))
    assert(failure.get() == null, s"a driver failed: ${failure.get()}")

    ("source" +: domains.map(_.name)).foreach { t =>
      val a = reports(0).applied(t); val b = reports(1).applied(t)
      assert((a ++ b).sorted == (0L to 5L),
        s"$t: epochs lost or doubled — driver0=$a driver1=$b")
      assert(a.toSet.intersect(b.toSet).isEmpty,
        s"$t: both drivers claim a commit — driver0=$a driver1=$b")
    }

    val st = FoldOracle.expectedState(cfg)
    def lines(df: DataFrame, cols: String*): Seq[String] =
      df.select(cols.map(col): _*).collect()
        .map(r => (0 until r.length).map(i =>
          Option(r.get(i)).map(_.toString).getOrElse("∅")).mkString("|"))
        .toSeq.sorted
    assert(lines(tables("code_value").snapshot(spark), "lang",
      "n_code_paths", "total_code_chars")
      == DomainOracle.codeValueLines(st), "code_value")
    val locDef = domains.find(_.name == "location").get
    assert(lines(Pipeline.readDomain(spark, locDef, tables("location")),
      "location_dir", "n_location_repos", "n_location_paths")
      == DomainOracle.locationLines(st), "location")
  }
}
