package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.gen.{ChangeGen, GenConfig}
import graft.lake.{LakeTable, Maintenance, MergeUpsert}

/** Endurance measurement for the 10^10-event claim: many more epochs at a
  * much larger event count than the scaling ladder, with INCREMENTAL
  * maintenance active, proving per-epoch cost stays flat as the table
  * grows — i.e. write amplification is O(batch), never O(table × epochs).
  *
  * Runs in a fresh pinned-heap child JVM (same methodology as
  * [[BenchReplay]]). The WAL is generated and consumed in CHUNKS of a few
  * epochs: generation/write is NOT part of the timed window (a real
  * deployment tails an existing changelog), each chunk's files are
  * deleted after replay, and tmpfs never holds more than one chunk — the
  * same reason a 10^10-event tail never materializes its history.
  *
  * argv: cpus totalEvents epochs chunkEpochs compactEvery [walDir]
  * (walDir: a pre-materialized epoch-partitioned WAL — the launcher
  * generates it at full host parallelism since generation is untimed;
  * omitted/"-" = generate chunks in-process at `cpus`)
  * stdout: per-epoch CSV lines (epoch, merge wall, maintenance wall,
  * bytes, delta files) then one `ENDURANCE_JSON={...}` summary line.
  */
object BenchEndurance {

  /** The endurance stream shape — same key space / skew / duplicate rate
    * as the ladder. Shared with the launcher so a pre-materialized WAL
    * matches what the in-process fallback would generate. */
  def config(totalEvents: Long, epochs: Int): GenConfig =
    GenConfig(seed = 42L, numEvents = totalEvents,
      numRepos = 500, pathsPerRepo = 2000,
      epochSize = math.max(1L, totalEvents / epochs),
      duplicateRate = 5, contentLen = 256)

  def main(args: Array[String]): Unit = {
    val Array(cpusS, eventsS, epochsS, chunkS, compactS) = args.take(5)
    val preWal: Option[String] = args.lift(5).filter(_ != "-")
    val cpus = cpusS.toInt
    val totalEvents = eventsS.toLong
    val epochs = epochsS.toInt
    val chunkEpochs = chunkS.toInt
    val compactEvery = compactS.toInt
    val scratch = sys.env.getOrElse("GRAFT_TMPDIR",
      System.getProperty("java.io.tmpdir"))
    Files.createDirectories(Paths.get(scratch))

    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (4 * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.local.dir", scratch)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.lake.FastLocalFs.sparkConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try {
      val cfg = config(totalEvents, epochs)
      val base = Paths.get(scratch)
      val table = new LakeTable(
        Files.createTempDirectory(base, "graft-endur-").toString, 64)

      // JIT/codegen warm-up outside the timed epochs
      locally {
        val warmCfg = cfg.copy(numEvents = 2000000L, epochSize = 1000000L)
        val warm = new LakeTable(
          Files.createTempDirectory(base, "graft-endur-warm-").toString, 64)
        graft.engine.Replayer.run(spark, ChangeGen.stream(spark, warmCfg).toDF(),
          warm, maxEpoch = 1, compactEvery = 2)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warm.root))
      }

      final case class EpochStat(epoch: Int, mergeSec: Double,
        maintSec: Double, bytes: Long, deltaFiles: Int)
      val stats = Vector.newBuilder[EpochStat]
      var sinceCompact = 0
      var maintTotal = 0.0
      var folds = 0
      // vacuum live in the loop: the lineage cap bounds manifest CONTENT;
      // this proves the FILE story — manifest count and on-disk bytes stay
      // bounded over long lifetimes because every fold's superseded files
      // and every pre-floor manifest are reclaimed as the run proceeds.
      // graceMillis=0 is sound here (single sequential writer — no
      // in-flight commit can exist); production keeps the default grace.
      var vacuumSec = 0.0
      var vacuumRuns = 0
      var vacuumFiles = 0
      var vacuumBytes = 0L
      var vacuumManifestsDropped = 0
      val manifestsRetained = Vector.newBuilder[Int]
      def logCount(): Int = {
        val d = Paths.get(table.root, "_log")
        if (!Files.exists(d)) 0
        else scala.util.Using.resource(Files.list(d))(_.count().toInt)
      }

      (0 until epochs by chunkEpochs).foreach { chunkStart =>
        val chunkEnd = math.min(epochs, chunkStart + chunkEpochs)
        // this chunk's WAL slice: pre-materialized by the launcher, or
        // generated here (untimed either way — the tail exists)
        val walDir = preWal.getOrElse {
          val lo = chunkStart.toLong * cfg.epochSize
          val hi = math.min(totalEvents, chunkEnd.toLong * cfg.epochSize)
          val d = Files.createTempDirectory(base, "graft-endur-wal-").toString
          import spark.implicits._
          // no repartition: range's native partitions are already balanced
          // and a shuffle of the full chunk would double the (untimed but
          // wall-clock-real) generation cost
          spark.range(lo, hi).map(i => ChangeGen.eventAt(cfg, i)).toDF()
            .write.mode("overwrite").partitionBy("epoch").parquet(d)
          d
        }
        // epoch-partition pruning keeps per-epoch scans exact either way
        val chunk = spark.read.parquet(walDir)

        (chunkStart until chunkEnd).foreach { e =>
          val t0 = System.nanoTime()
          val r = MergeUpsert.mergeEpoch(spark, table,
            chunk.filter(col("epoch") === e), e.toLong)
          val tMerge = (System.nanoTime() - t0) / 1e9
          require(r.exists(_.committed), s"epoch $e failed to commit")
          sinceCompact += 1
          var tMaint = 0.0
          if (compactEvery > 0 && sinceCompact >= compactEvery) {
            val m0 = System.nanoTime()
            if (Maintenance.compactHotBuckets(spark, table,
              minDeltaFiles = compactEvery).isDefined) folds += 1
            tMaint = (System.nanoTime() - m0) / 1e9
            sinceCompact = 0
            val v0 = System.nanoTime()
            val vr = Maintenance.vacuum(table, retainVersions = 2,
              graceMillis = 0L)
            vacuumSec += (System.nanoTime() - v0) / 1e9
            vacuumRuns += 1
            vacuumFiles += vr.filesDeleted
            vacuumBytes += vr.bytesReclaimed
            vacuumManifestsDropped += vr.manifestsDropped
            manifestsRetained += logCount()
          }
          maintTotal += tMaint
          val deltas = table.currentManifest.map(_.deltaFiles.size).getOrElse(0)
          stats += EpochStat(e, tMerge, tMaint, r.get.bytesWritten, deltas)
          System.err.println(f"[endurance] epoch $e%3d merge=$tMerge%6.2fs " +
            f"maint=$tMaint%6.2fs bytes=${r.get.bytesWritten}%12d " +
            f"deltaFiles=$deltas%4d")
        }
        if (preWal.isEmpty) // a launcher-provided WAL is the launcher's
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(walDir))
      }

      // final fold: end state must be a queryable pure base tier
      val f0 = System.nanoTime()
      Maintenance.compact(spark, table)
      val finalCompactSec = (System.nanoTime() - f0) / 1e9
      require(table.currentManifest.exists(_.deltaFiles.isEmpty))
      val tableBytes = table.currentManifest.get.files.map(_.bytes).sum
      locally { // terminal vacuum: disk ends bounded, not just manifest log
        val v0 = System.nanoTime()
        val vr = Maintenance.vacuum(table, retainVersions = 2, graceMillis = 0L)
        vacuumSec += (System.nanoTime() - v0) / 1e9
        vacuumRuns += 1
        vacuumFiles += vr.filesDeleted
        vacuumBytes += vr.bytesReclaimed
        vacuumManifestsDropped += vr.manifestsDropped
        manifestsRetained += logCount()
      }

      val all = stats.result()
      val mergeTotal = all.map(_.mergeSec).sum
      val timedTotal = mergeTotal + maintTotal + finalCompactSec + vacuumSec
      val delivered = totalEvents + totalEvents * cfg.duplicateRate / 1000
      def meanOf(xs: Seq[Double]) = xs.sum / math.max(1, xs.size)
      val q = math.max(1, epochs / 4)
      val firstQ = meanOf(all.take(q).map(_.mergeSec))
      val lastQ = meanOf(all.takeRight(q).map(_.mergeSec))
      // robust per-epoch throughput: the host's delivered performance
      // swings up to 4x across multi-minute windows (see BENCH.md), and a
      // single long run cannot alternate-ladder around that — the MEDIAN
      // epoch is the honest central estimate of sustained capability
      val medianMerge = { val s = all.map(_.mergeSec).sorted; s(s.size / 2) }
      val bytesPerEventFirst =
        all.take(q).map(_.bytes).sum.toDouble / (q.toLong * cfg.epochSize)
      val bytesPerEventLast =
        all.takeRight(q).map(_.bytes).sum.toDouble / (q.toLong * cfg.epochSize)
      val epochCsv = all.map(s => f"${s.mergeSec}%.2f").mkString("[", ",", "]")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(table.root))

      println(
        f"""ENDURANCE_JSON={"events":$delivered,"epochs":$epochs,"cpus":$cpus,""" +
        f""""merge_sec":$mergeTotal%.1f,"maintenance_sec":$maintTotal%.1f,""" +
        f""""final_compact_sec":$finalCompactSec%.1f,"total_sec":$timedTotal%.1f,""" +
        f""""events_per_sec":${delivered / timedTotal}%.0f,""" +
        f""""events_per_sec_median_epoch":${cfg.epochSize / medianMerge}%.0f,""" +
        f""""incremental_folds":$folds,""" +
        f""""epoch_merge_sec_first_quartile_mean":$firstQ%.2f,""" +
        f""""epoch_merge_sec_last_quartile_mean":$lastQ%.2f,""" +
        f""""flatness_last_over_first":${lastQ / firstQ}%.3f,""" +
        f""""bytes_per_event_first_quartile":$bytesPerEventFirst%.1f,""" +
        f""""bytes_per_event_last_quartile":$bytesPerEventLast%.1f,""" +
        f""""max_delta_files":${all.map(_.deltaFiles).max},""" +
        f""""final_table_bytes":$tableBytes,""" +
        f""""vacuum":{"runs":$vacuumRuns,"sec":$vacuumSec%.1f,""" +
        f""""files_deleted":$vacuumFiles,"bytes_reclaimed":$vacuumBytes,""" +
        f""""manifests_dropped":$vacuumManifestsDropped,""" +
        f""""manifests_retained_after_each":${
          manifestsRetained.result().mkString("[", ",", "]")}},""" +
        f""""epoch_merge_sec":$epochCsv}""")
    } finally spark.stop()
  }
}
