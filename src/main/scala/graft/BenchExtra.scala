package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Extra (non-contract) measurement harness for optimization work — guide
  * §1.4: per-query noop-sink isolation with repeats, plus
  * `.explain("formatted")` capture for the plan evidence committed under
  * `plans/r06/`. Does NOT touch the frozen Bench/Verify surfaces; numbers
  * from here are cited in OPTIMIZATION_r06.md, never in BENCH_LATEST.json.
  *
  * argv: queries sfDir cpus reps outDir query1[,query2,...]|all
  *     | genwal walDir events epochs cpus [warmWalDir]
  * stdout (queries): `EXTRA <name> first=<s> min=<s> runs=[..]` per query
  */
object BenchExtra {
  def main(args: Array[String]): Unit = args.head match {
    case "queries" => queriesMain(args.drop(1))
    case "genwal" => genWalMain(args.drop(1))
    case other => sys.error(s"unknown BenchExtra mode: $other")
  }

  /** Per-query job/stage/task accounting (GRAFT_STAGE_TIMING=1): fixed
    * scheduling overhead vs real task time is THE split that matters for
    * the many-tiny-jobs system probes. */
  private final class Counts extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val runMs = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(
        js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      { jobs.incrementAndGet(); () }
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(sc.stageInfo.numTasks)
      val m = sc.stageInfo.taskMetrics
      if (m != null) runMs.addAndGet(m.executorRunTime)
      ()
    }
    def snap: (Long, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, runMs.get)
  }

  /** Materialize a ladder-shaped WAL (same GenConfig shape as Bench's CDC
    * section) for spot replay measurements via graft.BenchReplay. */
  private def genWalMain(args: Array[String]): Unit = {
    val Array(walDir, eventsS, epochsS, cpusS) = args.take(4)
    val warmDir = args.lift(4)
    val events = eventsS.toLong
    val epochs = epochsS.toLong
    val cfg = graft.gen.GenConfig(seed = 42L, numEvents = events,
      numRepos = 500, pathsPerRepo = 2000,
      epochSize = math.max(1L, events / epochs),
      duplicateRate = 5, contentLen = 256)
    val spark = SparkSession.builder().master(s"local[${cpusS.toInt}]")
      .config("spark.sql.shuffle.partitions", cpusS.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.gen.ChangeGen.stream(spark, cfg).toDF()
      .repartition(cpusS.toInt * 2)
      .write.mode("overwrite").partitionBy("epoch").parquet(walDir)
    warmDir.foreach { wd =>
      val wCfg = cfg.copy(numEvents = math.max(10000L, events / 50),
        epochSize = math.max(1L, events / 50 / 2))
      graft.gen.ChangeGen.stream(spark, wCfg).toDF()
        .write.mode("overwrite").partitionBy("epoch").parquet(wd)
    }
    spark.stop()
  }

  private def queriesMain(args: Array[String]): Unit = {
    val Array(sfDir, cpusS, repsS, outDir, queryList) = args.take(5)
    val cpus = cpusS.toInt
    val reps = repsS.toInt
    Files.createDirectories(Paths.get(outDir))
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.lake.FastLocalFs.sparkConf.foreach { case (k, v) => b.config(k, v) }
    // experiment knob, mirrors BenchReplay: GRAFT_SPARK_CONF="k=v;k2=v2"
    sys.env.get("GRAFT_SPARK_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b.config(k.trim, v.trim)
      })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same global warmup as Bench (JIT/codegen/parquet-reader)
    try {
      SparkEntry.queries("q1_agg")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      SparkEntry.queries("j2_left_enrich")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    val counts = new Counts
    if (sys.env.get("GRAFT_STAGE_TIMING").contains("1"))
      spark.sparkContext.addSparkListener(counts)
    val names: Seq[String] =
      if (queryList == "all") SparkEntry.queries.keys.toSeq.sorted
      else queryList.split(",").map(_.trim).toSeq
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"extra:$name")
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val c0 = counts.snap
      val runs = (1 to math.max(1, reps)).map(_ => once())
      if (sys.env.get("GRAFT_STAGE_TIMING").contains("1")) {
        Thread.sleep(500) // listener bus drain, coarse
        val c1 = counts.snap
        System.err.println(f"[extra:$name] jobs=${c1._1 - c0._1} " +
          f"stages=${c1._2 - c0._2} tasks=${c1._3 - c0._3} " +
          f"taskRunSec=${(c1._4 - c0._4) / 1e3}%.1f (over $reps reps)")
      }
      // capture the physical plan AFTER timing (explain itself plans).
      // Two sections: the initial plan, then — when AQE rewrites it — the
      // final adaptive plan from executing THIS Dataset's QueryExecution
      // (runtime ReusedExchange / coalesced stages exist only there; the
      // noop-write timing above runs through a separate QueryExecution, so
      // its final plan is not reachable here).
      try {
        val df = fn(spark, sfDir)
        val qe = df.queryExecution
        val initial = qe.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val plan = try {
          qe.executedPlan.execute().count() // finalize AQE, rows stay remote
          val fin = qe.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          if (fin == initial) initial
          else initial +
            "\n\n== Final Adaptive Plan (captured after execution) ==\n\n" + fin
        } catch { case e: Throwable =>
          System.err.println(s"[extra] final-plan exec($name) failed: $e")
          initial
        }
        Files.writeString(Paths.get(outDir, s"$name.txt"), plan)
      } catch { case e: Throwable =>
        System.err.println(s"[extra] explain($name) failed: $e")
      }
      println(f"EXTRA $name%-28s first=${runs.head}%.3f min=${runs.min}%.3f " +
        runs.map(r => f"$r%.3f").mkString("runs=[", ",", "]"))
    }
    spark.stop()
  }
}
