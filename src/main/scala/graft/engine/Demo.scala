package graft.engine

import org.apache.spark.sql.SparkSession
import graft.gen.{ChangeGen, GenConfig}
import graft.lake.LakeTable
import graft.oracle.FoldOracle

/** End-to-end engine drive: generate a deterministic WAL, replay it in
  * epochs into a fresh lake table (killing and resuming halfway), verify
  * final-state sha256 equality against the fold oracle, and print lineage.
  *
  * Usage: runMain graft.engine.Demo [numEvents] [epochs] [tableDir]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val numEvents = args.lift(0).map(_.toLong).getOrElse(20000L)
    val epochs = args.lift(1).map(_.toLong).getOrElse(10L)
    val dir = args.lift(2).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)

    val b = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.lake.FastLocalFs.sparkConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = GenConfig(seed = 42L, numEvents = numEvents,
      numRepos = 100, pathsPerRepo = 400,
      epochSize = math.max(1L, numEvents / epochs),
      duplicateRate = 50) // 5% re-delivered events
    val maxEpoch = (numEvents - 1) / cfg.epochSize

    val table = new LakeTable(dir, 16)
    val events = ChangeGen.stream(spark, cfg).toDF()

    println(s"[demo] replaying ${numEvents} events in ${maxEpoch + 1} epochs → $dir")
    val half = maxEpoch / 2
    val r1 = Replayer.run(spark, events, table, maxEpoch, upToEpoch = Some(half))
    println(s"[demo] simulated shutdown after epoch $half " +
      s"(${r1.eventsApplied} keys merged); resuming from checkpoint...")
    val r2 = Replayer.run(spark, events, table, maxEpoch)
    println(s"[demo] resumed epochs: ${r2.epochs.map(_.epoch).mkString(",")}")

    val engineDigest = FoldOracle.digestOfTable(table.snapshot(spark))
    val oracleDigest = FoldOracle.digestOfState(
      FoldOracle.expectedState(cfg.copy(duplicateRate = 0)))
    println(s"[demo] engine state digest: $engineDigest")
    println(s"[demo] oracle state digest: $oracleDigest")
    println(s"[demo] sha256 equality: ${engineDigest == oracleDigest}")
    Replayer.lineage(table).toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(s"[lineage] $k: $v")
    }
    if (engineDigest != oracleDigest) sys.exit(1)
    spark.stop()
  }
}
