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

    // multi-table pipeline drive: the same WAL feeds a fresh source plus
    // the sixteen OMOP-shaped domain tables (the reference's full step
    // list, incl. the 3-deep visit_detail → observation →
    // observation_final chain) in dependency order; verify the person
    // table against its plain-Scala fold oracle
    println("[demo] driving the multi-table pipeline (16 domain tables)...")
    val pSource = new LakeTable(
      java.nio.file.Files.createTempDirectory("graft-demo-psrc").toString, 16)
    val domains = Pipeline.omopDomainsDeep(spark)
    val tables = Pipeline.openDomainTables(
      java.nio.file.Files.createTempDirectory("graft-demo-dom").toString,
      domains, 8)
    val pr = Pipeline.run(spark, events, pSource, domains, tables, maxEpoch)
    domains.foreach { d =>
      val t = tables(d.name)
      println(s"[demo] ${d.name}: epoch ${t.lastCommittedEpoch}, " +
        s"${Pipeline.readDomain(spark, d, t).count()} rows")
    }
    val personLines = tables("person").snapshot(spark)
      .select("person_source_value", "n_paths", "n_langs", "langs",
        "first_path", "modified_seq")
      .collect().map(r => (0 until r.length).map(i =>
        Option(r.get(i)).map(_.toString).getOrElse("∅")).mkString("|"))
      .toSeq.sorted
    val personOracle = graft.oracle.DomainOracle.personLines(
      FoldOracle.expectedState(cfg.copy(duplicateRate = 0)))
    println(s"[demo] person table == fold oracle: ${personLines == personOracle}")
    if (personLines != personOracle) sys.exit(1)
    println(s"[demo] pipeline updates committed: ${pr.updates.count(_.result.isDefined)}")
    spark.stop()
  }
}
