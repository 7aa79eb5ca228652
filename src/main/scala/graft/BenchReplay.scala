package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession

import graft.engine.Replayer
import graft.lake.LakeTable

/** Single WAL-replay→merge measurement in a FRESH JVM (launched by
  * [[Bench]] once per (parallelism, repetition) — the sandbox analogue of
  * one `spark-submit` per cluster size). A shared JVM drifts between
  * back-to-back SparkContexts (codegen caches, metaspace, shuffle dirs):
  * two identical local[32] runs measured 20.3s vs 29.3s in one JVM, which
  * would poison the scaling-efficiency number.
  *
  * argv: cpus walDir epochs warmupWalDir
  * stdout: `REPLAY_SECONDS=<wall-seconds-of-timed-replay>`
  */
object BenchReplay {
  def main(args: Array[String]): Unit = {
    val Array(cpusS, walDir, epochsS, warmWal) = args
    val cpus = cpusS.toInt
    val epochs = epochsS.toLong
    // RAM-backed scratch (tmpfs) when available: on a real cluster the
    // aggregate disk bandwidth scales with executor count; a single local
    // virtio disk does not, and its page-cache state adds ±10× noise. The
    // scaling measurement isolates CPU-parallel behavior of the PLANS.
    val scratch = sys.env.getOrElse("GRAFT_TMPDIR",
      System.getProperty("java.io.tmpdir"))
    Files.createDirectories(java.nio.file.Paths.get(scratch))
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      // pinned level-independent, as on a real cluster where the setting
      // doesn't change with executor count — only core count varies
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.local.dir", scratch)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.lake.FastLocalFs.sparkConf.foreach { case (k, v) => b.config(k, v) }
    // experiment knob: GRAFT_SPARK_CONF="k=v;k2=v2" extra session confs
    sys.env.get("GRAFT_SPARK_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b.config(k.trim, v.trim)
      })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // JIT/codegen warm-up on a small WAL, then the timed replay
      val base = java.nio.file.Paths.get(scratch)
      val warmTable = new LakeTable(Files.createTempDirectory(base, "graft-warm-").toString, 64)
      Replayer.run(spark, spark.read.parquet(warmWal), warmTable, maxEpoch = 1)

      val events = spark.read.parquet(walDir)
      val table = new LakeTable(Files.createTempDirectory(base, "graft-replay-").toString, 64)
      val t0 = System.nanoTime()
      val report = Replayer.run(spark, events, table, maxEpoch = epochs - 1)
      val dt = (System.nanoTime() - t0) / 1e9
      require(report.epochs.forall(_.result.isDefined))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(table.root))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warmTable.root))
      println(f"REPLAY_SECONDS=$dt%.3f")
    } finally spark.stop()
  }
}
