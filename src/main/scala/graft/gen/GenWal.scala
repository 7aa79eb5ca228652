package graft.gen

import org.apache.spark.sql.SparkSession

/** Materialize a deterministic WAL to parquet (partitioned by epoch) —
  * standalone generator used by bench tooling and ad-hoc profiling.
  *
  * argv: outDir numEvents epochs [cpus]
  */
object GenWal {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val numEvents = args(1).toLong
    val epochs = args(2).toLong
    val cpus = args.lift(3).map(_.toInt).getOrElse(8)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.lake.FastLocalFs.sparkConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = GenConfig(seed = 42L, numEvents = numEvents,
      numRepos = 500, pathsPerRepo = 2000,
      epochSize = math.max(1L, numEvents / epochs),
      duplicateRate = 5, contentLen = 256)
    ChangeGen.stream(spark, cfg).toDF()
      .repartition(cpus * 2)
      .write.mode("overwrite").partitionBy("epoch").parquet(out)
    spark.stop()
  }
}
