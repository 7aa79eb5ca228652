package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Iceberg-style lake table implemented from scratch over Parquet + a
  * versioned JSON manifest log (SURVEY.md §4.3: no Iceberg jar exists in
  * this environment, so the needed subset is built in-house).
  *
  * Layout:
  * {{{
  *   <root>/_log/v00000001.json ...   // manifest per committed snapshot
  *   <root>/data/c<version>/bucket=N/part-*.parquet
  * }}}
  *
  * Commit protocol (exactly-once, the answer to the reference's open
  * idempotency item /root/reference/Delphi/ArchitecturePlan.md:74):
  *  1. write data files for the new snapshot (never mutated after);
  *  2. write manifest to a temp file;
  *  3. `Files.move(tmp, v<N+1>.json)` WITHOUT replace — an atomic
  *     compare-and-swap: a concurrent/replayed committer loses the race
  *     with FileAlreadyExistsException and must re-read the log.
  * A crash between (1) and (3) leaves orphan data files that no manifest
  * references — harmless, reclaimable by vacuum.
  *
  * The manifest records per-bucket file lists (partition pruning for
  * merge reads), the committed epoch/seq watermark (resume point), the
  * evolved schema, and per-epoch lineage metrics (north_star).
  */
final case class ManifestFile(path: String, bucket: Int, rows: Long, bytes: Long)

final case class Manifest(
    version: Long,
    epochWatermark: Long,     // last fully-committed epoch (-1 = empty)
    lastSeq: Long,            // max seq merged (-1 = empty)
    schemaJson: String,       // Spark StructType JSON (evolves on merge)
    numBuckets: Int,
    files: Seq[ManifestFile],
    lineage: Map[String, String] // per-commit metrics: eventsApplied, conflicts, bytesWritten, buckets
) {
  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
}

class LakeTable(val root: String, val numBuckets: Int) {
  private val mapper = new ObjectMapper()
  private def logDir: Path = Paths.get(root, "_log")
  private def dataDir: Path = Paths.get(root, "data")

  Files.createDirectories(logDir)
  Files.createDirectories(dataDir)

  // ---------------- manifest log ----------------

  private def versionPath(v: Long): Path = logDir.resolve(f"v$v%08d.json")

  def currentVersion: Long = {
    val vs = Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.substring(1, n.length - 5).toLong)
      .toSeq
    if (vs.isEmpty) 0L else vs.max
  }

  def currentManifest: Option[Manifest] = {
    val v = currentVersion
    if (v == 0) None else Some(readManifest(v))
  }

  def readManifest(v: Long): Manifest = {
    val node = mapper.readTree(Files.readAllBytes(versionPath(v)))
    Manifest(
      version = node.get("version").asLong(),
      epochWatermark = node.get("epochWatermark").asLong(),
      lastSeq = node.get("lastSeq").asLong(),
      schemaJson = node.get("schemaJson").asText(),
      numBuckets = node.get("numBuckets").asInt(),
      files = node.get("files").elements().asScala.map { f =>
        ManifestFile(f.get("path").asText(), f.get("bucket").asInt(),
          f.get("rows").asLong(), f.get("bytes").asLong())
      }.toSeq,
      lineage = node.get("lineage").properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap
    )
  }

  /** Atomic CAS commit of the next manifest version. Returns false if a
    * concurrent committer won (caller re-reads and decides). */
  def tryCommit(m: Manifest): Boolean = {
    val node = mapper.createObjectNode()
    node.put("version", m.version)
    node.put("epochWatermark", m.epochWatermark)
    node.put("lastSeq", m.lastSeq)
    node.put("schemaJson", m.schemaJson)
    node.put("numBuckets", m.numBuckets)
    val arr = node.putArray("files")
    m.files.foreach { f =>
      val fn = arr.addObject()
      fn.put("path", f.path); fn.put("bucket", f.bucket)
      fn.put("rows", f.rows); fn.put("bytes", f.bytes)
    }
    val lin = node.putObject("lineage")
    m.lineage.foreach { case (k, v) => lin.put(k, v) }

    val tmp = Files.createTempFile(logDir, ".tmp-manifest", ".json")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    // createLink is the CAS: atomic, fails if the version already exists.
    // (ATOMIC_MOVE is rename(2), which silently REPLACES an existing target
    // on POSIX — it is not a compare-and-swap.)
    try {
      Files.createLink(versionPath(m.version), tmp)
      Files.deleteIfExists(tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); false
    }
  }

  // ---------------- reads ----------------

  /** Read the current snapshot (empty frame with stored schema if no rows).
    * `buckets = Some(set)` prunes to the given buckets' files — the merge
    * path never reads untouched buckets. */
  def read(spark: SparkSession, buckets: Option[Set[Int]] = None): DataFrame =
    currentManifest match {
      case None => spark.emptyDataFrame
      case Some(m) =>
        val files = buckets match {
          case Some(bs) => m.files.filter(f => bs.contains(f.bucket))
          case None => m.files
        }
        if (files.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
        else
          spark.read.schema(m.schema).parquet(files.map(_.path): _*)
    }

  /** Live snapshot: current rows minus delete tombstones. Tombstones are
    * retained physically (column `__deleted`) so a re-delivered pre-delete
    * event can never resurrect a deleted key — the CDC tombstone rule; the
    * event-time watermark only gates their GC (SURVEY.md §2.9 C5). */
  def snapshot(spark: SparkSession): DataFrame = {
    val df = read(spark)
    if (df.columns.contains("__deleted"))
      df.filter(!org.apache.spark.sql.functions.col("__deleted")).drop("__deleted")
    else df
  }

  def lastCommittedEpoch: Long = currentManifest.map(_.epochWatermark).getOrElse(-1L)
  def lastSeq: Long = currentManifest.map(_.lastSeq).getOrElse(-1L)

  /** Directory for a new snapshot's data files. */
  def newCommitDir(version: Long): Path = dataDir.resolve(f"c$version%08d")

  /** List parquet files written under a commit dir, keyed by bucket=N.
    * Row counts come from the parquet footers (metadata-only read, no data
    * scan) so the manifest can answer per-bucket cardinality questions —
    * the merge path uses this instead of re-counting the target. */
  def listCommitFiles(dir: Path): Seq[ManifestFile] = {
    if (!Files.exists(dir)) return Seq.empty
    val conf = new org.apache.hadoop.conf.Configuration()
    val paths = Files.walk(dir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet")).toSeq
    // footer reads in parallel — serially this is ~0.5s per commit of 64
    // files, a driver-side fixed cost that eats into scaling efficiency
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = paths.map { p => Future {
      val bucket = p.getParent.getFileName.toString match {
        case s if s.startsWith("bucket=") => s.substring(7).toInt
        case _ => 0
      }
      ManifestFile(p.toString, bucket, footerRowCount(p, conf), Files.size(p))
    }}
    Await.result(Future.sequence(futures), Duration.Inf)
  }

  private def footerRowCount(p: Path,
      conf: org.apache.hadoop.conf.Configuration): Long =
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(p.toString), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try reader.getRecordCount finally reader.close()
    } catch { case _: Throwable => -1L }

  /** Rows currently stored in the given buckets, from manifest metadata
    * alone (no file scan). Returns None if any file lacks a footer count. */
  def bucketRows(buckets: Set[Int]): Option[Long] = currentManifest.map { m =>
    val fs = m.files.filter(f => buckets.contains(f.bucket))
    if (fs.exists(_.rows < 0)) -1L else fs.map(_.rows).sum
  }.filter(_ >= 0)
}
