package graft.lake

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Table-maintenance operations for [[LakeTable]] — the hygiene a
  * copy-on-write lake needs at 10^10-event scale:
  *
  *  - '''vacuum''' — delete data files no manifest version ≥ a retention
  *    floor references. Covers both crash orphans (files written but never
  *    committed, SURVEY.md §4.3 hard-part 1) and files superseded by later
  *    copy-on-write commits. Old manifests below the floor are dropped too
  *    (bounded time travel).
  *  - '''compactTombstones''' — rewrite the table dropping delete
  *    tombstones whose seq ≤ a caller-supplied watermark. Tombstones must
  *    be RETAINED while a re-delivery of a pre-delete event is still
  *    possible (they are what keeps deleted keys dead, §2.9 C5); once the
  *    event-time watermark passes, they are dead weight — this is the
  *    "watermark only gates state GC" rule made concrete.
  *
  * Both commit through the same CAS manifest protocol as merges, so they
  * are safe to interleave with ingestion (a racing merge simply wins the
  * version slot and the maintenance pass retries/aborts).
  */
object Maintenance {

  final case class VacuumResult(filesDeleted: Int, bytesReclaimed: Long,
                                manifestsDropped: Int)

  /** Delete unreferenced data files and manifests older than
    * `retainVersions` (default: current only). */
  def vacuum(table: LakeTable, retainVersions: Int = 1): VacuumResult = {
    val head = table.currentVersion
    if (head == 0) return VacuumResult(0, 0L, 0)
    val floor = math.max(1L, head - retainVersions + 1)

    val referenced: Set[String] = (floor to head).flatMap { v =>
      table.readManifest(v).files.map(f =>
        Paths.get(f.path).toAbsolutePath.toString)
    }.toSet

    val dataDir = Paths.get(table.root, "data")
    var files = 0; var bytes = 0L
    if (Files.exists(dataDir)) {
      val all = Files.walk(dataDir).iterator().asScala
        .filter(p => Files.isRegularFile(p)).toSeq
      all.foreach { p =>
        if (!referenced.contains(p.toAbsolutePath.toString)) {
          bytes += Files.size(p); files += 1
          Files.deleteIfExists(p)
        }
      }
      // prune now-empty commit/bucket dirs
      Files.walk(dataDir).iterator().asScala.toSeq.reverse.foreach { p =>
        if (Files.isDirectory(p) && p != dataDir &&
            !Files.list(p).iterator().hasNext)
          Files.deleteIfExists(p)
      }
    }

    val logDir = Paths.get(table.root, "_log")
    var dropped = 0
    (1L until floor).foreach { v =>
      val mp = logDir.resolve(f"v$v%08d.json")
      if (Files.deleteIfExists(mp)) dropped += 1
    }
    VacuumResult(files, bytes, dropped)
  }

  /** Rewrite the table without tombstones whose `updated_seq <= watermark`
    * and with one file per bucket (small-file compaction). No-op (None) if
    * the table is empty or a concurrent committer wins the CAS. */
  def compactTombstones(spark: SparkSession, table: LakeTable,
                        watermark: Long): Option[Manifest] = {
    val current = table.currentManifest.getOrElse(return None)
    if (current.files.isEmpty) return None
    val version = current.version + 1

    val df = table.read(spark)
      .filter(!(col("__deleted") && col("updated_seq") <= watermark))
      .withColumn("__bucket", MergeUpsert.bucketOf(table.numBuckets))

    val commitDir = table.newCommitDir(version)
    df.repartition(table.numBuckets, col("repo"), col("path"))
      .withColumnRenamed("__bucket", "bucket")
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(commitDir.toString)

    val manifest = current.copy(
      version = version,
      files = table.listCommitFiles(commitDir),
      lineage = current.lineage +
        (s"compact_v$version" -> s"tombstoneWatermark=$watermark"))
    if (table.tryCommit(manifest)) Some(manifest) else None
  }
}
