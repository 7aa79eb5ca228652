package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.{LakeTable, MergeUpsert}

/** Epoch-driven WAL replay loop (SURVEY.md §3.4): plan the next epoch from
  * the checkpointed commit log, run the merge, commit, repeat. Restart-safe:
  * the manifest's epochWatermark IS the checkpoint — `run` called on a
  * half-replayed table resumes exactly after the last committed epoch, and
  * duplicate calls (or duplicate epoch delivery) are no-ops.
  *
  * Micro-batch semantics mirror Structured Streaming's
  * `Trigger.AvailableNow` — drain all available epochs, then stop — without
  * requiring a long-running query, matching the reference's nightly-batch
  * cadence (daily 22:00, /root/reference/README.md:7) made exact.
  */
object Replayer {

  final case class EpochReport(epoch: Long, result: Option[MergeUpsert.MergeResult])
  final case class RunReport(epochs: Seq[EpochReport]) {
    def eventsApplied: Long = epochs.flatMap(_.result).map(_.eventsApplied).sum
    def rowsWritten: Long = epochs.flatMap(_.result).map(_.rowsWritten).sum
    def bytesWritten: Long = epochs.flatMap(_.result).map(_.bytesWritten).sum
  }

  /** Replay all epochs in [watermark+1, maxEpoch] from the change stream.
    * `events` must contain an `epoch` column; only the needed epoch range
    * is scanned per batch (partition-prunable when the stream is stored
    * partitioned by epoch). */
  def run(spark: SparkSession, events: DataFrame, table: LakeTable,
          maxEpoch: Long, upToEpoch: Option[Long] = None): RunReport = {
    val stop = upToEpoch.map(u => math.min(u, maxEpoch)).getOrElse(maxEpoch)
    val start = table.lastCommittedEpoch + 1
    val reports = (start to stop).map { e =>
      val batch = events.filter(col("epoch") === e)
      EpochReport(e, MergeUpsert.mergeEpoch(spark, table, batch, e))
    }
    RunReport(reports)
  }

  /** Per-partition lineage view from the commit log (north_star metrics). */
  def lineage(table: LakeTable): Map[String, String] =
    table.currentManifest.map(_.lineage).getOrElse(Map.empty)
}
