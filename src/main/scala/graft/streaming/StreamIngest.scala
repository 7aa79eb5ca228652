package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.lake.{LakeTable, MergeUpsert}

/** Structured-Streaming WAL tail: the always-on variant of the batch
  * [[graft.engine.Replayer]] (which is the `Trigger.AvailableNow`-style
  * drain). Files land in the WAL directory; the file source tails them with
  * checkpointed offsets; each micro-batch MERGEs into the lake table via
  * `foreachBatch`.
  *
  * Exactly-once composition (north_rule):
  *  - the file source re-delivers the SAME files under the SAME batchId
  *    after a crash (at-least-once execution, deterministic batch content);
  *  - `mergeEpoch(epoch = batchId)` is idempotent per epoch — a re-executed
  *    batchId whose manifest already committed is a no-op;
  *  - within and across batches, latest-wins ordering is by the event's own
  *    `(seq, commit)`, NOT arrival order — so out-of-order file delivery
  *    converges to the same state (an older event merging after a newer one
  *    loses to the target row's higher seq; tombstones are retained so a
  *    late pre-delete event cannot resurrect a deleted key).
  *
  * This mirrors the reference's nightly `sqlcmd` lookback pull
  * (/root/reference/MQ/mosaiq_visit_occurrence.sql:89-98) re-expressed as a
  * real change stream: overlap/duplicates tolerated not by key-dedupe hope
  * but by an exactly-once commit protocol.
  */
object StreamIngest {

  /** Start a streaming merge of `walDir` into `table`.
    *
    * @param trigger `Trigger.AvailableNow()` to drain-and-stop (batch
    *                cadence, the reference's daily 22:00 run made exact) or
    *                a processing-time trigger for continuous tailing.
    * @param maxFilesPerTrigger bound per-batch file count (bounds state and
    *                           memory at 10^10-event scale).
    */
  def start(spark: SparkSession, walDir: String, schema: StructType,
            table: LakeTable, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val src = maxFilesPerTrigger
      .map(n => reader.option("maxFilesPerTrigger", n)).getOrElse(reader)
      .parquet(walDir)
    src.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // epoch := batchId — Structured Streaming's replay contract makes
        // this the idempotency key; the event's own epoch column is payload.
        // An uncommitted merge MUST fail the batch: if the streaming
        // checkpoint advanced past an unmerged epoch, those events would be
        // silently lost forever (mergeEpoch retries lost CAS races
        // internally, so a non-committed result here is a real fault).
        val r = MergeUpsert.mergeEpoch(batch.sparkSession, table, batch, batchId)
        r.foreach(res =>
          if (!res.committed)
            throw new IllegalStateException(
              s"batch $batchId merged but failed to commit — failing the " +
                "batch so Structured Streaming re-executes it"))
        ()
      }
      .start()
  }

  /** The streaming form of the MULTI-TABLE pipeline: each micro-batch
    * merges the source table AND updates every domain table in dependency
    * order ([[graft.engine.Pipeline.applyEpochBatch]]), epoch = batchId.
    * Exactly-once composes per TABLE: a crash between domain commits
    * re-executes the whole batchId, and each table's lineage registry
    * skips its already-committed (table, epoch) pairs — the same
    * mid-pipeline resume the batch Replayer gets from the min-watermark
    * restart, here provided by Structured Streaming's deterministic
    * re-delivery. `compactEvery` folds hot buckets of ALL tables every k
    * batches (incremental, O(hot buckets)). */
  def startPipeline(spark: SparkSession, walDir: String, schema: StructType,
                    source: LakeTable,
                    domains: Seq[graft.engine.Pipeline.DomainDef],
                    tables: Map[String, LakeTable], checkpointDir: String,
                    trigger: Trigger = Trigger.AvailableNow(),
                    maxFilesPerTrigger: Option[Int] = None,
                    compactEvery: Int = 0): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val src = maxFilesPerTrigger
      .map(n => reader.option("maxFilesPerTrigger", n)).getOrElse(reader)
      .parquet(walDir)
    src.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ups = graft.engine.Pipeline.applyEpochBatch(
          batch.sparkSession, batch, source, domains, tables, batchId)
        ups.foreach(u => u.result.foreach(res =>
          if (!res.committed) throw new IllegalStateException(
            s"batch $batchId table ${u.table} merged but failed to " +
              "commit — failing the batch for re-execution")))
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1) {
          val all = source +: domains.map(d => tables(d.name))
          all.foreach(t => graft.lake.Maintenance.compactHotBuckets(
            batch.sparkSession, t, minDeltaFiles = compactEvery))
        }
        ()
      }
      .start()
  }
}
