package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE of one change-event batch into a [[LakeTable]].
  *
  * Semantics (the engine's core contract, north_rule):
  *  - latest-wins per business key `(repo, path)` ordered by `(seq, commit)`
  *    — the reference's W1 ROW_NUMBER dedupe
  *    (/root/reference/Delphi/MSSQL_Vertica_Translations/
  *     Omop_Incremental_Condition_Ocurrence.sql:71-78) made total-ordered;
  *  - `op = D` deletes the key; I/U upsert (MERGE fixes the reference's
  *    acknowledged duplicate-INSERT gap, ArchitecturePlan.md:74);
  *  - idempotent: re-delivering any subset of already-applied events
  *    cannot change the final state (same (seq,commit) ⇒ same winner);
  *  - schema evolution: batch columns not in the target (and vice versa)
  *    union by name, missing values NULL; the evolved schema is committed
  *    in the manifest.
  *
  * Scale design:
  *  - within-batch compaction is `groupBy(key).agg(max_by(...))` — a
  *    hash aggregate with map-side partial combine, so a hot `(repo,path)`
  *    key collapses to one row per map task *before* the shuffle: this IS
  *    the salting strategy for the skewed upsert (SURVEY.md §4.3.3),
  *    expressed so AQE needs no rescue;
  *  - only buckets touched by the batch are read and rewritten
  *    (manifest-driven partition pruning);
  *  - metrics ride on `observe()` — no extra pass over the data.
  */
object MergeUpsert {

  val KeyCols: Seq[String] = Seq("repo", "path")
  val OrderCols: Seq[String] = Seq("seq", "commit")

  /** Bucket function = Spark's own HashPartitioning id expression
    * (`pmod(murmur3(repo,path), n)`). This is deliberate: after a
    * `repartition(n, repo, path)`, every row already sits in the partition
    * whose id equals its bucket — so the merge output can be written
    * `partitionBy("bucket")` with NO further shuffle (each task holds
    * exactly one bucket). */
  def bucketOf(numBuckets: Int): Column =
    pmod(hash(col("repo"), col("path")), lit(numBuckets)).cast("int")

  /** Collapse a frame to the winning row per key by (seq, commit) desc.
    * Map-side-combining HASH aggregate — skew-proof by construction.
    * Uses the custom [[graft.functions.LatestBy]] ObjectHashAggregate:
    * the builtin `max_by(struct, struct)` carries a struct buffer that
    * HashAggregateExec can't hold, silently degrading to SortAggregate
    * (per-partition n·log n sort of every merge batch — asserted against
    * in PlanSpec). */
  def latestPerKey(df: DataFrame): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    val ord = struct(col("seq"), col("commit"))
    df.groupBy(KeyCols.map(col): _*)
      .agg(graft.functions.LatestBy(payload, ord).as("__w"))
      .select(col("__w.*"))
  }

  final case class MergeResult(
      committed: Boolean,
      version: Long,
      eventsApplied: Long,
      keysInBatch: Long,
      conflicts: Long,     // keys that already existed in the target
      deletes: Long,
      rowsWritten: Long,
      bytesWritten: Long,
      bucketsRewritten: Int)

  private val timing = sys.env.get("GRAFT_MERGE_TIMING").contains("1")
  private def timed[T](label: String, epoch: Long)(f: => T): T = {
    if (!timing) f else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[merge e$epoch] $label%-10s ${(System.nanoTime()-t0)/1e9}%7.2fs")
      r
    }
  }

  /** Merge one epoch batch. Caller guarantees `batch` holds exactly the
    * events of `epoch` (plus possible re-deliveries of older events, which
    * latest-wins neutralizes). Returns None if the epoch is already
    * committed (exactly-once skip). */
  def mergeEpoch(spark: SparkSession, table: LakeTable, batch: DataFrame,
                 epoch: Long): Option[MergeResult] = {
    val current = table.currentManifest
    val watermark = current.map(_.epochWatermark).getOrElse(-1L)
    if (epoch <= watermark) return None // duplicate epoch delivery → no-op

    val nb = table.numBuckets
    val version = current.map(_.version).getOrElse(0L) + 1

    // 1. enrich + within-batch compaction (one row per key ships onward)
    val enriched = batch
      .withColumn("content_sha", sha2(coalesce(col("content"), lit("")), 256))
      .withColumn("__bucket", bucketOf(nb))
    val compacted = latestPerKey(enriched)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    try {
      // 2. batch stats in ONE job (touched buckets + keys + deletes):
      // per-epoch driver round-trips are the serial fraction that caps
      // scaling efficiency, so the merge path runs exactly two jobs —
      // this stats aggregate and the write.
      val stats = timed("stats", epoch) { compacted.groupBy("__bucket")
        .agg(count(lit(1)).as("n"),
          sum(when(col("op") === "D", 1L).otherwise(0L)).as("d"))
        .collect() }
      val affected = stats.map(_.getInt(0)).toSet
      val keysInBatch = stats.map(_.getLong(1)).sum
      val deletes = stats.map(_.getLong(2)).sum
      if (affected.isEmpty) {
        // delete-only epochs of nothing / empty batch: still advance watermark
        val m = current.map(m0 => m0.copy(version = version,
          epochWatermark = epoch,
          lineage = m0.lineage + (s"epoch_$epoch" -> "empty"))).getOrElse(
          Manifest(version, epoch, -1L,
            new org.apache.spark.sql.types.StructType().json, nb, Seq.empty,
            Map(s"epoch_$epoch" -> "empty")))
        table.tryCommit(m)
        return Some(MergeResult(committed = true, version, 0, 0, 0, 0, 0, 0, 0))
      }

      // 3. current state of touched buckets as pseudo-events. Tombstones
      // (op=D) are materialized rows with __deleted=true: physically
      // keeping them is what makes re-delivery of a pre-delete event
      // harmless — latest-wins sees the tombstone's higher seq and the
      // deleted key stays dead.
      val target = table.read(spark, Some(affected))
      val targetAsEvents =
        if (target.columns.isEmpty || current.isEmpty) None
        else Some(target
          .withColumn("seq", col("updated_seq"))
          .withColumn("op", when(col("__deleted"), lit("D")).otherwise(lit("U")))
          .drop("updated_seq", "__deleted"))

      val batchAsState = compacted.withColumn("updated_seq", col("seq"))
      val unioned = targetAsEvents match {
        case Some(t) => t.withColumn("updated_seq", col("seq"))
          .unionByName(batchAsState, allowMissingColumns = true)
        case None => batchAsState
      }

      // 4. merge-apply: latest wins across target ∪ batch; deletes become
      // tombstone rows rather than vanishing. The explicit
      // repartition(nb, repo, path) IS the agg's required distribution, so
      // the aggregate runs in-place and — because bucketOf is the same
      // murmur3%nb — the output is already physically bucket-aligned for
      // the write (no second shuffle). Map-side partial agg would buy
      // nothing here: the union holds ≤2 rows per key (compacted batch ∪
      // current target), so complete-agg-after-shuffle is optimal.
      val mergedAll = latestPerKey(
        unioned.repartition(nb, col("repo"), col("path")))
      val merged = mergedAll
        .withColumn("__deleted", col("op") === "D")
        .drop("op", "seq", "epoch", "schemaVersion")
        .withColumn("__bucket", bucketOf(nb)) // recompute (evolution-safe)

      // 5. single write pass with observed metrics (Observation API: the
      // listener fires for whichever action executes the plan — here the
      // parquet write — so no extra pass over the data)
      val obs = org.apache.spark.sql.Observation()
      val observed = merged.observe(obs,
        count(lit(1)).as("rows"),
        max(col("updated_seq")).as("maxSeq"))
      val commitDir = table.newCommitDir(version)
      timed("write", epoch) { observed
        .withColumnRenamed("__bucket", "bucket")
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(commitDir.toString) }

      val metricsRow = obs.get
      val rowsWritten = metricsRow("rows").asInstanceOf[Long]
      val maxSeq = Option(metricsRow("maxSeq")).map(_.asInstanceOf[Long])
        .getOrElse(-1L)

      // existing cardinality from manifest footer counts — no target rescan
      val targetKeys = targetAsEvents.map(_ =>
        table.bucketRows(affected).getOrElse(target.count())).getOrElse(0L)
      // tombstones persist, so |merged| = |existing ∪ batch| exactly:
      // |existing ∩ batch| = |existing| + |batch keys| - |merged|
      val conflicts = math.max(0L, targetKeys + keysInBatch - rowsWritten)

      val newFiles = timed("footers", epoch) { table.listCommitFiles(commitDir) }
      val keptFiles = current.map(_.files.filterNot(f => affected.contains(f.bucket)))
        .getOrElse(Seq.empty)
      val bytesWritten = newFiles.map(_.bytes).sum

      val schemaJson = {
        val s = org.apache.spark.sql.types.StructType(
          merged.drop("__bucket").schema.fields)
        s.json
      }
      val lineage = current.map(_.lineage).getOrElse(Map.empty) +
        (s"epoch_$epoch" -> (s"events=$keysInBatch conflicts=$conflicts " +
          s"deletes=$deletes rows=$rowsWritten bytes=$bytesWritten " +
          s"buckets=${affected.size}"))

      val manifest = Manifest(
        version = version,
        epochWatermark = epoch,
        lastSeq = math.max(current.map(_.lastSeq).getOrElse(-1L), maxSeq),
        schemaJson = schemaJson,
        numBuckets = nb,
        files = keptFiles ++ newFiles,
        lineage = lineage)

      val ok = table.tryCommit(manifest)
      Some(MergeResult(ok, version, keysInBatch, keysInBatch, conflicts,
        deletes, rowsWritten, bytesWritten, affected.size))
    } finally {
      compacted.unpersist()
    }
  }
}
