package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.model.ChangeEvent
import graft.streaming.StreamOps

/** Watermarked windowed aggregation and flatMapGroupsWithState lifecycle
  * tracking over a MemoryStream change feed — late/out-of-order events
  * included. */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(seq: Long, op: String, path: String,
                 commit: String = "c"): ChangeEvent =
    ChangeEvent(seq, seq / 10, op, "r1", path, s"$commit$seq", "scala",
      s"body$seq", 1)

  test("windowed change stats finalize per watermark; late events folded in") {
    val in = MemoryStream[ChangeEvent]
    val withTs = in.toDF().withColumn("event_ts", timestamp_seconds(col("seq")))
    val q = StreamOps.windowedChangeStats(withTs, watermarkDelay = "5 seconds",
        windowDuration = "10 seconds")
      .writeStream.format("memory").queryName("winstats")
      .outputMode(OutputMode.Append()).start()
    try {
      // window [0,10): 3 I + 1 U ; late event seq=7 arrives in batch 2
      in.addData(ev(1, "I", "a"), ev(2, "I", "b"), ev(5, "U", "a"), ev(9, "I", "c"))
      q.processAllAvailable()
      in.addData(ev(7, "I", "d"), ev(12, "U", "a")) // 7 is late but in-watermark
      q.processAllAvailable()
      // advance the watermark far past window [0,10) so it finalizes
      in.addData(ev(40, "D", "a"))
      q.processAllAvailable()
      val rows = spark.table("winstats")
        .select("win_start", "op", "n_events").collect()
        .map(r => (r.getTimestamp(0).toInstant.getEpochSecond, r.getString(1),
          r.getLong(2))).toSet
      assert(rows.contains((0L, "I", 4L)), s"late I must fold into [0,10): $rows")
      assert(rows.contains((0L, "U", 1L)), rows.toString)
      // window [10,20) finalized by the seq=40 event's watermark
      assert(rows.contains((10L, "U", 1L)), rows.toString)
    } finally q.stop()
  }

  test("keyLifecycles emits closed version chains; re-delivery is ignored") {
    val in = MemoryStream[ChangeEvent]
    val q = StreamOps.keyLifecycles(in.toDS())
      .writeStream.format("memory").queryName("chains")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev(1, "I", "a"), ev(2, "U", "a"), ev(3, "I", "b"))
      q.processAllAvailable()
      in.addData(ev(4, "D", "a"), ev(2, "U", "a")) // plus a re-delivery of seq 2
      q.processAllAvailable()
      in.addData(ev(5, "U", "b"), ev(6, "D", "b"), ev(7, "I", "a"), ev(8, "D", "a"))
      q.processAllAvailable()
      val chains = spark.table("chains").as[StreamOps.KeyLifecycle]
        .collect().map(c => (c.path, c.versions, c.closedAtSeq)).toSet
      assert(chains == Set(
        ("a", 2L, 4L),  // I@1,U@2 closed by D@4 (re-delivered U@2 ignored)
        ("b", 2L, 6L),  // I@3,U@5 closed by D@6
        ("a", 1L, 8L)), // re-insert I@7 closed by D@8
        chains.toString)
    } finally q.stop()
  }

  test("closed-chain state is GC'd once the watermark passes its TTL; " +
      "late protection holds within it") {
    val in = MemoryStream[ChangeEvent]
    val q = StreamOps.keyLifecyclesGc(in.toDS(), watermarkDelay = "5 seconds",
        closedChainTtlSec = 10)
      .writeStream.format("memory").queryName("chains_gc")
      .outputMode(OutputMode.Append()).start()
    def stateRows: Long = q.lastProgress.stateOperators.head.numRowsTotal
    try {
      // a: I@1,U@2 closed by D@3 (tombstone state); b: live chain
      in.addData(ev(1, "I", "a"), ev(2, "U", "a"), ev(3, "D", "a"), ev(4, "I", "b"))
      q.processAllAvailable()
      assert(stateRows == 2, s"closed tombstone + live chain, got $stateRows")
      // within the watermark, a late pre-delete event cannot restart `a`
      in.addData(ev(2, "U", "a"), ev(30, "U", "b"))
      q.processAllAvailable()
      // next batch runs with the advanced watermark (25s > closedAt 3s +
      // ttl 10s): a's tombstone times out and is removed; b stays live
      in.addData(ev(31, "U", "b"))
      q.processAllAvailable()
      assert(stateRows == 1, s"closed chain must be GC'd, got $stateRows")
      val chains = spark.table("chains_gc").as[StreamOps.KeyLifecycle]
        .collect().map(c => (c.path, c.versions, c.closedAtSeq)).toSet
      assert(chains == Set(("a", 2L, 3L)), chains.toString)
    } finally q.stop()
  }

  test("late pre-delete event cannot restart a closed chain") {
    val in = MemoryStream[ChangeEvent]
    val q = StreamOps.keyLifecycles(in.toDS())
      .writeStream.format("memory").queryName("chains2")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev(1, "I", "a"), ev(3, "D", "a"))
      q.processAllAvailable()
      in.addData(ev(2, "U", "a")) // late, below the delete's seq
      in.addData(ev(9, "D", "a")) // a later delete closes NOTHING (0 versions)
      q.processAllAvailable()
      val chains = spark.table("chains2").as[StreamOps.KeyLifecycle]
        .collect().map(c => (c.path, c.versions, c.closedAtSeq)).toSet
      assert(chains == Set(("a", 1L, 3L)), chains.toString)
    } finally q.stop()
  }
}
