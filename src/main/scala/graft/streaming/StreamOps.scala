package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.ChangeEvent

/** Streaming analytics over the change feed — the Structured-Streaming
  * surfaces beyond the ingest tail ([[StreamIngest]]):
  *
  *  - watermarked tumbling-window change-rate stats (the observability
  *    counters the reference's nightly runs print as one-off SELECTs,
  *    e.g. /root/reference/Delphi/MSSQL_Vertica_Translations/README.md's
  *    row-count probes, made continuous);
  *  - a `flatMapGroupsWithState` key-lifecycle tracker: custom per-key
  *    state that Spark's built-in aggregations can't express (version
  *    chain length between insert and delete).
  *
  * Scale notes: the windowed agg is a standard two-phase streaming
  * aggregate — partial per micro-batch task, merged into the state store,
  * keyed by (window, op): state size is O(windows × 3), not O(events).
  * The lifecycle state is one small struct per LIVE key, dropped on
  * delete; at 10^10 events the state is bounded by the live keyspace.
  */
object StreamOps {

  /** Tumbling-window change-rate stats with late-data tolerance.
    * `events` needs an `event_ts` timestamp column (for the WAL replay
    * the total-ordered `seq` maps to event time via `timestamp_seconds`).
    * Append-mode semantics: a window only emits once the watermark passes
    * its end — the streaming analogue of the engine's "the watermark only
    * gates state GC" rule (SURVEY.md §2.9 C5). */
  def windowedChangeStats(events: DataFrame, watermarkDelay: String,
                          windowDuration: String): DataFrame =
    events
      .withWatermark("event_ts", watermarkDelay)
      .groupBy(window(col("event_ts"), windowDuration), col("op"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(concat_ws("\u0000", col("repo"), col("path")))
          .as("approx_keys"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("op"), col("n_events"),
        col("approx_keys"))

  /** One closed lifecycle: key existed from its first insert/update until
    * a delete, spanning `versions` applied row versions. */
  final case class KeyLifecycle(repo: String, path: String,
                                versions: Long, closedAtSeq: Long)

  /** Per-key state for [[keyLifecycles]] (public: the encoder's generated
    * code needs constructor access). */
  final case class ChainState(versions: Long, lastSeq: Long)

  /** Per-key custom state machine over the change feed: counts row
    * versions per (repo, path) and EMITS a [[KeyLifecycle]] row when the
    * key is deleted (chain closes), resetting the state. Built-in
    * windowed aggs cannot express "emit on a specific event type with
    * accumulated state"; this is the `flatMapGroupsWithState` pattern.
    * Events within a batch are applied in `seq` order (the WAL total
    * order), so replays/late arrivals below the applied seq are ignored
    * — idempotent like the batch merge. */
  def keyLifecycles(events: Dataset[ChangeEvent]): Dataset[KeyLifecycle] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(e => (e.repo, e.path))
      .flatMapGroupsWithState[ChainState, KeyLifecycle](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((repo, path), batch, state: GroupState[ChainState]) =>
          fold(repo, path, batch, state)
      }
  }

  /** [[keyLifecycles]] with bounded state — the 10^10-event form. Closed
    * chains keep a tombstone state (versions = 0) so a late pre-delete
    * event cannot restart them, but at scale those tombstones accumulate
    * unboundedly; here the event-time watermark gates their GC (the
    * lake-side analogue is [[graft.lake.Maintenance.compact]]'s
    * tombstoneWatermark; the reference's is the lookback window,
    * /root/reference/Delphi/config.yaml:21-22): once the watermark passes
    * `closedAt + ttl`, no admissible late event can precede the close —
    * Spark drops later-than-watermark input before the stateful operator —
    * so the tombstone is dead weight and an EventTimeTimeout removes it.
    * LIVE chains never time out (their state IS the data); a chain
    * reopened after its close keeps its state when a stale timeout fires.
    * State size: O(live keys + closed chains younger than ttl). */
  def keyLifecyclesGc(events: Dataset[ChangeEvent], watermarkDelay: String,
                      closedChainTtlSec: Long): Dataset[KeyLifecycle] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF()
      .withColumn("event_ts", timestamp_seconds(col("seq")))
      .withWatermark("event_ts", watermarkDelay)
      .as[ChangeEvent]
      .groupByKey(e => (e.repo, e.path))
      .flatMapGroupsWithState[ChainState, KeyLifecycle](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((repo, path), batch, state: GroupState[ChainState]) =>
          if (state.hasTimedOut) {
            // fires once; a closed chain is GC'd, a reopened one survives
            // (its stale timeout simply isn't re-armed)
            if (state.getOption.exists(_.versions == 0L)) state.remove()
            Iterator.empty
          } else {
            val out = fold(repo, path, batch, state)
            state.getOption.filter(_.versions == 0L).foreach { st =>
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1,
                st.lastSeq * 1000L + closedChainTtlSec * 1000L))
            }
            out
          }
      }
  }

  /** Shared per-key fold: apply the batch in (seq, commit) order, ignore
    * events at or below the applied seq (idempotent, like the batch
    * merge), emit a lifecycle row whenever a delete closes a chain, and
    * keep the post-delete tombstone state so late pre-delete events
    * cannot restart a closed chain. */
  private def fold(repo: String, path: String, batch: Iterator[ChangeEvent],
                   state: GroupState[ChainState]): Iterator[KeyLifecycle] = {
    var st = state.getOption.getOrElse(ChainState(0L, -1L))
    val out = scala.collection.mutable.ArrayBuffer.empty[KeyLifecycle]
    batch.toSeq.sortBy(e => (e.seq, e.commit)).foreach { e =>
      if (e.seq > st.lastSeq) { // ignore re-delivered older events
        if (e.op == "D") {
          if (st.versions > 0)
            out += KeyLifecycle(repo, path, st.versions, e.seq)
          st = ChainState(0L, e.seq)
        } else {
          st = ChainState(st.versions + 1, e.seq)
        }
      }
    }
    state.update(st)
    out.iterator
  }
}
