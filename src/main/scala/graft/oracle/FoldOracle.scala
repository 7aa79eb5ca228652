package graft.oracle

import java.security.MessageDigest
import org.apache.spark.sql.DataFrame
import graft.gen.{ChangeGen, GenConfig}
import graft.model.ChangeEvent

/** Reference-oracle final state: a straightforward single-threaded fold over
  * the full change log (the `$(isInc)='N'` full-backfill branch of the
  * reference, /root/reference/MQ/mosaiq_visit_occurrence.sql:89-98) —
  * deliberately NOT Spark, so replay-equivalence tests compare two
  * independent implementations (SURVEY.md §5, M2).
  */
object FoldOracle {

  final case class State(repo: String, path: String, commit: String,
                         lang: String, content: String, seq: Long = -1L)

  /** Fold events seq-ascending into the expected final keyed state.
    * Duplicate seqs (re-deliveries) are identical rows — last application
    * wins trivially. `seq` records the winning event's offset (the lake's
    * `updated_seq`), which the per-domain oracles aggregate over. */
  def expectedState(events: Seq[ChangeEvent]): Map[(String, String), State] = {
    val m = scala.collection.mutable.LinkedHashMap[(String, String), State]()
    events.sortBy(e => (e.seq, e.commit)).foreach { e =>
      val k = (e.repo, e.path)
      if (e.op == "D") m.remove(k)
      else m.update(k, State(e.repo, e.path, e.commit, e.lang, e.content, e.seq))
    }
    m.toMap
  }

  def expectedState(cfg: GenConfig): Map[(String, String), State] =
    expectedState((0L until cfg.numEvents).map(ChangeGen.eventAt(cfg, _)))

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Whole-table digest: sha256 over sorted per-row lines — the replay-
    * equivalence comparator (input_hint: per-row content sha256 equality). */
  def digestOf(rows: Seq[(String, String, String, String, String)]): String = {
    val lines = rows.map { case (r, p, c, l, ct) =>
      s"$r|$p|$c|$l|${sha256Hex(ct)}"
    }.sorted
    sha256Hex(lines.mkString("\n"))
  }

  def digestOfState(state: Map[(String, String), State]): String =
    digestOf(state.values.toSeq.map(s => (s.repo, s.path, s.commit, s.lang, s.content)))

  /** Digest of a merged lake table DataFrame (collects — test scale only). */
  def digestOfTable(df: DataFrame): String = {
    val rows = df.select("repo", "path", "commit", "lang", "content")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).toSeq
    digestOf(rows)
  }
}
