package graft.gen

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.ChangeEvent

/** Deterministic distributed change-log generator (SURVEY.md §7.1 M1,
  * FIXTURES.md §2). Every event is a pure function of (seed, index), built
  * with splitmix64 — so the same config yields byte-identical streams on
  * any partitioning, any cluster size, and any rerun. No wall-clock, no
  * Math.random, no external data.
  *
  * Scale path: `spark.range(n)` parallelizes generation across all cores;
  * at 10^10 events the generator is embarrassingly parallel and the stream
  * never materializes on the driver.
  *
  * Knobs mirror the reference's observed data shape:
  *  - Zipf-skewed repos (hot identity_contexts → exercises salting);
  *  - I/U/D mix (the reference is I/U-heavy; D is the engine extension);
  *  - duplicate delivery (same seq re-emitted — the reference's lookback
  *    overlap, /root/reference/Delphi/MSSQL_Vertica_Translations/README.md:11-17);
  *  - schema evolution points (schemaVersion bumps; §1.3 column drift).
  */
final case class GenConfig(
    seed: Long = 42L,
    numEvents: Long = 10000L,
    numRepos: Int = 50,
    pathsPerRepo: Int = 200,
    epochSize: Long = 1000L,
    pctUpdate: Int = 55,      // of 100; remainder after I/D
    pctInsert: Int = 30,
    pctDelete: Int = 15,
    duplicateRate: Int = 0,   // per-mille of extra re-delivered events
    evolutionSeq: Long = Long.MaxValue, // seq at which schemaVersion → 2
    contentLen: Int = 64,
    hotKeyPct: Int = 0        // % of events hitting ONE fixed (repo, path)
)

object ChangeGen {

  /** splitmix64 — the standard 64-bit mix; pure, stateless. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private def uniform01(h: Long): Double =
    ((h >>> 11).toDouble) / (1L << 53).toDouble

  private val langs = Array("scala", "java", "python", "go", "rust", "sql",
    "markdown", "yaml", "shell", "c")

  /** Zipf(s=1)-ish rank via inverse-CDF trick: floor(R^u) has pdf ∝ 1/r. */
  private def zipfRank(u: Double, n: Int): Int =
    math.min(n, math.max(1, math.floor(math.pow(n.toDouble, u)).toInt))

  /** The pure event function: event for logical WAL offset `seq`. */
  def eventAt(cfg: GenConfig, seq: Long): ChangeEvent = {
    val h1 = mix64(cfg.seed ^ seq)
    val h2 = mix64(h1)
    val h3 = mix64(h2)
    val h4 = mix64(h3)
    val repoIdx = zipfRank(uniform01(h1), cfg.numRepos)
    val pathIdx = (math.abs(h2) % cfg.pathsPerRepo).toInt
    val ext = langs((pathIdx + repoIdx) % langs.length)
    // hot-key torture knob (SkewSpec): the roll derives from its own hash
    // so hotKeyPct=0 streams are byte-identical to pre-knob streams
    val hot = cfg.hotKeyPct > 0 &&
      (math.abs(mix64(h4 ^ 0x5DEECE66DL)) % 100) < cfg.hotKeyPct
    val repo = if (hot) "repo-hot" else s"repo-$repoIdx"
    val path = if (hot) "src/hot/main.scala"
      else f"src/d${pathIdx % 13}%02d/m${pathIdx % 7}/f$pathIdx%04d.$ext"
    val opRoll = (math.abs(h3) % 100).toInt
    val op =
      if (opRoll < cfg.pctInsert) "I"
      else if (opRoll < cfg.pctInsert + cfg.pctUpdate) "U"
      else "D"
    val commit = f"${h4}%016x"
    val schemaVersion = if (seq >= cfg.evolutionSeq) 2 else 1
    // content: deterministic, unique per (key, seq); padded to contentLen
    val base = s"$repo/$path@$commit#$seq"
    val pad = {
      val sb = new StringBuilder(base)
      var h = h4
      while (sb.length < cfg.contentLen) { h = mix64(h); sb.append(f"$h%016x") }
      sb.setLength(cfg.contentLen); sb.toString
    }
    ChangeEvent(seq, seq / cfg.epochSize, op, repo, path, commit, ext, pad,
      schemaVersion)
  }

  /** The delivered stream: base events 0..n-1 plus `duplicateRate`‰ extra
    * re-deliveries of earlier events (identical rows, same seq). Epoch of a
    * re-delivered event is where it REappears — so a duplicate can land in
    * a later epoch, exactly the reference's lookback-overlap shape. */
  def stream(spark: SparkSession, cfg: GenConfig): Dataset[ChangeEvent] = {
    import spark.implicits._
    val dups = cfg.numEvents * cfg.duplicateRate / 1000
    spark.range(cfg.numEvents + dups).map { i =>
      if (i < cfg.numEvents) eventAt(cfg, i)
      else {
        // deterministic earlier offset; re-delivered in a later epoch
        val origin = math.abs(mix64(cfg.seed ^ (~i))) % cfg.numEvents
        val e = eventAt(cfg, origin)
        val appearsAt = math.min(cfg.numEvents - 1, origin + cfg.epochSize)
        e.copy(epoch = appearsAt / cfg.epochSize)
      }
    }
  }
}
