package graft.oracle

import graft.oracle.FoldOracle.State

/** Per-domain ground truth for [[graft.engine.Pipeline]]: plain
  * single-threaded Scala folds over the [[FoldOracle]] final source state —
  * deliberately NOT Spark, so the pipeline-equivalence tests compare two
  * independent implementations of the same OMOP mapping semantics
  * (/root/reference/Delphi/ArchitecturePlan.md:51-68). Each oracle renders
  * canonical sorted row lines; compare as sets/digests against the
  * collected domain lake tables.
  */
object DomainOracle {

  private val codeLangs = Set("scala", "java", "python", "go", "rust", "c")
  private val langNames = Map(
    "scala" -> "Scala source", "java" -> "Java source",
    "python" -> "Python source", "go" -> "Go source",
    "rust" -> "Rust source", "c" -> "C source",
    "sql" -> "SQL script", "shell" -> "Shell script",
    "markdown" -> "Markdown document", "yaml" -> "YAML config")

  /** `substring_index(path, '/', 2)` — prefix up to the second '/'. */
  def dir2(path: String): String = {
    val parts = path.split("/", -1)
    if (parts.length <= 2) path else parts.take(2).mkString("/")
  }

  private def opt(o: Option[Any]): String = o.map(_.toString).getOrElse("∅")

  /** PERSON: one line per repo —
    * `repo|n_paths|n_langs|langs|first_path|modified_seq`. */
  def personLines(state: Map[(String, String), State]): Seq[String] =
    state.values.groupBy(_.repo).map { case (repo, rows) =>
      val langs = rows.map(_.lang).toSet.toSeq.sorted.mkString(";")
      s"$repo|${rows.size}|${rows.map(_.lang).toSet.size}|$langs|" +
        s"${rows.map(_.path).min}|${rows.map(_.seq).max}"
    }.toSeq.sorted

  /** VISIT_OCCURRENCE: `repo|path|commit|seq|preceding_commit` with the
    * LAG(1) chain ordered by (seq, path) within each repo. */
  def visitLines(state: Map[(String, String), State]): Seq[String] =
    state.values.groupBy(_.repo).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.toSeq.sortBy(r => (r.seq, r.path))
      ordered.zip(None +: ordered.init.map(r => Some(r.commit))).map {
        case (r, prev) =>
          s"${r.repo}|${r.path}|${r.commit}|${r.seq}|${opt(prev)}"
      }
    }.sorted

  /** CONDITION_OCCURRENCE: one line per (repo, dir2(path)) —
    * `repo|group|start_seq|end_seq|updt_seq|n`. */
  def conditionLines(state: Map[(String, String), State]): Seq[String] =
    state.values.groupBy(r => (r.repo, dir2(r.path))).map {
      case ((repo, g), rows) =>
        val seqs = rows.map(_.seq)
        s"$repo|$g|${seqs.min}|${seqs.max}|${seqs.max}|${rows.size}"
    }.toSeq.sorted

  /** DRUG_EXPOSURE: `repo|path|lang|seq|content_len-or-∅` (content_len
    * only for code langs — the drifted-schema union branch). */
  def drugLines(state: Map[(String, String), State]): Seq[String] =
    state.values.map { r =>
      val len = if (codeLangs.contains(r.lang)) Some(r.content.length) else None
      s"${r.repo}|${r.path}|${r.lang}|${r.seq}|${opt(len)}"
    }.toSeq.sorted

  /** MEASUREMENT: `repo|path|concept|sha256(content)|repo_n_langs` — the
    * dimension lookup plus the PERSON-table enrichment join. */
  def measurementLines(state: Map[(String, String), State]): Seq[String] = {
    val nLangs: Map[String, Int] =
      state.values.groupBy(_.repo).map { case (repo, rows) =>
        repo -> rows.map(_.lang).toSet.size
      }
    state.values.map { r =>
      s"${r.repo}|${r.path}|${langNames.getOrElse(r.lang, "Unknown")}|" +
        s"${FoldOracle.sha256Hex(r.content)}|${nLangs(r.repo)}"
    }.toSeq.sorted
  }

  /** VISIT_DETAIL: `repo|path|commit|seq|preceding_commit|rank` — the
    * visit chain plus the within-repo ROW_NUMBER over (seq, path). */
  def visitDetailLines(state: Map[(String, String), State]): Seq[String] =
    state.values.groupBy(_.repo).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.toSeq.sortBy(r => (r.seq, r.path))
      ordered.zipWithIndex.zip(None +: ordered.init.map(r => Some(r.commit)))
        .map { case ((r, i), prev) =>
          s"${r.repo}|${r.path}|${r.commit}|${r.seq}|${opt(prev)}|${i + 1}"
        }
    }.sorted

  /** PROCEDURE_OCCURRENCE: `repo|path|ext|rank|sha256(content)` — the
    * path-extension concept enriched with the VISIT_DETAIL rank (the
    * second link of the 2-deep chain). */
  def procedureLines(state: Map[(String, String), State]): Seq[String] = {
    val ranks = visitRanks(state)
    state.values.map { r =>
      s"${r.repo}|${r.path}|${ext(r.path)}|${ranks((r.repo, r.path))}|" +
        s"${FoldOracle.sha256Hex(r.content)}"
    }.toSeq.sorted
  }

  /** OBSERVATION_PERIOD: one line per repo —
    * `repo|min_seq|max_seq|n_rows` (person-grain A1 span rollup). */
  def observationPeriodLines(state: Map[(String, String), State]): Seq[String] =
    state.values.groupBy(_.repo).map { case (repo, rows) =>
      val seqs = rows.map(_.seq)
      s"$repo|${seqs.min}|${seqs.max}|${rows.size}"
    }.toSeq.sorted

  /** NOTE: `repo|path|title|class|chars` for NON-code langs only (partial
    * domain membership — code paths contribute no line). */
  def noteLines(state: Map[(String, String), State]): Seq[String] =
    state.values.filterNot(r => codeLangs.contains(r.lang)).map { r =>
      val title = r.path.lastIndexOf('/') match {
        case -1 => r.path
        case i => r.path.substring(i + 1)
      }
      // code points, not UTF-16 units: Spark's length() counts code
      // points, so non-BMP content must not diverge the oracle
      val chars = r.content.codePointCount(0, r.content.length)
      s"${r.repo}|${r.path}|$title|${r.lang}|$chars"
    }.toSeq.sorted

  /** `substring_index(path, '/', 1)` — prefix up to the first '/'. */
  def dir1(path: String): String = {
    val i = path.indexOf('/')
    if (i < 0) path else path.substring(0, i)
  }

  /** `substring_index(path, '.', -1)` — after the last '.', whole if none. */
  def ext(path: String): String = path.lastIndexOf('.') match {
    case -1 => path
    case i => path.substring(i + 1)
  }

  /** Spark's crc32 over UTF-8 bytes (java.util.zip.CRC32 is the same
    * polynomial) — the specimen membership predicate. */
  def crc32Of(s: String): Long = {
    val c = new java.util.zip.CRC32()
    c.update(s.getBytes("UTF-8"))
    c.getValue
  }

  /** Within-repo visit rank over (seq, path) — shared by the detail-chain
    * oracles. */
  private def visitRanks(state: Map[(String, String), State])
      : Map[(String, String), Int] =
    state.values.groupBy(_.repo).flatMap { case (_, rows) =>
      rows.toSeq.sortBy(r => (r.seq, r.path)).zipWithIndex
        .map { case (r, i) => (r.repo, r.path) -> (i + 1) }
    }.toMap

  /** CARE_SITE: one line per (repo, dir1(path)) —
    * `repo|site|n_paths|n_langs|max_seq`. */
  def careSiteLines(state: Map[(String, String), State]): Seq[String] =
    state.values.groupBy(r => (r.repo, dir1(r.path))).map {
      case ((repo, site), rows) =>
        s"$repo|$site|${rows.size}|${rows.map(_.lang).toSet.size}|" +
          s"${rows.map(_.seq).max}"
    }.toSeq.sorted

  /** LOCATION: one line per dir1(path) ACROSS repos —
    * `dir|n_repos|n_paths`. */
  def locationLines(state: Map[(String, String), State]): Seq[String] =
    state.values.groupBy(r => dir1(r.path)).map { case (d, rows) =>
      s"$d|${rows.map(_.repo).toSet.size}|${rows.size}"
    }.toSeq.sorted

  /** PROVIDER: one line per (repo, ext(path)) — `repo|ext|n_paths|max_seq`. */
  def providerLines(state: Map[(String, String), State]): Seq[String] =
    state.values.groupBy(r => (r.repo, ext(r.path))).map {
      case ((repo, e), rows) =>
        s"$repo|$e|${rows.size}|${rows.map(_.seq).max}"
    }.toSeq.sorted

  /** OBSERVATION: `repo|path|lang|content_len|visit_rank`. */
  def observationLines(state: Map[(String, String), State]): Seq[String] = {
    val ranks = visitRanks(state)
    state.values.map { r =>
      s"${r.repo}|${r.path}|${r.lang}|${r.content.length}|" +
        s"${ranks((r.repo, r.path))}"
    }.toSeq.sorted
  }

  /** OBSERVATION_FINAL: the observation rows re-ranked within each repo by
    * (content_len desc, path asc) — `repo|path|lang|content_len|obs_rank`. */
  def observationFinalLines(state: Map[(String, String), State]): Seq[String] =
    state.values.groupBy(_.repo).toSeq.flatMap { case (_, rows) =>
      rows.toSeq.sortBy(r => (-r.content.length, r.path)).zipWithIndex.map {
        case (r, i) =>
          s"${r.repo}|${r.path}|${r.lang}|${r.content.length}|${i + 1}"
      }
    }.sorted

  /** SPECIMEN: the crc32-sampled quarter of the keyspace —
    * `repo|path|lang|sha256(content)|visit_rank`. */
  def specimenLines(state: Map[(String, String), State]): Seq[String] = {
    val ranks = visitRanks(state)
    state.values.filter(r => crc32Of(s"${r.repo}:${r.path}") % 4 == 0).map {
      r =>
        s"${r.repo}|${r.path}|${r.lang}|${FoldOracle.sha256Hex(r.content)}|" +
          s"${ranks((r.repo, r.path))}"
    }.toSeq.sorted
  }

  /** CODE_VALUE: one line per lang — `lang|n_paths|total_chars` (code
    * points, matching Spark's length()). The algebraic-rollup domain. */
  def codeValueLines(state: Map[(String, String), State]): Seq[String] =
    state.values.groupBy(_.lang).map { case (lang, rows) =>
      val chars = rows.map(r =>
        r.content.codePointCount(0, r.content.length).toLong).sum
      s"$lang|${rows.size}|$chars"
    }.toSeq.sorted

  def digest(lines: Seq[String]): String =
    FoldOracle.sha256Hex(lines.mkString("\n"))
}
