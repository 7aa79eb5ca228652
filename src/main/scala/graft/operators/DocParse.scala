package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Document-directory parser (SURVEY.md S5 + X4): a typed `flatMap` UDTF
  * that state-machine-parses ONE semi-structured block document into N
  * typed rows — the Spark re-expression of the reference's FMI pipeline,
  * which walks an XML report and emits person/provider/observation rows
  * (/root/reference/FMI/parseFmiXmls2PreOMOP.pl:88-103, emit :503-586)
  * with a last-wins dedupe post-pass (:602-644).
  *
  * Block format (the synthetic stand-in for the FMI report):
  * {{{
  *   HDR|<doc_id>|<lang>|<source>     — exactly one, must open the block
  *   OBS|<idx>|<value>                — repeated observations
  *   END                              — closes the block; trailing ignored
  * }}}
  *
  * Parser rules (mirroring the Perl semantics):
  *  - a block not opening with HDR parses to zero rows (the reference
  *    skips unreadable reports rather than failing the run);
  *  - malformed OBS lines are skipped;
  *  - duplicate observation VALUES keep only the LAST occurrence (the
  *    reference's "later report wins" dedupe) — the kept row carries the
  *    last occurrence's idx;
  *  - output is one `header` row + deduped `observation` rows, idx-ordered.
  *
  * Scale shape: flatMap over the content column is pure per-row map work —
  * no shuffle, no driver involvement; at 100 TB the parser runs wherever
  * the scan runs and only the (small) typed rows flow downstream.
  */
object DocParse {

  final case class ParsedRow(doc_id: Long, record_type: String,
                             idx: Int, value: String)

  /** Parse one block (pure function — unit-testable without Spark). */
  def parseOne(block: String): Seq[ParsedRow] = {
    val lines = block.split("\n", -1)
    if (lines.isEmpty) return Seq.empty
    val hdr = lines.head.split("\\|", -1)
    if (hdr.length != 4 || hdr(0) != "HDR") return Seq.empty
    val docId = try hdr(1).toLong catch { case _: NumberFormatException => return Seq.empty }
    val header = ParsedRow(docId, "header", 0, s"${hdr(2)}|${hdr(3)}")
    // last-wins per observation value: LinkedHashMap keeps insertion order
    // but we re-sort by the (updated) idx at the end for determinism
    val seen = scala.collection.mutable.LinkedHashMap[String, Int]()
    var closed = false
    lines.iterator.drop(1).takeWhile(_ => !closed).foreach { line =>
      if (line == "END") closed = true
      else {
        val f = line.split("\\|", -1)
        if (f.length == 3 && f(0) == "OBS") {
          try seen.update(f(2), f(1).toInt)
          catch { case _: NumberFormatException => () } // malformed idx: skip
        } // malformed line: skip
      }
    }
    header +: seen.toSeq.sortBy { case (v, i) => (i, v) }
      .map { case (v, i) => ParsedRow(docId, "observation", i, v) }
  }

  /** Explode a frame of block documents into typed parsed rows. */
  def parse(blocks: DataFrame, blockCol: String): Dataset[ParsedRow] = {
    val spark = blocks.sparkSession
    import spark.implicits._
    blocks.select(col(blockCol)).as[String].flatMap(parseOne _)
  }

  /** Compose the block format from typed columns — the test/bench-side
    * generator (a real deployment reads the raw documents from object
    * storage instead). First `maxObs` whitespace words of `textCol` become
    * the observation stream. */
  def composeBlocks(df: DataFrame, idCol: String, langCol: String,
                    srcCol: String, textCol: String, maxObs: Int): DataFrame = {
    val words = split(trim(col(textCol)), "\\s+")
    val n = least(lit(maxObs), size(words))
    // index-aware transform over the PRE-SLICED words: the previous
    // `transform(sequence(1, n), i => ... element_at(words, i))` captured
    // `words` inside the lambda, so the regex split re-ran per OBS line
    // (HOF captures are re-evaluated per element); output strings are
    // identical (idx = 0-based position + 1 ≡ sequence(1, n))
    val obsLines = transform(slice(words, lit(1), n),
      (w, i) => concat_ws("|", lit("OBS"), i + 1, w))
    df.select(col(idCol),
      concat_ws("\n",
        concat_ws("|", lit("HDR"), col(idCol), col(langCol), col(srcCol)),
        array_join(obsLines, "\n"),
        lit("END")).as("block"))
  }
}
