package graft

import org.apache.spark.sql.functions._
import graft.operators.DocParse
import graft.operators.DocParse.ParsedRow

/** The document-parser UDTF (S5/X4): state-machine unit tests on the pure
  * parse function, plus the distributed compose→parse roundtrip checked
  * against a relational reconstruction (the same independence the DuckDB
  * oracle provides for the doc_parse_explode query). */
class DocParseSpec extends SparkSpec {
  import spark.implicits._

  test("happy path: header + idx-ordered observations") {
    val block = "HDR|7|en|srcA\nOBS|1|alpha\nOBS|2|beta\nEND"
    assert(DocParse.parseOne(block) == Seq(
      ParsedRow(7, "header", 0, "en|srcA"),
      ParsedRow(7, "observation", 1, "alpha"),
      ParsedRow(7, "observation", 2, "beta")))
  }

  test("last-wins dedupe: duplicate values keep the LAST occurrence's idx") {
    val block = "HDR|7|en|srcA\nOBS|1|alpha\nOBS|2|beta\nOBS|3|alpha\nEND"
    assert(DocParse.parseOne(block).filter(_.record_type == "observation") ==
      Seq(ParsedRow(7, "observation", 2, "beta"),
          ParsedRow(7, "observation", 3, "alpha")))
  }

  test("malformed blocks: no HDR -> zero rows; bad lines skipped; END stops") {
    assert(DocParse.parseOne("OBS|1|a\nEND").isEmpty)
    assert(DocParse.parseOne("").isEmpty)
    assert(DocParse.parseOne("HDR|x|en|s\nEND").isEmpty) // non-numeric id
    val messy = "HDR|9|de|s\nOBS|1|ok\ngarbage line\nOBS|zz|bad\nOBS|2|ok2\nEND\nOBS|3|after-end"
    assert(DocParse.parseOne(messy).map(_.value) == Seq("de|s", "ok", "ok2"))
  }

  test("distributed compose->parse roundtrip equals relational reconstruction") {
    val docs = Seq(
      (1L, "en", "s1", "red blue red green"),
      (2L, "fr", "s2", "un deux trois"),
      (3L, "zh", "s3", "一 二 三 一")
    ).toDF("doc_id", "lang", "source", "text")
    val got = DocParse.parse(
        DocParse.composeBlocks(docs, "doc_id", "lang", "source", "text", 8), "block")
      .collect().toSet
    val expected = Set(
      ParsedRow(1, "header", 0, "en|s1"),
      ParsedRow(1, "observation", 2, "blue"),
      ParsedRow(1, "observation", 3, "red"),   // last-wins: idx 3, not 1
      ParsedRow(1, "observation", 4, "green"),
      ParsedRow(2, "header", 0, "fr|s2"),
      ParsedRow(2, "observation", 1, "un"),
      ParsedRow(2, "observation", 2, "deux"),
      ParsedRow(2, "observation", 3, "trois"),
      ParsedRow(3, "header", 0, "zh|s3"),
      ParsedRow(3, "observation", 2, "二"),
      ParsedRow(3, "observation", 3, "三"),
      ParsedRow(3, "observation", 4, "一"))
    assert(got == expected)
  }

  test("parse plans as a pure map-side flatMap (no shuffle)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = DocParse.parse(
        DocParse.composeBlocks(docs, "doc_id", "lang", "source", "text", 8), "block")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"parser must not shuffle:\n$plan")
  }
}
