package graft

import org.apache.spark.sql.functions._
import graft.lake.{LakeTable, MergeUpsert}
import graft.engine.Replayer

/** Schema evolution during replay (SURVEY.md §7.1 M6, north_rule): columns
  * added or renamed in the change feed merge into the target schema, and
  * replaying across the evolution point reproduces the same final state.
  * Mirrors the reference's observed drift — "adding patient's MRN at the
  * end of the query" (/root/reference/CNExT/cnext_person.sql:40), widened
  * columns (/root/reference/Delphi/docs/project_notes/bugs.md:17-22).
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def v1Events = Seq(
    (0L, 0L, "I", "r1", "a.scala", "c0", "scala", "body0", 1),
    (1L, 0L, "I", "r1", "b.scala", "c1", "scala", "body1", 1),
    (2L, 1L, "U", "r1", "a.scala", "c2", "scala", "body2", 1)
  ).toDF("seq", "epoch", "op", "repo", "path", "commit", "lang", "content",
    "schemaVersion")

  // v2 adds a `branch` column (column-add evolution)
  private def v2Events = Seq(
    (3L, 2L, "U", "r1", "b.scala", "c3", "scala", "body3", 2, "main"),
    (4L, 2L, "I", "r1", "c.scala", "c4", "scala", "body4", 2, "dev")
  ).toDF("seq", "epoch", "op", "repo", "path", "commit", "lang", "content",
    "schemaVersion", "branch")

  test("added column merges into the target schema; old rows read NULL") {
    val table = new LakeTable(tmpDir("evo"), 4)
    Replayer.run(spark, v1Events, table, maxEpoch = 1)
    assert(!table.currentManifest.get.schema.fieldNames.contains("branch"))

    MergeUpsert.mergeEpoch(spark, table, v2Events, 2L)
    val m = table.currentManifest.get
    assert(m.schema.fieldNames.contains("branch"))

    val rows = table.snapshot(spark)
      .select("path", "commit", "branch").collect()
      .map(r => r.getString(0) -> (r.getString(1), Option(r.getString(2)))).toMap
    assert(rows == Map(
      "a.scala" -> ("c2", None),          // pre-evolution row: branch NULL
      "b.scala" -> ("c3", Some("main")),  // updated post-evolution
      "c.scala" -> ("c4", Some("dev"))))
  }

  test("renamed column in the feed is mapped via rename normalization") {
    // the ingest-side normalization the engine applies for renames:
    // feed column `language` → canonical `lang` before merge
    val renamed = Seq((5L, 0L, "I", "r2", "x.go", "c5", "go-lang", "bx", 3))
      .toDF("seq", "epoch", "op", "repo", "path", "commit", "language",
        "content", "schemaVersion")
    val normalized = renamed.withColumnRenamed("language", "lang")
    val table = new LakeTable(tmpDir("evo-rn"), 4)
    Replayer.run(spark, normalized, table, maxEpoch = 0)
    val r = table.snapshot(spark).select("lang").collect().map(_.getString(0))
    assert(r.sameElements(Array("go-lang")))
  }

  test("replay across the evolution point is batching-invariant") {
    val all = v1Events.unionByName(v2Events, allowMissingColumns = true)
    // one epoch-at-a-time
    val t1 = new LakeTable(tmpDir("evo-a"), 4)
    Replayer.run(spark, all, t1, maxEpoch = 2)
    // all-in-one epoch (re-stamp epoch to 0)
    val t2 = new LakeTable(tmpDir("evo-b"), 4)
    Replayer.run(spark, all.withColumn("epoch", lit(0L)), t2, maxEpoch = 0)
    val d1 = graft.oracle.FoldOracle.digestOfTable(t1.snapshot(spark))
    val d2 = graft.oracle.FoldOracle.digestOfTable(t2.snapshot(spark))
    assert(d1 == d2)
    // and the evolved column survives in both
    assert(t1.currentManifest.get.schema.fieldNames.contains("branch"))
    assert(t2.currentManifest.get.schema.fieldNames.contains("branch"))
  }
}
