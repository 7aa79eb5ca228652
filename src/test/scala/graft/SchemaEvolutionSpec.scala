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

  test("engine-side column rename: old files map in, old feed names normalize") {
    val table = new LakeTable(tmpDir("evo-rn"), 4)
    Replayer.run(spark, v1Events, table, maxEpoch = 1) // files physically `lang`
    val valuesBefore = table.snapshot(spark)
      .select("path", "lang").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

    // engine-side rename: manifest-level mapping, NO data files rewritten
    val filesBefore = table.currentManifest.get.files.map(_.path).toSet
    table.renameColumn("lang", "language")
    assert(table.currentManifest.get.files.map(_.path).toSet == filesBefore,
      "rename must not rewrite data files")
    assert(table.currentManifest.get.schema.fieldNames.contains("language"))
    assert(!table.currentManifest.get.schema.fieldNames.contains("lang"))

    // pre-rename rows read through the mapping with their original values
    val valuesAfter = table.snapshot(spark)
      .select("path", "language").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(valuesAfter == valuesBefore)

    // a change feed STILL using the former name merges into the canonical
    // column (feed-alias normalization inside mergeEpoch)
    val oldNameFeed = Seq((5L, 2L, "I", "r1", "x.go", "c5", "go-lang", "bx", 3))
      .toDF("seq", "epoch", "op", "repo", "path", "commit", "lang",
        "content", "schemaVersion")
    MergeUpsert.mergeEpoch(spark, table, oldNameFeed, 2L)
    // ... and a feed using the new name merges too
    val newNameFeed = Seq((6L, 3L, "U", "r1", "a.scala", "c6", "scala3", "b6", 3))
      .toDF("seq", "epoch", "op", "repo", "path", "commit", "language",
        "content", "schemaVersion")
    MergeUpsert.mergeEpoch(spark, table, newNameFeed, 3L)

    val state = table.snapshot(spark).select("path", "commit", "language")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(state("x.go") == ("c5", "go-lang"),
      "old-name feed column must land in the renamed column")
    assert(state("a.scala") == ("c6", "scala3"))
    assert(state("b.scala") == ("c1", "scala"), "pre-rename value survives")

    // compaction materializes the mapping: files become canonical and the
    // rename map resets, digest-equal across the compaction point
    val before = table.snapshot(spark).orderBy("path")
      .select("repo", "path", "commit", "language", "content")
      .collect().map(_.toString).toSeq
    graft.lake.Maintenance.compact(spark, table)
    assert(table.currentManifest.get.renames.isEmpty)
    val after = table.snapshot(spark).orderBy("path")
      .select("repo", "path", "commit", "language", "content")
      .collect().map(_.toString).toSeq
    assert(after == before)
  }

  test("re-introducing a former column name while its rename is live fails fast") {
    val table = new LakeTable(tmpDir("evo-retire"), 4)
    Replayer.run(spark, v1Events, table, maxEpoch = 1)
    table.renameColumn("lang", "language")

    // a batch carrying BOTH the former and canonical names is ambiguous:
    // silently folding `lang` into `language` would hijack a legitimately
    // new column forever; evolving it as a new field would corrupt the
    // alias read projection (duplicate requested column) — so it throws
    val both = Seq((7L, 2L, "I", "r1", "y.go", "c7", "go", "newmeaning", "by", 3))
      .toDF("seq", "epoch", "op", "repo", "path", "commit", "language",
        "lang", "content", "schemaVersion")
    val ex = intercept[IllegalArgumentException] {
      MergeUpsert.mergeEpoch(spark, table, both, 2L)
    }
    assert(ex.getMessage.contains("former column name"))
    assert(table.lastCommittedEpoch == 1, "failed merge must not commit")

    // a FULL compaction materializes the rename and clears the mapping;
    // the former name may then return as a genuinely new, independent column
    graft.lake.Maintenance.compact(spark, table)
    assert(table.currentManifest.get.renames.isEmpty)
    MergeUpsert.mergeEpoch(spark, table, both, 2L)
    val m = table.currentManifest.get
    assert(m.schema.fieldNames.contains("language"))
    assert(m.schema.fieldNames.contains("lang"), "retired name returns as new column")
    val row = table.snapshot(spark).filter(col("path") === "y.go")
      .select("language", "lang").collect().head
    assert(row.getString(0) == "go" && row.getString(1) == "newmeaning")
    // pre-compaction rows read NULL for the re-introduced column
    val old = table.snapshot(spark).filter(col("path") === "a.scala")
      .select("lang").collect().head
    assert(old.isNullAt(0))
  }

  test("a source batch that lost its content column fails fast") {
    val table = new LakeTable(tmpDir("evo-content"), 4)
    Replayer.run(spark, v1Events, table, maxEpoch = 1) // establishes content_sha
    val lost = Seq((9L, 2L, "U", "r1", "a.scala", "c9", "scala", 3))
      .toDF("seq", "epoch", "op", "repo", "path", "commit", "lang",
        "schemaVersion")
    val ex = intercept[IllegalArgumentException] {
      MergeUpsert.mergeEpoch(spark, table, lost, 2L)
    }
    assert(ex.getMessage.contains("content_sha invariant"))
    assert(table.lastCommittedEpoch == 1, "nothing may commit")
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
