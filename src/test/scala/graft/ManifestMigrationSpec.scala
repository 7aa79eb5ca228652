package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable

/** Manifest format migration: a manifest written before the
  * tombstoneFloor→tombstoneGcVersion rename must not deserialize into a
  * DISABLED (-1) bootstrap tombstone-resurrection guard when the legacy
  * field shows tombstones were GC'd — it maps conservatively to the
  * manifest's own version (refusal is the safe direction). */
class ManifestMigrationSpec extends AnyFunSuite {

  private def writeManifest(root: String, extra: String): Unit = {
    val log = Paths.get(root, "_log")
    Files.createDirectories(log)
    val json =
      s"""{
         |  "version": 7,
         |  "epochWatermark": 3,
         |  "lastSeq": 99,
         |  "schemaJson": "{\\"type\\":\\"struct\\",\\"fields\\":[]}",
         |  "numBuckets": 8,
         |  "bucketFn": "${LakeTable.BucketFn}",
         |  "keyCols": ["repo", "path"],
         |  "files": [],
         |  "lineage": {},
         |  "lineageEpochFloor": 0$extra
         |}""".stripMargin
    Files.writeString(log.resolve("v00000007.json"), json)
  }

  test("legacy tombstoneFloor >= 0 maps to the manifest's own version") {
    val root = Files.createTempDirectory("graft-manifest-mig").toString
    writeManifest(root, ",\n  \"tombstoneFloor\": 5")
    val m = new LakeTable(root, 8).readManifest(7)
    assert(m.tombstoneGcVersion == 7,
      "a legacy GC floor must keep the bootstrap guard armed")
  }

  test("absent legacy key still deserializes as guard-disabled (-1)") {
    val root = Files.createTempDirectory("graft-manifest-mig").toString
    writeManifest(root, "")
    val m = new LakeTable(root, 8).readManifest(7)
    assert(m.tombstoneGcVersion == -1L)
  }

  test("legacy tombstoneFloor = -1 (never GC'd) stays disabled") {
    val root = Files.createTempDirectory("graft-manifest-mig").toString
    writeManifest(root, ",\n  \"tombstoneFloor\": -1")
    val m = new LakeTable(root, 8).readManifest(7)
    assert(m.tombstoneGcVersion == -1L)
  }

  test("a present tombstoneGcVersion wins over any legacy key") {
    val root = Files.createTempDirectory("graft-manifest-mig").toString
    writeManifest(root, ",\n  \"tombstoneFloor\": 5,\n  \"tombstoneGcVersion\": 4")
    val m = new LakeTable(root, 8).readManifest(7)
    assert(m.tombstoneGcVersion == 4L)
  }
}
