package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: the stub decoder's output is DETERMINISTIC and now
  * part of the multimodal_features query output — these tests pin it (the
  * codec stub has no DuckDB oracle) and check the metadata-only plans. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val media = Multimodal.asMediaTable(docs, "doc_id", "text")

  test("extractFeatures is deterministic and partitioning-invariant") {
    val a = Multimodal.extractFeatures(media, dims = 8).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    val b = Multimodal.extractFeatures(media.repartition(7), dims = 8).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(a == b)
    assert(a.values.forall(_.length == 8))
  }

  test("features derive from payload bytes: same text => same features") {
    val two = Seq((1L, "hello world"), (2L, "hello world"), (3L, "bye"))
      .toDF("doc_id", "text")
    val f = Multimodal.extractFeatures(
        Multimodal.asMediaTable(two, "doc_id", "text"), dims = 4)
      .collect().map(r => r.media_id -> r.features.toSeq).toMap
    assert(f(1L) == f(2L))
    assert(f(1L) != f(3L))
  }

  test("payload sha matches Spark-side sha2 over the same binary") {
    val viaUdfPath = Multimodal.extractFeatures(media, dims = 4).toDF()
      .select("media_id", "payload_sha")
    val viaExpr = media.select(col("media_id"),
      sha2(col("payload"), 256).as("payload_sha"))
    assert(viaUdfPath.except(viaExpr).isEmpty && viaExpr.except(viaUdfPath).isEmpty)
  }

  test("frameSamplePlan and resizePlan are metadata-only math") {
    val m = Seq((1L, "video", Array[Byte](1), 100, 50, 1000L),
                (2L, "image", Array[Byte](2), 1920, 1080, 0L))
      .toDF("media_id", "kind", "payload", "width", "height", "duration_ms")
    val fs = Multimodal.frameSamplePlan(m, everyMs = 250)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](2), r.getInt(3)))
    assert(fs.toSeq == Seq((1L, Seq(0L, 250L, 500L, 750L, 1000L), 5)))
    val rs = Multimodal.resizePlan(m, maxSide = 640)
      .collect().map(r => r.getLong(0) -> (r.getInt(3), r.getInt(4))).toMap
    assert(rs(2L) == (640, 360))
    assert(rs(1L) == (100, 50)) // never upscale
    // neither plan touches the payload column
    val plan = Multimodal.frameSamplePlan(m, 250).queryExecution.optimizedPlan.toString
    assert(!plan.contains("payload"))
  }

  test("multimodal_features query output pins the feature vector (rows+sig)") {
    val out = SparkEntry.queries("multimodal_features")(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.length == 500)
    val sig = rows.map(_.getAs[String]("features_sig"))
    assert(sig.forall(s => s.split(",").length == 8))
    // deterministic across runs
    val again = SparkEntry.queries("multimodal_features")(spark, "/root/testdata/sf0.001")
      .collect().map(_.getAs[String]("features_sig"))
    assert(sig.sorted.sameElements(again.sorted))
  }
}
