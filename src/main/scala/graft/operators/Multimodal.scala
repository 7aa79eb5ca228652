package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns with a typed metadata struct. The
  * Spark-side mechanics — schema, batching via mapPartitions, partition
  * sizing, deterministic feature shape — are real and tested; the actual
  * codec step is a STUB (media libraries are not available in this
  * container) with a clearly-marked deterministic fake so downstream
  * operators (dedup, ANN over extracted features) are exercised end-to-end.
  *
  * At 100 TB: payload bytes never shuffle — metadata/feature extraction is
  * per-partition map work; only the (id, features) projection (a few hundred
  * bytes/row) flows into joins and aggregations.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, duration_ms: Long)
  case class MediaFeatures(media_id: Long, kind: String, byte_len: Int,
                           payload_sha: String, features: Array[Float])

  /** Wrap any (id, text) frame as a fake media table: the text bytes stand
    * in for an encoded payload. Deterministic metadata derived from content. */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("kind"),
      col(textCol).cast("binary").as("payload"),
      (pmod(xxhash64(col(textCol)), lit(1920L)) + 1).cast("int").as("width"),
      (pmod(xxhash64(col(textCol), lit(1)), lit(1080L)) + 1).cast("int").as("height"),
      (pmod(xxhash64(col(textCol), lit(2)), lit(600000L)) + 1).as("duration_ms"))

  /** STUB DECODER — deterministic fake. A real deployment replaces the body
    * of `fakeDecode` with an image/audio codec call; everything around it
    * (typed Dataset, per-partition batching, output schema) is production
    * shape. */
  private def fakeDecode(payload: Array[Byte], dims: Int): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below keeps the
    // pipeline testable offline.
    val out = new Array[Float](dims)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var d = 0
    while (d < dims) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      out(d) = (h % 1000L) / 1000.0f
      d += 1
    }
    out
  }

  /** Feature extraction over the binary column: mapPartitions so a real
    * decoder could amortize model/codec init per partition (the Scala
    * analogue of mapInPandas batch shape). */
  def extractFeatures(media: DataFrame, dims: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init site (codec/model handle) goes here
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { case (id, kind, payload) =>
          digest.reset()
          val sha = digest.digest(payload).map("%02x".format(_)).mkString
          MediaFeatures(id, kind, payload.length, sha, fakeDecode(payload, dims))
        }
      }
  }

  /** Frame sampling plan for video rows: which frame indices to decode,
    * computed from metadata only (no payload access — stays pushdown-
    * friendly: at scale this runs before any byte is fetched). */
  def frameSamplePlan(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("duration_ms"),
        sequence(lit(0L), col("duration_ms"), lit(everyMs)).as("sample_ms"))
      .withColumn("n_frames", size(col("sample_ms")))

  /** Resize spec: target box preserving aspect ratio — metadata-only math. */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(maxSide.toDouble) / col("width"),
      lit(maxSide.toDouble) / col("height"), lit(1.0))
    media.select(col("media_id"), col("width"), col("height"),
      round(col("width") * scale).cast("int").as("out_width"),
      round(col("height") * scale).cast("int").as("out_height"))
  }
}
