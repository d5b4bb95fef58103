package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata. The Spark-side machinery —
  * schema, batch iteration, partitioning, deterministic outputs — is
  * real and tested; the actual media decode is STUBBED with a
  * deterministic fake because no image/audio codec libraries exist in
  * this container (the production swap-in point is `decodeStub`,
  * equivalent to a Pandas-UDF `mapInPandas` decode in PySpark: both are
  * per-partition batch iterators over Arrow-ish batches).
  */
object BinaryOps {

  final case class MediaMeta(url: String, n_bytes: Long, content_hash: String,
                             fake_width: Int, fake_height: Int,
                             fake_frames: Int)

  /** ======== STUB ========
    * Deterministic fake "decode": derives pseudo-metadata from the raw
    * bytes. A real deployment replaces this body with an actual codec
    * call (e.g. javax.imageio / ffmpeg bindings); signature and
    * batch shape stay identical.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    val w = 160 + (n % 480)            // fake width  in [160, 640)
    val h = 90 + ((n / 7) % 270)       // fake height in [90, 360)
    val frames = 1 + (n % 24)          // fake frame count
    (w, h, frames)
  }

  /** Per-partition batch decode of (url, payload) rows → typed metadata.
    * MessageDigest is allocated once per partition (the per-partition
    * resource pattern — at scale this is where a codec context lives).
    * MD5 (not SHA-1) so the whole metadata row — content hash included —
    * is recomputable by the DuckDB oracle, which only ships md5/sha256.
    */
  def extractMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("url"), col("payload")).as[(String, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (url, bytes) =>
          md.reset()
          val hash = md.digest(bytes).map("%02x".format(_)).mkString
          val (w, h, f) = decodeStub(bytes)
          MediaMeta(url, bytes.length.toLong, hash, w, h, f)
        }
      }
  }

  /** Deterministic frame sampling stub: pick every `stride`-th fake
    * frame index — the video-pipeline shape (explode into frame rows,
    * one row per sampled frame, stable ordering).
    */
  def sampleFrames(spark: SparkSession, meta: Dataset[MediaMeta],
                   stride: Int = 5): DataFrame = {
    meta.toDF().select(col("url"),
      explode(sequence(lit(0), col("fake_frames") - 1, lit(stride))).as("frame_idx"))
  }
}
