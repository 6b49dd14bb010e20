package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 "multimodal").
  *
  * Media are opaque `binary` columns with typed metadata travelling
  * beside them. The decode step is a clearly-marked STUB (no image/
  * audio codecs in this environment) — what is real and tested is the
  * Spark-side shape: schema, batch iteration via typed mapPartitions
  * (the JVM analog of `mapInPandas`: one decoder init per partition,
  * streamed batches, no per-row setup), partition sizing, and
  * deterministic frame sampling.
  *
  * At 100 TB: payloads stay columnar/binary end to end, decode
  * parallelism = partition count, and nothing ever collects to the
  * driver.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)
  case class MediaMeta(doc_id: Long, byte_len: Int, width: Int, height: Int, format: String)
  case class Frame(doc_id: Long, frame_idx: Int, frame_len: Int)

  /** STUB decoder: a real build would call an image/audio codec here.
    * Deterministic fake: metadata derived from payload bytes only. */
  private def decodeStub(payload: Array[Byte], mediaType: String): (Int, Int, String) = {
    val w = 64 + (payload.length % 640)
    // long arithmetic: length * 7 wraps Int negative past ~307 MB and
    // a negative modulo would emit a negative height
    val h = 48 + ((payload.length.toLong * 7) % 480).toInt
    (w, h, mediaType.toUpperCase)
  }

  /** Attach a fake binary payload to the documents table (the corpus
    * has no real media; payload = UTF-8 bytes of the text). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      (when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4")).as("media_type"))

  /** Batch decode: one decoder "init" per partition, rows streamed. */
  def extractMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition decoder init would go here (codec handles, GPU, …)
      rows.map { r =>
        val (w, h, fmt) = decodeStub(r.payload, r.media_type)
        MediaMeta(r.doc_id, r.payload.length, w, h, fmt)
      }
    }
  }

  /** Deterministic frame/chunk sampling: split the payload into
    * `frameBytes` chunks, keep every `stride`-th. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 64, stride: Int = 4): Dataset[Frame] = {
    // fail fast like every other parameterized operator: stride = 0
    // would throw ArithmeticException per row inside the task and a
    // non-positive frameBytes divides by zero or silently emits nothing
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(stride > 0, s"stride must be positive, got $stride")
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val nFrames = (r.payload.length + frameBytes - 1) / frameBytes
      (0 until nFrames).filter(_ % stride == 0).map { i =>
        val len = math.min(frameBytes, r.payload.length - i * frameBytes)
        Frame(r.doc_id, i, len)
      }
    }
  }
}
