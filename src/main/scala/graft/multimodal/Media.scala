package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The decode step is a STUB — no codec libraries exist in this
  * environment — implemented as a deterministic fake that parses our own
  * synthetic header. Everything around it is real and is the part that
  * matters at 100 TB: the schema (binary payload + metadata struct), the
  * partition-parallel batched execution (`mapPartitions` over a typed
  * Dataset — the JVM analog of an Arrow-batched Pandas UDF: one
  * iterator per partition, amortized per-batch setup, no per-row
  * interpreter crossing), and the 1→N frame explosion. Swapping the fake
  * for a real JNI/codec call changes only the function body.
  */
object Media {

  /** payload + typed metadata, the storage schema for media at rest. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  final case class Feature(media_id: Long, kind: String, dim: Int,
      feature: Array[Float])

  final case class Frame(media_id: Long, frame_no: Int, frame: Array[Byte])

  /** Deterministic synthetic media table derived from `documents`: the
    * UTF-8 text bytes stand in for encoded payloads; metadata is derived
    * arithmetically. Kind cycles image/audio/video. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables(spark, dir).documents
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("n_chars") % 640 + 16).cast("int").as("width"),
        (col("n_chars") % 480 + 16).cast("int").as("height"),
        (lit(8000) + (col("doc_id") % 5) * 8000).cast("int").as("sample_rate"))
      .as[MediaRow]
  }

  /** STUBBED decode + feature extraction, batched per partition. The fake
    * "decoder" computes a 16-bin byte histogram normalized by payload
    * length — deterministic, byte-order-dependent, shaped exactly like a
    * real embedding extraction (fixed-dim float vector per item). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[Feature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup happens ONCE (where a real impl would load
      // the codec/model), then the batch is streamed through it
      val dim = 16
      it.map { m =>
        val hist = new Array[Float](dim)
        var i = 0
        while (i < m.payload.length) {
          hist((m.payload(i) & 0xff) % dim) += 1f
          i += 1
        }
        val n = math.max(1, m.payload.length).toFloat
        Feature(m.media_id, m.kind, dim, hist.map(_ / n))
      }
    }
  }

  /** STUBBED resize: truncate-or-zero-pad the payload to the byte budget
    * implied by the target dimensions, updating metadata in lockstep —
    * the shape of any payload-rewriting operator. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val budget = w * h
      val out = java.util.Arrays.copyOf(m.payload, budget)
      m.copy(payload = out, width = w, height = h)
    }
  }

  /** Frame sampling (1→N): every `stride`-th 64-byte block of a video
    * payload becomes a frame record. flatMap = the explode-shaped
    * operator; output size is data-dependent. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      m.payload.grouped(64).zipWithIndex.collect {
        case (block, i) if i % stride == 0 => Frame(m.media_id, i, block)
      }
    }
  }
}
