package graft.multimodal

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline (north-star ops):
  * image/audio/video as opaque `binary` payloads plus typed metadata,
  * processed by per-partition batch operators.
  *
  * The actual media decode is STUBBED — this container has no image/audio
  * codecs — behind [[StubDecoder]], which produces a deterministic fake
  * from the payload bytes. Everything around it is real, tested Spark
  * plumbing: the schema, the binary column handling, the
  * lazily-initialized-per-partition decoder (the JVM analog of a Pandas
  * UDF over mapInPandas batches: one decoder instance per partition, rows
  * streamed through it), and the downstream feature columns.
  */
object MultimodalOps {

  /** media record: opaque payload + typed metadata. */
  final case class MediaRecord(media_id: Long, kind: String,
      payload: Array[Byte], mime: String, captured_at: Timestamp)

  final case class MediaFeatures(media_id: Long, kind: String,
      byte_len: Long, sha_hex: String, width: Int, height: Int,
      n_frames: Int, mean_intensity: Double)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("captured_at", TimestampType, nullable = true)))

  /** The decode plug point. A real deployment swaps this for an actual
    * codec (JavaCV/TwelveMonkeys/ffmpeg binding) with the SAME signature —
    * bytes in, (width, height, frames, pixels-ish stats) out. The stub is
    * deterministic in the payload so tests are stable.
    */
  final class StubDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int, Double) = {
      // ??? <- real codec goes here; deterministic fake below
      if (payload == null || payload.isEmpty) (0, 0, 0, 0.0)
      else {
        val w = 16 + (payload.head & 0x3f)
        val h = 16 + (payload.last & 0x3f)
        val frames = 1 + (payload.length % 8)
        val mean = payload.iterator.map(b => (b & 0xff).toDouble).sum /
          payload.length
        (w, h, frames, mean)
      }
    }
  }

  /** Decode/feature-extract over the binary column: `mapPartitions` with
    * one decoder instance per partition (T6's lazy per-worker model-init
    * pattern, stream_join.py:231-346) — NOT one per row, and no
    * driver-side collection. Returns a typed feature Dataset.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      val decoder = new StubDecoder // lazily built once per partition
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val (w, h, frames, mean) = decoder.decode(r.payload)
        val sha = digest.digest(
          if (r.payload == null) Array.emptyByteArray else r.payload)
          .map("%02x".format(_)).mkString
        digest.reset()
        MediaFeatures(r.media_id, r.kind,
          if (r.payload == null) 0L else r.payload.length.toLong,
          sha, w, h, frames, mean)
      }
    }
  }

  /** Frame sampling plumbing: slice `n` evenly-spaced fixed-width windows
    * out of the payload (a real decoder would seek keyframes; the byte
    * slicing, schema, and explode shape are what is exercised here).
    */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int = 64)
      : DataFrame = {
    val len = octet_length(col("payload"))
    val idx = sequence(lit(0), lit(n - 1))
    media.select(col("media_id"),
        posexplode(transform(idx, i =>
          substring(col("payload"),
            (i * greatest((len - frameBytes) / n, lit(1)) + 1).cast("int"),
            lit(frameBytes)))).as(Seq("frame_no", "frame_bytes")))
      .filter(octet_length(col("frame_bytes")) > 0)
  }

  /** "Resize" metadata transform: pure column math on the typed metadata
    * (scale factors etc.) — decode-free, fully codegen'd.
    */
  def resizePlan(features: DataFrame, maxSide: Int): DataFrame =
    features
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) /
          greatest(greatest(col("width"), col("height")), lit(1))))
      .withColumn("out_width",
        ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_height",
        ceil(col("height") * col("scale")).cast("int"))

  /** Build a media table from the documents fixture (text bytes as the
    * opaque payload) — the container has no real media, but the column
    * shapes and partitioning are identical.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    docs.select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("application/octet-stream").as("mime"),
        lit(null).cast(TimestampType).as("captured_at"))
      .as[MediaRecord]
  }
}
