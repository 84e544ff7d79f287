package graft.multimodal

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline (north-star ops):
  * image/audio/video as opaque `binary` payloads plus typed metadata,
  * processed by per-partition batch operators.
  *
  * Decode support is tiered by what the JVM itself ships:
  *  - IMAGES (png/jpeg/gif/bmp): REAL decode via `javax.imageio` — part
  *    of the JDK, no external codec. Width/height/mean-intensity come
  *    from actual pixels (MultimodalSpec round-trips generated PNGs).
  *  - AUDIO (wav): REAL decode via a RIFF/PCM header+sample parse
  *    (pure ByteBuffer) — sample rate, channels, frame count, mean
  *    absolute amplitude.
  *  - VIDEO / unknown MIME / undecodable bytes: the deterministic
  *    [[StubDecoder]] fake — the documented plug point for an
  *    ffmpeg-class codec, which this container does not have.
  * Everything around the decoder is real, tested Spark plumbing: the
  * schema, the binary column handling, the lazily-initialized
  * per-partition decoder (the JVM analog of a Pandas UDF over
  * mapInPandas batches: one decoder instance per partition, rows
  * streamed through it), and the downstream feature columns.
  */
object MultimodalOps {

  // ImageIO defaults to a DISK-backed stream cache: every decode/encode
  // creates (and deletes) a temp FILE, which for corpora of small blobs
  // costs more than the codec itself and is the measured source of the
  // 2-3x run-to-run swings on the decode entries. Memory-backed streams
  // change no bytes of any output. Applied once per JVM at first use of
  // this object (executors touch it through the per-partition decoders).
  //
  // CAVEAT — this is a JVM-GLOBAL mutation: any OTHER code sharing the
  // driver/executor JVM that decodes LARGE images now buffers the whole
  // stream in heap instead of a disk-backed temp file. That is the right
  // trade for this framework's small-blob corpora, but a co-resident
  // large-image workload can opt back into the disk cache by setting
  // -Dgraft.imageio.diskCache=true BEFORE this object initializes (the
  // multimodal entries then pay the temp-file churn and its variance).
  if (!sys.props.get("graft.imageio.diskCache").contains("true"))
    javax.imageio.ImageIO.setUseCache(false)

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

  /** Fallback for formats the JVM cannot decode natively (video; the
    * plug point for a JavaCV/ffmpeg binding with the SAME signature —
    * bytes in, (width, height, frames, pixels-ish stats) out). The stub
    * is deterministic in the payload so tests are stable.
    */
  final class StubDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int, Double) = {
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

  /** MIME-dispatching decoder: REAL image decode (javax.imageio — ships
    * with the JDK) and REAL wav/PCM decode (RIFF parse); everything else,
    * and any byte stream the codec rejects, falls back to [[StubDecoder]]
    * rather than failing the partition — the skip-don't-crash posture a
    * 100 TB backfill needs (one corrupt blob must not kill a stage).
    */
  final class MediaDecoder {
    private val stub = new StubDecoder

    def decode(payload: Array[Byte], mime: String): (Int, Int, Int, Double) = {
      if (payload == null || payload.isEmpty) return stub.decode(payload)
      val m = if (mime == null) "" else mime.toLowerCase
      val real =
        if (m.startsWith("image/")) decodeImage(payload)
        else if (m == "audio/wav" || m == "audio/x-wav") decodeWav(payload)
        else None
      real.getOrElse(stub.decode(payload))
    }

    /** (width, height, 1 frame, mean of (r+g+b)/3 over all pixels). */
    private[multimodal] def decodeImage(payload: Array[Byte])
        : Option[(Int, Int, Int, Double)] =
      grayStats(payload).map { case (w, h, sum) =>
        (w, h, 1, sum.toDouble / (w.toLong * h))
      }

    /** Exact integer pixel stats for spec/oracle parity:
      * (width, height, sum of per-pixel (r+g+b)/3). For grayscale images
      * r==g==b, so the per-pixel value is the exact gray byte.
      */
    def grayStats(payload: Array[Byte]): Option[(Int, Int, Long)] = {
      val img = try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        // RAW raster samples, not getRGB: getRGB routes gray images
        // through linear->sRGB color management and inflates the values
        // (a 125-mean gray image reads back ~180); raster samples are
        // the decoded channel bytes as stored. Alpha (band 4) excluded.
        val raster = img.getRaster
        val bands = math.min(raster.getNumBands, 3)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            var px = 0
            while (b < bands) { px += raster.getSample(x, y, b); b += 1 }
            sum += px / bands
            x += 1
          }
          y += 1
        }
        Some((w, h, sum))
      }
    }

    /** 64-bit average-hash (aHash) perceptual image fingerprint: the
      * image is nearest-neighbor-downsampled to an 8x8 gray grid
      * (sample at (i*w/8, j*h/8), integer division — the same NN
      * convention as [[MultimodalOps.resizeImageNN]]), and bit j*8+i is
      * set iff 64*sample > sum(samples) — the integer-exact form of
      * "pixel above the mean", so an oracle can replay the hash without
      * float-compare hazards. Robust to uniform brightness shifts (the
      * mean shifts with the pixels) and to resolution changes (NN grid),
      * which is what makes it a near-dup key rather than a checksum.
      */
    def aHash64(payload: Array[Byte]): Option[Long] = {
      val img = try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val raster = img.getRaster
        val bands = math.min(raster.getNumBands, 3)
        val g = new Array[Long](64)
        var sum = 0L
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            val x = i * w / 8; val y = j * h / 8
            var b = 0
            var px = 0
            while (b < bands) { px += raster.getSample(x, y, b); b += 1 }
            val v = (px / bands).toLong
            g(j * 8 + i) = v
            sum += v
            i += 1
          }
          j += 1
        }
        var sig = 0L
        var b = 0
        while (b < 64) {
          if (64L * g(b) > sum) sig |= (1L << b)
          b += 1
        }
        Some(sig)
      }
    }

    /** RIFF/WAVE PCM parse: (sampleRate, channels, frames-per-channel,
      * mean |sample| scaled to 0..255). Supports 8-bit unsigned and
      * 16-bit signed little-endian PCM (format code 1).
      */
    private[multimodal] def decodeWav(payload: Array[Byte])
        : Option[(Int, Int, Int, Double)] =
      wavParse(payload).map { case (rate, channels, bits, n, absSum) =>
        val maxAbs = if (bits == 8) 128.0 else 32768.0
        (rate, channels, n / channels, absSum.toDouble / n / maxAbs * 255.0)
      }

    /** Exact integer PCM stats for spec/oracle parity:
      * (sampleRate, channels, frames-per-channel, sum of |sample|). */
    def pcmStats(payload: Array[Byte]): Option[(Int, Int, Int, Long)] =
      wavParse(payload).map { case (rate, channels, _, n, absSum) =>
        (rate, channels, n / channels, absSum)
      }

    /** (rate, channels, bits, total samples, exact |sample| sum). */
    private def wavParse(payload: Array[Byte])
        : Option[(Int, Int, Int, Int, Long)] = {
      try {
        val bb = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def tag(off: Int): String =
          new String(payload, off, 4, "US-ASCII")
        if (payload.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE")
          return None
        var pos = 12
        var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
        var result: Option[(Int, Int, Int, Int, Long)] = None
        while (pos + 8 <= payload.length && result.isEmpty) {
          val id = tag(pos)
          val len = bb.getInt(pos + 4)
          if (id == "fmt ") {
            val code = bb.getShort(pos + 8) & 0xffff
            if (code != 1) return None // PCM only
            fmt = Some((bb.getShort(pos + 10) & 0xffff,
              bb.getInt(pos + 12), bb.getShort(pos + 22) & 0xffff))
          } else if (id == "data") {
            val (channels, rate, bits) = fmt.getOrElse(return None)
            if (channels < 1 || (bits != 8 && bits != 16)) return None
            val bytesPer = bits / 8
            val n = math.min(len, payload.length - pos - 8) / bytesPer
            if (n == 0) return None
            var sum = 0L
            var i = 0
            while (i < n) {
              val v =
                if (bits == 8) math.abs((payload(pos + 8 + i) & 0xff) - 128)
                else math.abs(bb.getShort(pos + 8 + i * 2).toInt)
              sum += v
              i += 1
            }
            result = Some((rate, channels, bits, n, sum))
          }
          pos += 8 + len + (len & 1) // chunks are word-aligned
        }
        result
      } catch { case _: Exception => None }
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
      val decoder = new MediaDecoder // lazily built once per partition
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val (w, h, frames, mean) = decoder.decode(r.payload, r.mime)
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

  /** REAL image resize (binary -> binary): nearest-neighbor downscale to
    * `maxSide` with EXACT INTEGER arithmetic — output dims
    * `(side*maxSide + m - 1) / m` (integer ceil, m = max(w, h); floats
    * like 16.0/20 are not exactly representable and a float ceil can
    * round a 16.000000000000004 up to 17) and source index
    * `sx = x*w/ow` (integer floor). Deterministic and engine-replayable,
    * so the resize is oracle-checkable end-to-end
    * (`multimodal_resize_stats` replays generator∘sampling in SQL).
    * Images already within `maxSide` pass through unchanged; undecodable
    * payloads return None (caller keeps the original — skip-don't-crash).
    * Grayscale stays single-band; color re-encodes as RGB.
    */
  def resizeImageNN(payload: Array[Byte], maxSide: Int): Option[Array[Byte]] = {
    require(maxSide >= 1)
    val img = try javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val m = math.max(w, h)
      if (m <= maxSide) Some(payload)
      else {
        val ow = (w * maxSide + m - 1) / m
        val oh = (h * maxSide + m - 1) / m
        val srcRaster = img.getRaster
        val gray = srcRaster.getNumBands == 1
        val out = new java.awt.image.BufferedImage(ow, oh,
          if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
          else java.awt.image.BufferedImage.TYPE_INT_RGB)
        val outRaster = out.getRaster
        val bands = math.min(srcRaster.getNumBands, outRaster.getNumBands)
        var y = 0
        while (y < oh) {
          val sy = y * h / oh
          var x = 0
          while (x < ow) {
            val sx = x * w / ow
            var b = 0
            while (b < bands) {
              outRaster.setSample(x, y, b, srcRaster.getSample(sx, sy, b))
              b += 1
            }
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    }
  }

  /** Corpus-scale resize pass: one decoder per partition, image rows
    * rewritten in place, non-image / undecodable rows passed through
    * untouched. The binary->binary shape a 100 TB thumbnail backfill
    * runs. */
  def resizeImages(media: Dataset[MediaRecord], maxSide: Int)
      : Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    media.mapPartitions { rows =>
      rows.map { r =>
        val isImage = r.mime != null && r.mime.toLowerCase.startsWith("image/")
        if (!isImage || r.payload == null) r
        else resizeImageNN(r.payload, maxSide)
          .map(p => r.copy(payload = p)).getOrElse(r)
      }
    }
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

  /** Deterministic grayscale PNG from a seed: W = 16 + seed%16,
    * H = 16 + seed%8, gray(x, y) = (seed*31 + x*7 + y*13) % 256. PNG is
    * lossless, so decode recovers the exact pixels — which makes the
    * encode→decode roundtrip ORACLE-CHECKABLE: a SQL engine replays the
    * generator in closed form and compares pixel stats without ever
    * touching a codec (the `multimodal_image_stats` catalog entry).
    */
  def syntheticGrayPng(seed: Long): Array[Byte] = {
    val w = 16 + (seed % 16).toInt
    val h = 16 + (seed % 8).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((seed * 31 + x * 7 + y * 13) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic 16-bit mono PCM wav from a seed: 64 + seed%64 frames
    * at 8 kHz, sample(i) = ((seed*7919 + i*104729) % 65536) - 32768.
    * PCM is raw, so [[MediaDecoder.pcmStats]] recovers the exact
    * samples — the `multimodal_audio_stats` oracle replays the generator
    * in closed form, codec-free (same pattern as [[syntheticGrayPng]]).
    */
  def syntheticPcmWav(seed: Long): Array[Byte] = {
    val n = 64 + (seed % 64).toInt
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(8000 * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort((((seed * 7919 + i.toLong * 104729) % 65536) - 32768).toShort)
      i += 1
    }
    bb.array()
  }

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
