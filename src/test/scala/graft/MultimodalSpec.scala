package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalOps
import graft.multimodal.MultimodalOps.{MediaDecoder, MediaRecord}

/** REAL multimodal decode paths — no external codecs, only what the JDK
  * ships: javax.imageio for images, a ByteBuffer RIFF/PCM parse for wav.
  * The stub remains the fallback for video/unknown/undecodable payloads.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def pngOf(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, gray(x, y))
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavOf(samples: Array[Short], channels: Int,
                    rate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16) // bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("png decode is REAL: imageio recovers exact dimensions and pixel " +
       "mean from generated images") {
    val dec = new MediaDecoder
    val png = pngOf(20, 10, (x, y) => (x * 7 + y * 13) % 256)
    val (w, h, frames, mean) = dec.decode(png, "image/png")
    assert((w, h, frames) === ((20, 10, 1)))
    val expected = (for (y <- 0 until 10; x <- 0 until 20)
      yield (x * 7 + y * 13) % 256).sum / 200.0
    assert(math.abs(mean - expected) < 1e-9, s"$mean vs $expected")
    // exact integer stats (the oracle-checked form)
    assert(dec.grayStats(png).get ===
      ((20, 10, (for (y <- 0 until 10; x <- 0 until 20)
        yield ((x * 7 + y * 13) % 256).toLong).sum)))
  }

  test("jpeg decode works off the same imageio path (dimensions exact; " +
       "mean within lossy-codec tolerance)") {
    val img = new java.awt.image.BufferedImage(32, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 32)
      img.setRGB(x, y, 0x808080) // uniform mid-gray
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val (w, h, frames, mean) = new MediaDecoder().decode(
      bos.toByteArray, "image/jpeg")
    assert((w, h, frames) === ((32, 16, 1)))
    assert(math.abs(mean - 128.0) < 4.0, s"mean=$mean") // lossy but close
  }

  test("wav decode is REAL: RIFF/PCM parse recovers rate, channels, " +
       "frame count, and mean |amplitude|") {
    val samples = Array[Short](0, 16384, -16384, 32767, -32768, 0)
    val wav = wavOf(samples, channels = 2, rate = 8000)
    val (rate, channels, frames, mean) = new MediaDecoder()
      .decode(wav, "audio/wav")
    assert((rate, channels, frames) === ((8000, 2, 3)))
    val expAbs = samples.map(s => math.abs(s.toInt)).sum / 6.0 / 32768.0 * 255.0
    assert(math.abs(mean - expAbs) < 1e-9, s"$mean vs $expAbs")
  }

  test("undecodable or unknown payloads fall back to the stub instead of " +
       "failing the partition (skip-don't-crash)") {
    val dec = new MediaDecoder
    val junk = "not an image at all".getBytes("UTF-8")
    val stub = new MultimodalOps.StubDecoder
    assert(dec.decode(junk, "image/png") === stub.decode(junk))
    assert(dec.decode(junk, "video/mp4") === stub.decode(junk))
    assert(dec.decode(junk, null) === stub.decode(junk))
    // truncated wav header
    assert(dec.decode("RIFFxxxx".getBytes, "audio/wav") ===
      stub.decode("RIFFxxxx".getBytes))
  }

  test("extractFeatures routes by MIME: real png dimensions for image " +
       "rows, stub features for video rows — one decoder per partition") {
    val png = pngOf(24, 12, (x, y) => (x + y) % 256)
    val junk = "0123456789abcdef".getBytes("UTF-8")
    val media = Seq(
      MediaRecord(1L, "image", png, "image/png", null),
      MediaRecord(2L, "video", junk, "video/mp4", null))
      .toDS()
    val out = MultimodalOps.extractFeatures(media)
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).width === 24 && out(1L).height === 12)
    val stubbed = new MultimodalOps.StubDecoder().decode(junk)
    assert((out(2L).width, out(2L).height, out(2L).n_frames,
      out(2L).mean_intensity) === stubbed)
  }

  test("resizeImageNN: integer-exact output dims and source sampling; " +
       "within-budget images pass through; corpus-scale resizeImages " +
       "rewrites image rows only") {
    val dec = new MediaDecoder
    // 20x10 downscaled to max side 16: ow = (20*16+19)/20 = 16,
    // oh = (10*16+19)/20 = 8; out(x,y) = in(x*20/16, y*10/8)
    val png = pngOf(20, 10, (x, y) => (x * 7 + y * 13) % 256)
    val resized = MultimodalOps.resizeImageNN(png, 16).get
    val (w, h, sum) = dec.grayStats(resized).get
    assert((w, h) === ((16, 8)))
    val esum = (for (y <- 0 until 8; x <- 0 until 16)
      yield (((x * 20 / 16) * 7 + (y * 10 / 8) * 13) % 256).toLong).sum
    assert(sum === esum)
    // already small -> unchanged bytes
    val small = pngOf(8, 8, (x, y) => x + y)
    assert(MultimodalOps.resizeImageNN(small, 16).get eq small)
    // dataset pass: image rows resized, video rows untouched
    val media = Seq(
      MediaRecord(1L, "image", png, "image/png", null),
      MediaRecord(2L, "video", png, "video/mp4", null))
      .toDS()
    val out = MultimodalOps.resizeImages(media, 16)
      .collect().map(r => r.media_id -> r.payload).toMap
    assert(dec.grayStats(out(1L)).get._1 === 16)
    assert(java.util.Arrays.equals(out(2L), png)) // non-image untouched
  }

  test("syntheticPcmWav round-trips exactly (the multimodal_audio_stats " +
       "contract: closed-form generator stats == parsed stats)") {
    val dec = new MediaDecoder
    Seq(0L, 3L, 63L, 4999L).foreach { id =>
      val (rate, channels, frames, absSum) =
        dec.pcmStats(MultimodalOps.syntheticPcmWav(id)).get
      val en = 64 + (id % 64).toInt
      val esum = (0 until en).map(i =>
        math.abs((id * 7919 + i.toLong * 104729) % 65536 - 32768)).sum
      assert((rate, channels, frames, absSum) === ((8000, 1, en, esum)))
    }
  }

  test("syntheticGrayPng round-trips exactly (the multimodal_image_stats " +
       "contract: closed-form generator stats == decoded stats)") {
    val dec = new MediaDecoder
    Seq(0L, 7L, 123L, 4999L).foreach { id =>
      val (w, h, sum) = dec.grayStats(MultimodalOps.syntheticGrayPng(id)).get
      val ew = 16 + (id % 16).toInt
      val eh = 16 + (id % 8).toInt
      val esum = (for (y <- 0 until eh; x <- 0 until ew)
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert((w, h, sum) === ((ew, eh, esum)))
    }
  }

  test("aHash64: 8x8 image hashes bit-for-bit per the above-mean rule") {
    val dec = new MediaDecoder
    // gray(x, y) = 10 + x: mean = 13.5 over each row, so columns 4..7
    // (values 14..17) are above the row-constant mean in every row
    val sig = dec.aHash64(pngOf(8, 8, (x, _) => 10 + x)).get
    val expected = (0 until 64).filter(b => b % 8 >= 4)
      .foldLeft(0L)((acc, b) => acc | (1L << b))
    assert(sig === expected)
  }

  test("aHash64 is invariant to uniform brightness shift and to NN " +
       "upscaling, the two invariances that make it perceptual") {
    val dec = new MediaDecoder
    def pat(x: Int, y: Int) = (x * 29 + y * 17) % 97
    val base = dec.aHash64(pngOf(8, 8, pat)).get
    val brighter = dec.aHash64(pngOf(8, 8, (x, y) => pat(x, y) + 50)).get
    // 2x NN upscale: pixel (x, y) = pat(x/2, y/2); the 8x8 NN grid of the
    // 16x16 image samples (i*16/8, j*16/8) = (2i, 2j) -> pat(i, j)
    val scaled = dec.aHash64(pngOf(16, 16, (x, y) => pat(x / 2, y / 2))).get
    assert(base === brighter)
    assert(base === scaled)
    assert(dec.aHash64(Array[Byte](1, 2, 3)) === None)
  }

  test("hammingNearDups over aHash finds the exact-dup stride-256 pairs " +
       "and a one-bit perturbation, not the inverted image") {
    val dec = new MediaDecoder
    def pat(x: Int, y: Int) = (x * 29 + y * 17) % 97
    val rows = Seq(
      1L -> pngOf(8, 8, pat),
      2L -> pngOf(8, 8, pat), // identical -> hamming 0
      // push one below-mean pixel far above the mean: flips ~1 bit
      3L -> pngOf(8, 8, (x, y) => if (x == 0 && y == 0) 255 else pat(x, y)),
      4L -> pngOf(8, 8, (x, y) => 96 - pat(x, y)) // inverted pattern
    ).map { case (id, png) => (id, dec.aHash64(png).get) }
    val sigs = rows.toDF("media_id", "ahash")
    val pairs = graft.ops.DedupOps
      .hammingNearDups(sigs, "media_id", "ahash", maxHamming = 8)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Int]("hamming")).toMap
    assert(pairs((1L, 2L)) === 0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 8)
    // the inverted image shares no 16-bit band with the others
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }
}
