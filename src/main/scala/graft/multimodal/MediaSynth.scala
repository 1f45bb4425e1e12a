package graft.multimodal

import java.io.ByteArrayOutputStream

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic media payloads for the multimodal pipeline: real
  * PNG images (encoded with the JDK's javax.imageio — no external codec),
  * real RIFF/WAVE 16-bit mono PCM audio, and mp4-shaped stub blobs (a real
  * video codec is not available in this container). Seeded and
  * self-contained: the decode specs assert exact pixel / sample roundtrips
  * against the generator's ground truth.
  */
object MediaSynth {

  /** Seeded RGB pixel value for (seed, x, y) — the generator/decoder shared
    * ground truth. */
  def pixel(seed: Long, x: Int, y: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.productHash((seed, x, y))
    h & 0xffffff
  }

  /** Real PNG bytes of a w×h image with [[pixel]] ground-truth content.
    * PNG is lossless: decode returns the exact pixels. */
  def pngBytes(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixel(seed, x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Seeded 16-bit sample value for (seed, i). */
  def sample(seed: Long, i: Int): Short =
    (scala.util.hashing.MurmurHash3.productHash((seed, i)) & 0xffff).toShort

  /** Real canonical RIFF/WAVE bytes: 16-bit mono PCM, [[sample]] content. */
  def wavBytes(seed: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) { buf.putShort(sample(seed, i)); i += 1 }
    buf.array()
  }

  /** mp4-shaped stub blob (valid `ftyp` box header + seeded bytes) — a real
    * video codec is not in this container; the frame-sampling path treats
    * the payload as opaque frames. */
  def mp4StubBytes(seed: Long, nBytes: Int): Array[Byte] = {
    val rnd = new Random(seed)
    val out = new Array[Byte](nBytes max 16)
    rnd.nextBytes(out)
    val header = Array[Byte](0, 0, 0, 16, 'f', 't', 'y', 'p', 'i', 's', 'o', 'm')
    System.arraycopy(header, 0, out, 0, header.length)
    out
  }

  /** Mixed media table (url, payload): nPerKind PNGs, WAVs and mp4 stubs. */
  def mediaTable(spark: SparkSession, nPerKind: Int, seed: Long = 42L,
                 numPartitions: Int = 8): DataFrame = {
    import spark.implicits._
    val rows = (0 until nPerKind).flatMap { i =>
      Seq(
        (f"media://img/$i%05d.png", pngBytes(seed + i, 8 + i % 16, 8 + (i * 3) % 16)),
        (f"media://aud/$i%05d.wav", wavBytes(seed + i, 200 + (i * 37) % 400)),
        (f"media://vid/$i%05d.mp4", mp4StubBytes(seed + i, 4096 + (i * 131) % 4096)))
    }
    spark.createDataset(rows).toDF("url", "payload").repartition(numPartitions)
  }
}
