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

  /** Real PNG bytes of a w×h truecolor image with [[pixel]] ground-truth
    * content — hand-assembled with a zlib STORED-block IDAT instead of
    * ImageIO's deflate so the raw scanlines sit at fixed byte offsets inside
    * the blob. That choice is what lets the driver's DuckDB oracle re-derive
    * the decode features from the SAME bytes the Spark side decodes (a
    * second engine cannot run ImageIO, but it can address
    * offset 48 + y·(1+3w) + 1 + 3x for pixel (x,y)): signature(8) +
    * IHDR chunk(25) + IDAT len/type(8) + zlib header(2) + stored-block
    * header(5) = 48, one filter-0 byte per scanline. Still a fully valid
    * PNG — ImageIO decodes it, and MediaDecodeSpec pins the decode
    * pixel-exact. Stored deflate caps one block at 65535 bytes; fixture
    * images are <= 24×24 (1752 raw bytes), enforced below. */
  def pngBytes(seed: Long, w: Int, h: Int): Array[Byte] = {
    val raw = new Array[Byte](h * (1 + 3 * w))
    var p = 0
    var y = 0
    while (y < h) {
      raw(p) = 0 // filter type None
      p += 1
      var x = 0
      while (x < w) {
        val px = pixel(seed, x, y)
        raw(p) = (px >> 16).toByte; raw(p + 1) = (px >> 8).toByte; raw(p + 2) = px.toByte
        p += 3
        x += 1
      }
      y += 1
    }
    require(raw.length <= 0xffff,
      s"stored-deflate fixture encoder holds one block: ${w}x$h exceeds 65535 raw bytes")

    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val t = typ.getBytes("US-ASCII")
      crc.update(t); crc.update(data)
      java.nio.ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter 0, no interlace
      .array()
    val adler = new java.util.zip.Adler32()
    adler.update(raw)
    val idat = java.nio.ByteBuffer.allocate(2 + 5 + raw.length + 4)
      .put(0x78.toByte).put(0x01.toByte) // zlib CMF/FLG (30721 % 31 == 0)
      .put(0x01.toByte)                  // BFINAL=1, BTYPE=00 (stored)
      .put((raw.length & 0xff).toByte).put(((raw.length >> 8) & 0xff).toByte)
      .put((~raw.length & 0xff).toByte).put(((~raw.length >> 8) & 0xff).toByte)
      .put(raw)
      .putInt(adler.getValue.toInt)
      .array()
    val bos = new ByteArrayOutputStream()
    bos.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    bos.write(chunk("IHDR", ihdr))
    bos.write(chunk("IDAT", idat))
    bos.write(chunk("IEND", Array.emptyByteArray))
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
    // The DuckDB decode oracle enumerates candidate frames with range(64)
    // and prunes by `f*1024 < n_bytes` (SparkEntry.VIDEO_F0); a blob past
    // 64 KiB would silently lose frames oracle-side and fail the driver
    // gate on a correct engine — same fixture-coupled-bound class as the
    // PNG 65535-byte stored-deflate guard above, so guard it the same way.
    require(nBytes <= 64 * 1024,
      s"video stub fixtures are capped at 65536 bytes (oracle frame bound): got $nBytes")
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
