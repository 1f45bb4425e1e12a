package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract /
  * frame-sample as batched per-partition transforms.
  *
  * The actual codecs are NOT in this container, so the decode kernels are
  * deterministic STUBS (clearly marked) — what is real and tested is the
  * Spark-side shape: schema, batch iteration, partition parallelism, and the
  * narrow no-shuffle plan. At scale the stub body is swapped for a JNI/
  * process-pool codec; nothing else changes.
  *
  * Scala-native counterpart of a Pandas-UDF/mapInPandas pipeline: a typed
  * `mapPartitions` gives the same batch-at-a-time execution shape without
  * Python interop.
  */
object BinaryOps {

  case class MediaMeta(url: String, kind: String, n_bytes: Long, magic: String)
  case class MediaFeature(url: String, kind: String, feature: Array[Float], frames: Int)

  /** Sniff payload kind from magic bytes — real logic, no codec needed. */
  def sniffKind(bytes: Array[Byte]): String = {
    def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "image/png"
    else if (at(0) == 0xff && at(1) == 0xd8) "image/jpeg"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F') "audio/wav"
    else if (at(4) == 'f' && at(5) == 't' && at(6) == 'y' && at(7) == 'p') "video/mp4"
    else if (at(0) == '<') "text/html"
    else "application/octet-stream"
  }

  /** Metadata extraction over a (url, payload binary) DataFrame: narrow,
    * codegen-friendly where possible, mapPartitions for the sniffing. */
  def extractMeta(df: DataFrame, urlCol: String = "url", binCol: String = "html"): Dataset[MediaMeta] = {
    import df.sparkSession.implicits._
    df.select(col(urlCol).as("url"), col(binCol).as("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (url, payload) =>
        MediaMeta(url, sniffKind(payload), payload.length.toLong,
          payload.take(4).map(b => f"${b & 0xff}%02x").mkString)
      })
  }

  /** STUB decode: a real implementation would decode the image/audio and
    * compute an embedding; this deterministic fake hashes fixed-size byte
    * windows into a feature vector so the pipeline (batching, schema,
    * downstream ANN joins) is fully exercisable. Marked per the builder
    * contract: replace body with the real codec at deployment. */
  def stubDecodeFeature(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    // ??? real codec goes here; deterministic fake below
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += ((payload(i) & 0xff) - 128) / 128.0f
      i += 1
    }
    val n = math.sqrt(out.map(x => x.toDouble * x).sum)
    if (n > 0) out.map(x => (x / n).toFloat) else out
  }

  /** Frame sampling shape for video-like payloads: split payload into
    * `frameBytes` windows, keep every `stride`-th, feature per frame.
    * STUB decode per frame, real partition/batch shape. */
  def sampleFrames(payload: Array[Byte], frameBytes: Int = 1024, stride: Int = 4): Seq[Array[Byte]] =
    payload.grouped(frameBytes).zipWithIndex.collect {
      case (frame, idx) if idx % stride == 0 => frame
    }.toSeq

  /** Batched feature extraction: one feature row per input row (images) with
    * frame count for video-likes. Narrow plan — no shuffle. */
  def extractFeatures(df: DataFrame, urlCol: String = "url", binCol: String = "html",
                      dim: Int = 8): Dataset[MediaFeature] = {
    import df.sparkSession.implicits._
    df.select(col(urlCol).as("url"), col(binCol).as("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (url, payload) =>
        val kind = sniffKind(payload)
        val frames = if (kind.startsWith("video")) sampleFrames(payload) else Seq(payload)
        val feats = frames.map(stubDecodeFeature(_, dim))
        // mean-pool frame features
        val pooled = new Array[Float](dim)
        feats.foreach(f => (0 until dim).foreach(i => pooled(i) += f(i) / feats.size))
        MediaFeature(url, kind, pooled, frames.size)
      })
  }
}
