package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal-column handling: media as an opaque `binary` column with
  * typed metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so `decodeFeatures` is a
  * DETERMINISTIC FAKE decoder (clearly marked below) — but the
  * Spark-side plumbing is real and is the part that matters at scale:
  * a typed `Dataset[MediaRow]` with a binary payload + metadata schema,
  * `mapPartitions` batch processing (one decoder init per partition,
  * not per row — the same batch shape a Pandas-UDF/mapInPandas decoder
  * has), and per-row feature extraction that never leaves the executor.
  *
  * Scale design (100 TB): payloads stay opaque bytes end-to-end (no
  * driver collect, no string round-trip); the decode stage is a narrow
  * map so it pipelines with the scan; feature rows are tiny relative to
  * payloads, so downstream shuffles only ever move features.
  */
object Multimodal {

  /** One media object: opaque payload plus typed metadata, the schema a
    * training-data lake stores per image/audio/video asset. */
  final case class MediaRow(
      doc_id: Long, media_type: String, width: Int, height: Int,
      payload: Array[Byte])

  /** Extracted features: byte stats + deterministic frame sampling. */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long, width: Int,
      height: Int, mean_byte: Double, frames_sampled: Long)

  /** Synthesize the media table from `documents`: the UTF-8 bytes of
    * `text` stand in for an encoded image payload; width/height are
    * derived metadata. Deterministic, so the DuckDB oracle can recompute
    * every feature from the same source column. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    documents(spark, dir)
      .select(
        col("doc_id").cast("long").as("doc_id"),
        lit("image/fake").as("media_type"),
        ((col("n_chars") % 64) + 16).cast("int").as("width"),
        (expr("(n_chars DIV 64) % 64") + 16).cast("int").as("height"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Per-partition decode + feature extraction.
    *
    * STUB: a real implementation would initialize an image/audio codec
    * once per partition here and decode `payload`; this container ships
    * no codec, so the "decode" is a deterministic fake — unsigned byte
    * mean over the payload and a stride-16 frame sample count. The
    * iterator shape (init-per-partition, stream rows, no
    * materialization) is exactly what a real decoder needs. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codec init would happen once, here
      rows.map { r =>
        val n = r.payload.length
        var sum = 0L
        var i = 0
        while (i < n) { sum += (r.payload(i) & 0xff); i += 1 }
        val mean = if (n == 0) 0.0 else sum.toDouble / n.toDouble
        MediaFeatures(r.doc_id, r.media_type, n.toLong, r.width, r.height,
          mean, ((n + 15) / 16).toLong)
      }
    }
  }

  /** Declared query: media metadata + extracted features per document.
    * Oracle twin recomputes the byte stats from the ASCII source text
    * (ascii(char) == byte value for this corpus). */
  def mmMediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    decodeFeatures(mediaTable(spark, dir))
      .toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"), col("width"),
        col("height"), col("mean_byte"), col("frames_sampled"))
      .orderBy(col("doc_id"))
  }

  /** Nearest-neighbor resize to a `tw`×`th` grid — binary in, binary
    * out, so the stage composes with [[decodeFeatures]] (and any other
    * media op) without ever leaving the executor.
    *
    * STUB decode as above: the payload is treated as a 1-byte-per-pixel
    * `width`×`height` image (positions past the payload read as 0 —
    * deterministic padding); a real implementation swaps the pixel
    * arithmetic for a codec call, the `mapPartitions` shape and the
    * payload-stays-opaque contract are the real thing. Integer-only
    * index math so an oracle can replay it exactly. */
  def resize(media: Dataset[MediaRow], tw: Int, th: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codec init would happen once, here
      rows.map { r =>
        val out = new Array[Byte](tw * th)
        var y = 0
        while (y < th) {
          val sy = y * r.height / th
          var x = 0
          while (x < tw) {
            val idx = sy * r.width + (x * r.width / tw)
            out(y * tw + x) =
              if (idx < r.payload.length) r.payload(idx) else 0
            x += 1
          }
          y += 1
        }
        MediaRow(r.doc_id, r.media_type, tw, th, out)
      }
    }
  }

  /** One sampled frame: position plus its byte-window mean. */
  final case class FrameSample(doc_id: Long, frame_idx: Long,
      mean_byte: Double)

  /** Frame sampling for "video" payloads: cut the payload into
    * consecutive `frameBytes` windows (full frames only) and keep every
    * `every`-th — the flatMap batch shape of real frame extraction (one
    * input row fans out to 0..n frame rows inside the partition, frames
    * never gather on the driver). `frameBytes` a power of two keeps the
    * window mean exact in both engines. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 64,
      every: Int = 4): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codec init would happen once, here
      rows.flatMap { r =>
        val nFrames = r.payload.length / frameBytes
        Iterator.range(0, nFrames, every).map { f =>
          var sum = 0L
          var i = f * frameBytes
          val end = i + frameBytes
          while (i < end) { sum += (r.payload(i) & 0xff); i += 1 }
          FrameSample(r.doc_id, f.toLong, sum.toDouble / frameBytes)
        }
      }
    }
  }

  /** Declared query: decode → resize 16×16 → feature-extract, the
    * composed media pipeline. Every output is integer-derived (mean
    * over 256 = sum/2^8), so the oracle replays it bit-exactly. */
  def mmResize(spark: SparkSession, dir: String): DataFrame = {
    decodeFeatures(resize(mediaTable(spark, dir), 16, 16))
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        col("mean_byte"))
      .orderBy(col("doc_id"))
  }

  /** Declared query: every 4th 64-byte frame per document, one row per
    * sampled frame. */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame = {
    sampleFrames(mediaTable(spark, dir))
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }
}
