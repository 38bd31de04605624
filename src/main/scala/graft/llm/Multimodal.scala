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
}
