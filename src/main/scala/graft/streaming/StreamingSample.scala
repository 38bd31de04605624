package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}
import graft.sink.ParquetSink

/** Streaming twin for priority sampling (`t_stream_sample_priority`).
  *
  * A bottom-k-by-priority panel is NOT additive — one newly arrived
  * heavy doc can evict the current k-th member of its language — but it
  * IS a pure function of the fact SET (doc_id, lang, n_chars), and
  * those facts are append-only: a document's weight never changes. So
  * the MV is the fact log itself under PK FINAL (the
  * [[StreamingEventLog]] / [[StreamingSpans]] read-time-aggregation
  * contract) and the SHARED two-phase bottom-k
  * ([[graft.llm.TextAnalysis.samplePriorityFromFacts]]) runs at read —
  * identical oracle to the batch twin, replay-idempotent by key.
  *
  * Run shape: checkpointed file stream, two chunks, STOP, compaction,
  * then the full feed against the same checkpoint (the mid-stream
  * restart) — the suite additionally pins streamed ≡ batch at sf0.001.
  */
object StreamingSample {

  private val feedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n_chars", LongType)))

  /** Append-only (doc_id, lang, n_chars) fact stream under PK FINAL. */
  def runFactsStream(spark: SparkSession, feedDir: String,
      warehouse: String): Unit = {
    val path = s"$warehouse/sample_facts"
    val query = StreamingDedup.readDocStream(spark, feedDir, feedSchema)
      .writeStream
      .option("checkpointLocation", s"$warehouse/_facts_checkpoint")
      .foreachBatch { (b: DataFrame, _: Long) =>
        val batch = b.localCheckpoint()
        if (!batch.isEmpty) {
          val maxId = batch.agg(max(col("doc_id"))).collect()(0).getLong(0)
          ParquetSink.writeBatch(
            batch.withColumn("block_height", col("doc_id")),
            path, maxId, Seq("doc_id"))
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }

  /** Declared query (`t_stream_sample_priority`) — equals the batch
    * [[graft.llm.TextAnalysis.tSamplePriority]] and shares its oracle.
    * Correctness-only: its cost is micro-batch orchestration. */
  def tStreamSamplePriority(spark: SparkSession, dir: String,
      nChunks: Int = 5): DataFrame = {
    graft.Tables.tune(spark)
    val feed = StreamingDedup.freshDir("sample_feed")
    val warehouse = StreamingDedup.freshDir("sample_wh")
    val facts = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    StreamingDedup.writeDocChunks(spark, facts, feed, nChunks,
      takeChunks = 2, schema = feedSchema)
    runFactsStream(spark, feed, warehouse)
    ParquetSink.compact(spark, s"$warehouse/sample_facts", Seq("doc_id"))
    StreamingDedup.writeDocChunks(spark, facts, feed, nChunks,
      schema = feedSchema)
    runFactsStream(spark, feed, warehouse)
    val log = ParquetSink.readFinal(
      spark.read.parquet(s"$warehouse/sample_facts"), Seq("doc_id"))
    graft.llm.TextAnalysis.samplePriorityFromFacts(
      log.select(col("doc_id"), col("lang"), col("n_chars")))
  }
}
