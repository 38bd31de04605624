package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, LongType, StringType,
  StructField, StructType}
import graft.sink.ParquetSink

/** Incremental ANOMALY detection: the (event_type, epoch_day) daily
  * count grid maintained as a summing MV while events stream in, with
  * the integer-exact 2σ read applied on top — the data-quality tripwire
  * ([[graft.queries.EventQueries.wAnomalyZscore]]) kept hot
  * incrementally (reference analog: incremental MVs over the insert
  * stream, `indexer-clickhouse/init/02-silver-tables.sql`).
  *
  * The MV state is the daily COUNT grid — integer-additive, so order-
  * and replay-independent, exactly the additive-state contract the
  * summing sink requires (the detection itself makes poor sink state:
  * one new day shifts every day's z-score; the grid absorbs any
  * late/replayed row and the read costs O(days × types), not
  * O(events)). Detection at read reuses THE shared detector
  * [[graft.queries.EventQueries.anomalyFromDaily]] — one test, two
  * grid builders, so the streamed MV cannot drift from the batch
  * query.
  */
object StreamingAnomaly {

  private val NanosPerDay = 86400L * 1000000000L
  private val eventSchema = StructType(Seq(
    StructField("doc_id", LongType), // event_id; the feed writer keys on doc_id
    StructField("ts", LongType), // epoch nanos (feed carries the normalized Long)
    StructField("event_type", StringType),
    StructField("value", DoubleType)))
  private val keys = Seq("event_type", "epoch_day")
  private val sums = Seq("day_count")

  /** Drain every unseen chunk file (Trigger.AvailableNow, resumable
    * checkpoint), folding each micro-batch into the daily count grid. */
  def runStream(spark: SparkSession, feedDir: String,
      warehouse: String): Unit = {
    val gridPath = s"$warehouse/anomaly_summed"
    val query = StreamingDedup.readDocStream(spark, feedDir, eventSchema)
      .writeStream
      .option("checkpointLocation", s"$warehouse/_anomaly_checkpoint")
      .foreachBatch { (b: DataFrame, _: Long) =>
        val batch = b.localCheckpoint()
        if (!batch.isEmpty) {
          val maxId = batch.agg(max(col("doc_id"))).collect()(0).getLong(0)
          val partial = batch
            .withColumn("epoch_day", expr(s"ts DIV ${NanosPerDay}L"))
            .groupBy(col("event_type"), col("epoch_day"))
            .agg(count(lit(1)).as("day_count"))
            .withColumn("block_height", col("epoch_day"))
          ParquetSink.writeSummedBatch(partial, gridPath, maxId, keys)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }

  /** Declared query (`w_stream_anomaly`): stream the events table
    * through the incremental grid — two chunks, a mid-stream restart
    * from the same checkpoint (only unseen chunks replay), a compaction
    * MERGE between the two runs — then the shared integer-exact 2σ
    * detector over the summed grid. Equals the batch
    * [[graft.queries.EventQueries.wAnomalyZscore]] and shares its
    * oracle. Correctness-only: its cost is micro-batch orchestration,
    * not data volume. */
  def wStreamAnomaly(spark: SparkSession, dir: String,
      nChunks: Int = 5): DataFrame =
    graft.queries.EventQueries.anomalyFromDaily(
      streamedGrid(spark, dir, "anomaly", nChunks))

  /** Declared query (`w_stream_anomaly_mad`): the ROBUST detector over
    * the SAME incrementally-summed daily grid — the median/MAD read is
    * not additive (a new day can move both medians), but its input
    * grid is, so the MV is shared-shape with the z-score twin and the
    * detection runs at read through THE shared
    * [[graft.queries.EventQueries.madFromDaily]]. Equals the batch
    * `w_anomaly_mad` and shares its oracle. */
  def wStreamAnomalyMad(spark: SparkSession, dir: String,
      nChunks: Int = 5): DataFrame =
    graft.queries.EventQueries.madFromDaily(
      streamedGrid(spark, dir, "anomaly_mad", nChunks))

  /** Stream the events table into the daily-count summing MV (two
    * chunks, mid-stream restart from the same checkpoint, a compaction
    * MERGE between runs) and return the accumulated grid — shared by
    * both anomaly twins. */
  private def streamedGrid(spark: SparkSession, dir: String, tag: String,
      nChunks: Int): DataFrame = {
    graft.Tables.tune(spark)
    val feed = StreamingDedup.freshDir(s"${tag}_feed")
    val warehouse = StreamingDedup.freshDir(s"${tag}_wh")
    val evs = graft.Tables.events(spark, dir)
      .select(col("event_id").as("doc_id"), col("ts"), col("event_type"),
        col("value"))
    StreamingDedup.writeDocChunks(spark, evs, feed, nChunks,
      takeChunks = 2, schema = eventSchema)
    runStream(spark, feed, warehouse)
    ParquetSink.compactSummed(spark, s"$warehouse/anomaly_summed", keys, sums)
    StreamingDedup.writeDocChunks(spark, evs, feed, nChunks,
      schema = eventSchema)
    runStream(spark, feed, warehouse)
    ParquetSink.readSummed(
      spark.read.parquet(s"$warehouse/anomaly_summed"), keys, sums)
      .select(col("event_type"), col("epoch_day"), col("day_count"))
  }

  /** The shared-detector read over the accumulated summed grid —
    * shared by the declared query and the randomized soak. */
  def readAnomalies(spark: SparkSession, warehouse: String): DataFrame = {
    val grid = ParquetSink.readSummed(
      spark.read.parquet(s"$warehouse/anomaly_summed"), keys, sums)
      .select(col("event_type"), col("epoch_day"), col("day_count"))
    graft.queries.EventQueries.anomalyFromDaily(grid)
  }
}
