package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.{AccountsConfig, Block, NearModel}

/** Micro-batch driver for the streaming path: blocks arrive one per
  * micro-batch in height order (the reference's buffer_unordered(1)
  * strictly-sequential contract, indexer-clickhouse/src/handlers/
  * mod.rs:31-40), each folded through
  * [[StreamingResolver.processBatch]].
  *
  * [[runMicroBatched]] drives the fold directly (deterministic, used by
  * the correctness gate); the ScalaTest suite additionally wires the
  * same fold through a real MemoryStream + foreachBatch query to prove
  * the Structured Streaming integration. In production the source
  * would be `readStream` over block files with maxFilesPerTrigger=1
  * (SURVEY §2.1 S1/S2) and the state/events tables would be written
  * via [[graft.sink.ParquetSink]] each batch.
  */
object StreamRunner {

  /** Fold the blocks one-per-micro-batch; returns the accumulated
    * resolved bronze events exactly as the stream emitted them. */
  def runMicroBatched(
      spark: SparkSession,
      blocks: Seq[Block],
      accounts: AccountsConfig = AccountsConfig(),
      ttlBlocks: Long = NearModel.TtlBlocks): DataFrame = {
    import spark.implicits._
    var state = StreamingResolver.emptyState(spark)
    val batches = blocks.sortBy(_.header.height).map { block =>
      val (st2, events) = StreamingResolver.processBatch(
        state, spark.createDataset(Seq(block)).toDF(), accounts, ttlBlocks)
      state = st2
      events.localCheckpoint()
    }
    batches.reduce(_ unionByName _)
  }
}
