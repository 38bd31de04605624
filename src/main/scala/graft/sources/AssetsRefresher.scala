package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.gold.GoldViews
import graft.sink.ParquetSink

/** S4's refresh schedule — the reference materializes the asset-price
  * feed with `REFRESH EVERY 1 DAY` (README.md:293-310). Spark-first:
  * a rate-source streaming query is the clock (one micro-batch per
  * trigger interval — no hand-rolled timer threads); each tick pulls
  * the feed document, runs the explode(items) loader, and atomically
  * replaces the dimension snapshot, so gold-layer readers always join
  * against a complete image.
  *
  * `fetch` abstracts the HTTP GET returning the raw `{"items":[...]}`
  * body as a one-row `payload` DataFrame — production wraps an HTTP
  * client; the zero-egress tests pass a stub. The first tick fires
  * immediately (initial load), then every `every`.
  */
object AssetsRefresher {

  def start(
      spark: SparkSession,
      fetch: () => DataFrame,
      tablePath: String,
      every: String = "1 day",
      checkpointLocation: Option[String] = None): StreamingQuery = {
    // The rate rows are only a heartbeat; the refresh reads the feed.
    val ticks = spark.readStream.format("rate")
      .option("rowsPerSecond", 1).load()
    val writer = ticks.writeStream
      .trigger(Trigger.ProcessingTime(every))
      .foreachBatch { (_: DataFrame, _: Long) =>
        ParquetSink.replaceSnapshot(
          GoldViews.loadAssetsFromJson(fetch()), tablePath)
      }
    checkpointLocation.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }
}
