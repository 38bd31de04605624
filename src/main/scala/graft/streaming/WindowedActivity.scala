package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time tumbling-window aggregation with a watermark — the
  * `readStream → withWatermark → window → agg` shape (batch analytic
  * twin: EventQueries.gHourlyActivity, which buckets the same
  * boundaries by integer arithmetic).
  *
  * Works identically over a batch DataFrame (watermark is a no-op) and
  * a streaming one (late data beyond 1 hour is dropped and closed
  * windows emit incrementally). Window boundaries are epoch-aligned, so
  * `window.start == hour_bucket` of the batch twin. */
object WindowedActivity {

  /** @param events DataFrame with `ts` (epoch nanos, Long) and
    *               `event_type` — the driver corpus events schema. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"))
}
