package graft.metrics

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Metrics sink (SURVEY §2.2 K5) — the Spark-native analog of the
  * reference's Prometheus counters (indexer-common/src/metrics.rs:36-88):
  * rows-processed counters per asset type collected with Spark's
  * `observe` API (zero extra actions — metrics ride the existing job),
  * gathered by a QueryExecutionListener, and rendered in the Prometheus
  * text exposition format the reference's `/metrics` endpoint serves.
  * [[MetricsServer]] serves it over HTTP with optional basic auth.
  */
object Metrics {

  private val counters = new ConcurrentHashMap[String, Long]()

  /** Attach named row counters to a DataFrame; they are recorded when
    * any action runs the plan. */
  def observed(df: DataFrame, metricPrefix: String): DataFrame =
    observedAgg(df, metricPrefix,
      count(lit(1)).as(s"${metricPrefix}_rows_total"))

  private val obsSeq = new AtomicLong()

  /** Attach arbitrary aggregate counters (each a LongType aggregate with
    * a stable alias — the alias IS the Prometheus counter name). The
    * observation name is made unique per call so the same operator can
    * appear more than once inside one query plan; the listener merges
    * values BY FIELD NAME, so repeated attachments sum into one counter,
    * exactly like a Prometheus counter labelled per operator. */
  def observedAgg(df: DataFrame, group: String, metrics: Column*): DataFrame =
    df.observe(s"graft_${group}_${obsSeq.incrementAndGet()}",
      metrics.head, metrics.tail: _*)

  /** Install the collector once per session (idempotent). */
  def install(spark: SparkSession): Unit = synchronized {
    if (!installed.contains(spark)) {
      spark.listenerManager.register(listener)
      installed += spark
    }
  }

  private val installed = scala.collection.mutable.Set.empty[SparkSession]

  private val listener: QueryExecutionListener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = {
      qe.observedMetrics.foreach { case (name, row) =>
        if (name.startsWith("graft_")) {
          row.schema.fieldNames.zipWithIndex.foreach { case (f, i) =>
            if (!row.isNullAt(i)) {
              counters.merge(f, row.getLong(i), (a, b) => a + b): Unit
            }
          }
        }
      }
    }
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()
  }

  def snapshot(): Map[String, Long] = counters.asScala.toMap

  def reset(): Unit = counters.clear()

  /** Prometheus text exposition format (metrics.rs serves the same). */
  def renderPrometheus(): String =
    snapshot().toSeq.sortBy(_._1).map { case (k, v) =>
      s"# TYPE $k counter\n$k $v"
    }.mkString("", "\n", "\n")
}
