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

  /** Latest values per OBSERVATION NAME (one entry per observedAgg
    * attachment): re-running the same plan in another action re-reports
    * the same name and overwrites — counters are action-idempotent —
    * while distinct attachments (unique names) sum at [[snapshot]].
    * Without this, a caller running N actions over one observed plan
    * (the batch runner executes its resolve subtree ~5 times) would
    * inflate every counter N-fold. */
  private val observations =
    new ConcurrentHashMap[String, Map[String, Long]]()

  /** Attach named row counters to a DataFrame; they are recorded when
    * any action runs the plan. */
  def observed(df: DataFrame, metricPrefix: String): DataFrame =
    observedAgg(df, metricPrefix,
      count(lit(1)).as(s"${metricPrefix}_rows_total"))

  private val obsSeq = new AtomicLong()

  /** Attach arbitrary aggregate counters (each a LongType aggregate with
    * a stable alias — the alias IS the Prometheus counter name). The
    * observation name is made unique per call so the same operator can
    * appear more than once inside one query plan; the rendered counter
    * sums the latest value of every attachment sharing the field name,
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
          val values = row.schema.fieldNames.zipWithIndex.flatMap {
            case (f, i) =>
              if (row.isNullAt(i)) None else Some(f -> row.getLong(i))
          }.toMap
          observations.put(name, values): Unit
        }
      }
    }
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()
  }

  /** Field name → sum over the latest value of each attachment. */
  def snapshot(): Map[String, Long] =
    observations.asScala.values.flatten
      .groupBy(_._1).map { case (f, kvs) => f -> kvs.map(_._2).sum }

  def reset(): Unit = observations.clear()

  /** Prometheus text exposition format (metrics.rs serves the same). */
  def renderPrometheus(): String =
    snapshot().toSeq.sortBy(_._1).map { case (k, v) =>
      s"# TYPE $k counter\n$k $v"
    }.mkString("", "\n", "\n")
}
