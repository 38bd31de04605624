package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone full-cascade ingest timing (the bench's cascade section
  * in isolation, repeatable): chained rich blocks → checkpointed
  * Structured Streaming runner writing every bronze table + the silver
  * MV cascade + resolver state per micro-batch. */
object CascadeBench {
  def main(args: Array[String]): Unit = {
    val nBlocks = sys.env.getOrElse("SPARK_GRAFT_CASCADE_BLOCKS", "2000").toInt
    val perFile = sys.env.getOrElse("SPARK_GRAFT_CASCADE_PER_FILE", "100").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def loadAvg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // Spark-job counter (r17): the cascade's residual cost is the
    // per-micro-batch driver constant (~50 ms/job at local scale), so
    // the JOB COUNT is the deterministic, weather-independent metric a
    // job-cut optimization is judged by — wall clock on a noisy box is
    // not.
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet(): Unit
      })
    (1 to reps).foreach { r =>
      val base = java.nio.file.Files
        .createTempDirectory("graft_casbench").toString
      graft.sources.BlockFileSource.writeBlockFilesChunked(
        spark, graft.fixtures.BlockGen.genBlocks(nBlocks, rich = true),
        s"$base/blocks", perFile)
      val l0 = loadAvg
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      graft.streaming.StreamRunner.runStream(spark, s"$base/blocks", s"$base/wh")
      val bps = nBlocks / ((System.nanoTime() - t0) / 1e9)
      println(f"cascade rep$r: $bps%.1f blocks/s, jobs ${jobs.get() - j0}%d " +
        f"(load $l0%.2f -> $loadAvg%.2f)")
      graft.sink.ParquetSink.delete(new java.io.File(base))
    }
    spark.stop()
  }
}
