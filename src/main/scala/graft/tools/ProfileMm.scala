package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off stage profiler for the frame-series pipeline: times each
  * lineage prefix so the hot stage is measured, not guessed. */
object ProfileMm {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.Multimodal._
    def time(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$label rep$i: ${(System.nanoTime() - t0) / 1e9}%.2fs n=$n")
      }
    }
    time("mediaTable")(mediaTable(spark, dir).count())
    val media = mediaTable(spark, dir)
    time("encodeFrameSeries")(encodeFrameSeries(media).count())
    val series = encodeFrameSeries(media)
    time("sampleFrameSeries")(sampleFrameSeries(series).count())
    time("series.rdd.partitions")(
      encodeFrameSeries(media).rdd.getNumPartitions.toLong)
    // explicit-N repartition: is AQE the thing undoing the fan-out?
    import org.apache.spark.sql.functions.col
    val media32 = mediaTable(spark, dir)
      .repartition(32, col("doc_id")).as[graft.llm.Multimodal.MediaRow](
        org.apache.spark.sql.Encoders.product[graft.llm.Multimodal.MediaRow])
    time("encode32")(encodeFrameSeries(media32).count())
    time("sample32")(sampleFrameSeries(encodeFrameSeries(media32)).count())
    time("series32.partitions")(
      encodeFrameSeries(media32).rdd.getNumPartitions.toLong)
    // and the text idiom: does repartition(col) coalesce to 1 there too?
    val vocab = graft.Tables.documents(spark, dir)
      .repartition(32, col("doc_id"))
      .select(org.apache.spark.sql.functions.explode(
        graft.llm.TextAnalysis.tokens(col("text"))).as("t"))
    time("vocab.partitions")(vocab.rdd.getNumPartitions.toLong)
    // ground truth: which task partitions actually execute the codec?
    import spark.implicits._
    def realPids(ds: org.apache.spark.sql.Dataset[_]): Long = {
      val pids = ds.mapPartitions(it =>
        Iterator((org.apache.spark.TaskContext.getPartitionId(), it.size)))(
        org.apache.spark.sql.Encoders.product[(Int, Int)])
        .collect().filter(_._2 > 0)
      println("  nonempty pids: " + pids.sortBy(_._1).mkString(" "))
      pids.length.toLong
    }
    time("series(noN).realPids")(realPids(encodeFrameSeries(media)))
    time("series(32).realPids")(realPids(encodeFrameSeries(media32)))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("series(noN,noAQE).realPids")(realPids(encodeFrameSeries(media)))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
    time("series(noN,minPS=1b).realPids")(realPids(encodeFrameSeries(media)))
    time("encode(minPS=1b)")(encodeFrameSeries(media).count())
    time("sample(minPS=1b)")(
      sampleFrameSeries(encodeFrameSeries(media)).count())
    time("vocab(minPS=1b).realPids")(realPids(vocab))
    spark.stop()
  }
}
