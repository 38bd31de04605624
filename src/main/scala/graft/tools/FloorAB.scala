package graft.tools

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical A/B for the AQE small-partition floor (VERDICT r10 #1).
  *
  * Part 1 (`partitions`): how many DISTINCT tasks actually execute a
  * byte-small fan-out under each (floor, repartition-style) combo —
  * `repartition(col)` (REPARTITION_BY_COL, AQE-coalescible) vs
  * `repartition(N, col)` (REPARTITION_BY_NUM, which AQE must respect).
  * This decides whether the global `minPartitionSize=1b` in
  * `Tables.tune` can be replaced by explicit-N at the fan-out seams.
  *
  * Part 2 (`time`): warm timings of the four VERDICT-weak queries plus
  * two controls in a bench-shaped session (all queries run once to
  * populate the codegen cache, then targets timed) under floor=1b vs
  * floor=1m, same session, conf flipped between passes.
  */
object FloorAB {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("partitions")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def distinctTasks(df: org.apache.spark.sql.DataFrame): Long =
      df.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        it.map(_ => pid)
      }(org.apache.spark.sql.Encoders.scalaInt)
        .distinct().count()

    if (mode == "partitions") {
      // 5000 tiny rows ~ a few hundred KB: the byte-small/CPU-heavy shape
      val base = spark.range(5000).select(col("id").as("doc_id"),
        md5(col("id").cast("string")).as("payload"))
      for (floor <- Seq("1b", "1048576b")) {
        spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.minPartitionSize", floor)
        val byCol = distinctTasks(base.repartition(col("doc_id")))
        val byNum = distinctTasks(base.repartition(32, col("doc_id")))
        println(s"floor=$floor  repartition(col)=$byCol tasks  " +
          s"repartition(32,col)=$byNum tasks")
      }
      spark.stop(); return
    }

    // mode == "time": bench-shaped session. Warm pass over every bench
    // query (sorted order, like Bench), then per-floor timed passes over
    // the six adjudication targets.
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val targets = Seq("w_value_deciles", "t_quality_percentiles",
      "t_seq_pack", "w_rolling_7d", "w_sessionize", "w_range_join",
      "mm_frame_sample") // mm_: the fan-out family the floor was FOR —
                         // must stay fast under BOTH floors (explicit-N)
    val all = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => !graft.SparkEntry.correctnessOnly(n) }
    spark.range(1000).selectExpr("sum(id)").collect()
    all.foreach { case (n, fn) =>
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        System.err.println(s"[warm] $n failed: $e") }
      graft.QueryCaches.releaseAll(); spark.catalog.clearCache()
    }
    def timeOne(name: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      graft.QueryCaches.releaseAll(); spark.catalog.clearCache()
      t
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "3").toInt
    if (mode == "fanout") {
      // Per-query fan-out A/B at the DEFAULT floor: is the explicit
      // repartition shuffle worth it for each query's CPU stage? Run
      // EVERY bench query warm in both modes; the per-site keep/drop
      // decision is made on this data.
      val names = all.map(_._1)
      def pass(off: Boolean): Map[String, Double] = {
        sys.props("graft.fanout.off") = off.toString
        names.map { n =>
          val ts = (1 to reps).map(_ => timeOne(n))
          n -> ts.min
        }.toMap
      }
      val on = pass(off = false)
      val off = pass(off = true)
      val on2 = pass(off = false) // order control
      println("query,fanout_on,fanout_off,fanout_on2")
      names.foreach { n =>
        println(f"$n,${on(n)}%.3f,${off(n)}%.3f,${on2(n)}%.3f")
      }
      spark.stop(); return
    }
    for (floor <- Seq("1b", "1048576b", "1b")) { // 1b twice: order control
      sys.props("graft.aqe.minPartitionSize") = floor
      val times = targets.map { n =>
        val ts = (1 to reps).map(_ => timeOne(n))
        n -> ts.min
      }
      println(s"floor=$floor  " +
        times.map { case (n, t) => f"$n=$t%.3f" }.mkString("  "))
    }
    spark.stop()
  }
}
