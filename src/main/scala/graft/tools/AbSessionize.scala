package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** In-session A/B of the two batch sessionization implementations
  * (r17: window rewrite vs the stateFn typed path) — alternating reps
  * in one warmed session so codegen/JIT weather cancels out. */
object AbSessionize {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val gapUs = 30L * 60L * 1000000L
    def evs = graft.Tables.events(spark, dir)
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"),
        col("event_id"))
      .as[graft.streaming.Sessionize.Ev]
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3fs rows=$n")
    }
    // untimed warm-up of both paths
    graft.streaming.Sessionize.sessionsBatch(evs, gapUs).count()
    graft.streaming.Sessionize.sessionsBatchWindow(evs, gapUs).count()
    (1 to reps).foreach { r =>
      time(s"stateFn  rep$r")(
        graft.streaming.Sessionize.sessionsBatch(evs, gapUs).count())
      time(s"window   rep$r")(
        graft.streaming.Sessionize.sessionsBatchWindow(evs, gapUs).count())
    }
    spark.stop()
  }
}
