package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sources.ZOrderLayout

/** Quantify the z-order pruning win at a given SF: write the events
  * table 64-file z-clustered and 64-file 1-D-user-clustered, then count
  * files whose (user, day) bounding box intersects a day-narrow 2-D box
  * (the min/max-stat decision a row-group pruner makes).
  * `sbt "runMain graft.tools.ZorderPrune /tmp/sf1"` */
object ZorderPrune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val files = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keyed = ZOrderLayout.keyedEvents(spark, dir)
    val d0 = 0L // keyedEvents rebases day to 0
    val zPath = "/tmp/graft_zprune_z"
    val xPath = "/tmp/graft_zprune_x"
    ZOrderLayout.writeZOrdered(keyed, zPath, files)
    ZOrderLayout.writeLinear(keyed, xPath, files)
    Seq(1L, 3L, 7L).foreach { span =>
      val (zt, zn) =
        ZOrderLayout.filesTouched(spark, zPath, 0L, 65535L, d0, d0 + span)
      val (xt, xn) =
        ZOrderLayout.filesTouched(spark, xPath, 0L, 65535L, d0, d0 + span)
      println(s"day-span=${span + 1}: zorder $zn/$zt files, " +
        s"user-sort $xn/$xt files")
    }
    spark.stop()
  }
}
