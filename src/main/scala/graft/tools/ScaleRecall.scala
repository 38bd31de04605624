package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off evidence tool: measure banded-LSH near-dup recall against
  * the EXACT all-pairs answer computed in Spark itself (the DuckDB
  * all-pairs oracle is only tractable at the sf0.01 gate; this runs the
  * same comparison at 10× using the grid-partitioned self-join shape,
  * so the exact side is parallel and bounded per task).
  *
  * `sbt "runMain graft.tools.ScaleRecall"` — prints exact/LSH pair
  * counts and any missed or spurious pairs. Recorded in
  * SCALE_CHECK_r05.md. */
object ScaleRecall {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.tune(spark)
    val threshold = 0.8
    val gridP = 16

    val sets = graft.Tables.documents(spark, dir)
      .repartition(32, col("doc_id"))
      .select(col("doc_id"),
        expr("token_shingle_hashes(text, 3)").as("gs"))
      .filter(size(col("gs")) > 0)
      .persist()

    // exact all-pairs via the grid self-join (every pair meets once)
    val e = sets.withColumn("g", pmod(col("doc_id"), lit(gridP)).cast("int"))
    val a = e.select(col("doc_id").as("doc_a"), col("gs").as("gs_a"),
      col("g").as("cell_a"),
      explode(expr(s"sequence(0, ${gridP - 1})")).as("cell_b"))
    val b = e.select(col("doc_id").as("doc_b"), col("gs").as("gs_b"),
      col("g").as("cell_b"),
      explode(expr(s"sequence(0, ${gridP - 1})")).as("cell_a"))
    val exact = a.join(b, Seq("cell_a", "cell_b"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("inter",
        size(array_intersect(col("gs_a"), col("gs_b"))).cast("double"))
      .withColumn("j", col("inter") /
        (size(col("gs_a")) + size(col("gs_b")) - col("inter")))
      .filter(col("j") >= threshold)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val lsh = graft.llm.Dedup.dMinhashPairs(spark, dir, threshold)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val missed = exact -- lsh
    val spurious = lsh -- exact
    println(s"""{"sf":"$dir","exact_pairs":${exact.size},""" +
      s""""lsh_pairs":${lsh.size},"missed":${missed.size},""" +
      s""""spurious":${spurious.size}}""")
    if (missed.nonEmpty) println(s"MISSED: ${missed.take(10)}")
    if (spurious.nonEmpty) println(s"SPURIOUS: ${spurious.take(10)}")
    spark.stop()
  }
}
