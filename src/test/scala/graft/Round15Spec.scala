package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.CoOccurrenceMv
import graft.llm.TextAnalysis

/** Round-15 pins: the auto-engaging hot-cell salting of the pair MV
  * (VERDICT r14 #1) and the parameterized DSIR target (VERDICT r14
  * #7). */
class Round15Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("pairCountsAuto: the census engages salting past the threshold, " +
      "stays plain below it, and both branches compute one relation") {
    graft.Tables.tune(spark)
    // hot: one cell with 60 users; cold: 20 cells of 3 — max cell 60
    val bucketNs = 600L * 1000000000L
    val hot = spark.range(60).selectExpr(
      "id AS user_id", "'view' AS event_type", "id AS ts")
    val cold = spark.range(60).selectExpr(
      "id + 1000 AS user_id", "'view' AS event_type",
      s"(id DIV 3 + 1) * ${bucketNs}L + id AS ts")
    val occ = CoOccurrenceMv.occupancy(hot.unionByName(cold))
      .localCheckpoint()
    assert(CoOccurrenceMv.maxCellSize(occ) === 60L)
    // threshold below the hot cell -> salted engages
    val (saltedDf, salted) =
      CoOccurrenceMv.pairCountsAutoWithDecision(occ, threshold = 50)
    assert(salted, "census did not engage salting past the threshold")
    // threshold above it -> plain
    val (plainDf, salted2) =
      CoOccurrenceMv.pairCountsAutoWithDecision(occ, threshold = 60)
    assert(!salted2, "census salted at max cell == threshold (must be >)")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("u", "v").collect().map(_.toString).toSeq
    assert(canon(saltedDf) === canon(plainDf))
    assert(canon(plainDf).nonEmpty)
    // empty occupancy: census reads 0, never salts, never throws
    val (_, s3) = CoOccurrenceMv.pairCountsAutoWithDecision(
      occ.filter(lit(false)), threshold = 0)
    assert(!s3)
  }

  test("autoCells: the √n rule floors at 8, caps at 4096, and hits " +
      "√n in between") {
    import graft.llm.Similarity.autoCells
    assert(autoCells(0L) === 8)
    assert(autoCells(63L) === 8) // √63 ≈ 7.9 -> floor
    assert(autoCells(200L) === 14)
    assert(autoCells(200000L) === 447)
    assert(autoCells(100000000L) === 4096) // √1e8 = 10000 -> cap
  }

  test("DSIR target parameterization: the default target IS the " +
      "English subset, and a source-based target reweights the model " +
      "from the same fact relation") {
    graft.Tables.tune(spark)
    val default = TextAnalysis.tDsirWeights(spark, dir, k = 20)
      .collect().map(_.toString).toSeq
    val explicit = TextAnalysis.tDsirWeights(spark, dir, k = 20,
      target = col("lang") === "en").collect().map(_.toString).toSeq
    assert(default === explicit && default.nonEmpty)
    // an all-docs target makes every bucket ratio the neutral
    // ceiling's neighborhood: s = 10^6 * (c+1)/(c+1) = 10^6 exactly,
    // so every doc's length-normalized score is exactly 10^6
    val allTarget = TextAnalysis.tDsirWeights(spark, dir, k = 20,
      target = lit(true)).collect()
    assert(allTarget.nonEmpty)
    allTarget.foreach(r =>
      assert(r.getAs[Long]("dsir_avg_scaled") === 1000000L))
    // the source target ranks docs from the curated sources higher on
    // average than the raw pool — the selector selects
    val bySource = TextAnalysis.tDsirWeights(spark, dir, k = 20,
      target = col("source").isin("src0", "src1"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val curated = graft.Tables.documents(spark, dir)
      .filter(col("source").isin("src0", "src1"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val hitRate = bySource.intersect(curated).size.toDouble / bySource.size
    val baseRate = curated.size.toDouble /
      graft.Tables.documents(spark, dir).count()
    assert(hitRate > baseRate,
      s"top-20 curated hit rate $hitRate not above base rate $baseRate")
    QueryCaches.releaseAll()
  }
}
