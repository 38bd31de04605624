package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** HOT-CELL SELF-JOIN EVIDENCE (VERDICT r13 #1): the co-occurrence
  * pair MV ([[graft.queries.CoOccurrenceMv.pairCounts]]) is quadratic
  * in the hottest occupancy cell BY DEFINITION — pair mining IS |cell|²
  * work — so at 100 TB one viral (event_type, 10-min-bucket) cell is a
  * straggler-task scale-killer unless the engine splits that cell's
  * work across tasks. Unlike the gold receipt join
  * ([[SkewJoinEvidence]]), the hot key here lives inside a SELF-join,
  * where no side is a broadcastable dim: the only scale lever is
  * splitting the skewed shuffle partition itself.
  *
  * This tool builds an occupancy corpus with ONE cell holding 50% of
  * the facts (hot: 1 cell × `hotUsers`; cold: `coldCells` cells × 5 —
  * pair work ~99.99% in the hot cell) and runs the pair build through
  * the REAL operator two ways:
  *
  *  1. DEFAULT: AQE owns the join — at gate scale the distinct
  *     occupancy relation is byte-small, so AQE broadcasts one side
  *     (fine while it fits; the per-task quadratic remains, spread by
  *     the OTHER side's partitioning);
  *  2. FORCED SHUFFLE + AQE SKEW SPLIT — the 100× model where neither
  *     side broadcasts: broadcast disabled, skew thresholds lowered to
  *     tool scale. The hot partition appears on BOTH sides of the
  *     sort-merge self-join; `OptimizeSkewedJoin` must split it
  *     (m×n sub-partition pairs — the plan is checked for the
  *     `skew=true` AQEShuffleRead marker), and the pair-count relation
  *     must be IDENTICAL (count + sum + order-independent bit_xor
  *     fingerprint — integer counts, so bit-exact by construction).
  *
  * and 3. the CELL-SALTED build
  * ([[graft.queries.CoOccurrenceMv.pairCountsSalted]]) under the same
  * no-broadcast regime — the engine-independent guard whose
  * (cell, bi, bj) join key spreads the hot cell over S(S+1)/2 blocks
  * by construction, needing no skew rule at all.
  *
  * Prints one summary line per run plus a VERDICT line; non-zero exit
  * if fingerprints diverge or the skew split did not engage. The
  * SCALE_CHECK note records the measured numbers. The residual
  * quadratic (total work, not its distribution) is bounded in a real
  * deployment by the cell key's 10-minute grain; for a corpus whose
  * single cell outgrows even split-task budgets, the salted build is
  * the implemented mitigation (gate row `g_cooccur_salted`).
  */
object HotCellEvidence {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val hotUsers = sys.env.getOrElse("SPARK_GRAFT_HOT_USERS", "4000").toInt
    val coldCells = sys.env.getOrElse("SPARK_GRAFT_COLD_CELLS", "800").toInt
    val bucketNs = graft.queries.CoOccurrenceMv.BucketNs

    // hot: one ('view', bkt 0) cell with `hotUsers` distinct users;
    // cold: `coldCells` cells of 5 users each (buckets 1..coldCells) —
    // 50% of FACTS in the hot cell, ~all pair WORK in it
    val hot = spark.range(hotUsers).selectExpr(
      "id AS user_id", "'view' AS event_type", "id AS ts")
    val cold = spark.range(coldCells * 5L).selectExpr(
      "id + 1000000 AS user_id", "'view' AS event_type",
      s"(id DIV 5 + 1) * ${bucketNs}L + id AS ts")
    val events = hot.unionByName(cold).localCheckpoint()

    def run(label: String, salted: Boolean = false)
        : ((Long, Long, Long), String) = {
      val occ = graft.queries.CoOccurrenceMv.occupancy(events)
      val counts =
        if (salted) graft.queries.CoOccurrenceMv.pairCountsSalted(occ)
        else graft.queries.CoOccurrenceMv.pairCounts(occ)
      val fp = counts.agg(
        count(lit(1)).as("n"),
        sum(col("nco")).as("s"),
        bit_xor(graft.validate.Validation.h60(
          graft.validate.Validation.rowImage(
            Seq(col("u"), col("v"), col("nco"))))).as("x"))
      val t0 = System.nanoTime()
      val row = fp.collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      val res = (row.getLong(0), row.getLong(1), row.getLong(2))
      val plan = fp.queryExecution.executedPlan.toString
      println(f"[$label] pairs=${res._1} sum_nco=${res._2} " +
        f"fingerprint=${res._3} wall=${sec}%.2fs " +
        s"skew_marker=${plan.contains("skew=true")}")
      (res, plan)
    }

    val (base, _) = run("default-aqe")

    // the 100× model: neither side broadcasts, thresholds at tool scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
    spark.conf.set(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    // the skew SPLIT is floored by minPartitionSize (default 1 MB):
    // a skewed partition only counts if it can split into >= 2 groups
    // of at least this size, so the 100×-model scaling must lower it
    // with the other thresholds (found empirically — the rule logged
    // "number of skewed partitions: left 0, right 0" while the size
    // stats showed 6.4× median, because every split group merged back
    // to one under the 1 MB floor)
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize", "4096")
    val (forced, plan2) = run("forced-shuffle+skew-split")

    // 3. CELL-SALTED build under the SAME no-broadcast regime: the
    //    engine-independent guard — the (cell, bi, bj) join key spreads
    //    the hot cell over S(S+1)/2 blocks by construction, so no AQE
    //    skew rule is needed for the per-task bound (and none should
    //    fire: the key is uniform). Must be bit-identical too.
    val (saltedRes, plan3) = run("cell-salted", salted = true)

    val equal = base == forced && base == saltedRes
    val split = plan2.contains("skew=true")
    val saltedUniform = !plan3.contains("skew=true")
    println(s"VERDICT: results_equal=$equal skew_split_engaged=$split " +
      s"salted_needs_no_split=$saltedUniform")
    spark.stop()
    if (!equal || !split) sys.exit(1)
  }
}
