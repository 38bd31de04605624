package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** HOT-KEY JOIN EVIDENCE (VERDICT r12 #3): runs the gold receipt join
  * over an amplified skew corpus ([[graft.fixtures.BlockGen
  * .genSkewBlocks]] with a 16k-event hot receipt, 89% of the corpus)
  * two ways and reports what the plan actually did:
  *
  *  1. DEFAULT: AQE owns the join — the bounded diff side broadcasts,
  *     so the hot key never shuffles (the expected production shape
  *     while the diff batch is small);
  *  2. FORCED SHUFFLE + AQE SKEW SPLIT: broadcast disabled and the
  *     skew thresholds lowered to gate scale — models the 100× case
  *     where the diff side outgrows broadcast; the hot partition must
  *     be split by OptimizeSkewedJoin (the plan is checked for the
  *     AQEShuffleRead skew marker), and the result must equal run 1.
  *
  * Prints one summary line per run plus a VERDICT line; non-zero exit
  * if results diverge or the skew split did not engage.
  */
object SkewJoinEvidence {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val acc = graft.fixtures.NearFixtures.accounts
    val blocks = spark.createDataset(
      graft.fixtures.BlockGen.genSkewBlocks(
        nCold = 2000, hotLogs = 40, hotPerLog = 400)).toDF()
      .localCheckpoint()
    val resolved = graft.state.ReceiptTxResolver.resolve(
      graft.bronze.BronzeExtractors.transactions(blocks, acc),
      graft.bronze.BronzeExtractors.outcomes(blocks))
    val ev = graft.state.ReceiptTxResolver.attachTxHash(
      graft.bronze.BronzeExtractors.eventRows(
        graft.bronze.BronzeExtractors.outcomes(blocks), acc), resolved)
      .localCheckpoint()
    import spark.implicits._
    val assets = spark.createDataset(
      graft.fixtures.NearFixtures.assetRows).toDF()

    def gold() = graft.gold.GoldViews.intentsMetrics(
      graft.silver.SilverTransforms.nep245Events(ev),
      graft.silver.SilverTransforms.dip4TokenDiff(ev, acc),
      assets)

    def run(label: String): (Map[(Long, String, String), Double], String) = {
      val df = gold()
      val rows = df.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2)) -> r.getDouble(4))
        .toMap
      val plan = df.queryExecution.executedPlan.toString
      println(s"[$label] groups=${rows.size} " +
        f"hot_alpha_sum=${rows.getOrElse((19675L, "USDC", "alpha"), -1.0)}%.4f " +
        s"skew_marker=${plan.contains("skew=true")}")
      (rows, plan)
    }

    val (base, _) = run("default-aqe")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
    spark.conf.set(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    val (forced, plan2) = run("forced-shuffle+skew-split")

    val equal = base == forced
    val split = plan2.contains("skew=true")
    println(s"VERDICT: results_equal=$equal skew_split_engaged=$split")
    spark.stop()
    if (!equal || !split) sys.exit(1)
  }
}
