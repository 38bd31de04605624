package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bronze.BronzeExtractors
import graft.silver.SilverTransforms
import graft.gold.GoldViews
import graft.state.ReceiptTxResolver
import graft.fixtures.NearFixtures

/** Declared queries exercising the NEAR layer end-to-end over the
  * deterministic fixture corpus ([[NearFixtures]]; the sfDir argument is
  * unused — the fixture IS the input, embedded identically in the DuckDB
  * oracles as VALUES).
  *
  * Bronze queries run the REAL pipeline (blocks → extraction → receipt
  * resolution) and are checked against the pinned expected rows; silver/
  * gold queries start from those pinned bronze rows and are checked
  * against independent DuckDB JSON SQL re-implementations of M1-M10 and
  * G1-G8 — a cross-engine differential test of the transform logic.
  */
object NearQueries {

  private val acc = NearFixtures.accounts

  private def blocksDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.Tables.tune(spark)
    spark.createDataset(NearFixtures.blocks).toDF()
  }

  /** The pinned bronze events (input of the silver layer). */
  def eventsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.Tables.tune(spark)
    spark.createDataset(NearFixtures.expectedEvents).toDF()
  }

  private def assetsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.Tables.tune(spark)
    spark.createDataset(NearFixtures.assetRows).toDF()
  }

  private def resolved(spark: SparkSession): DataFrame = {
    val b = blocksDf(spark)
    ReceiptTxResolver.resolve(
      BronzeExtractors.transactions(b, acc),
      BronzeExtractors.outcomes(b))
  }

  // ------------------------------------------------------------- bronze

  def bronzeEvents(spark: SparkSession, dir: String): DataFrame = {
    val b = blocksDf(spark)
    val outs = BronzeExtractors.outcomes(b)
    val ev = BronzeExtractors.eventRows(outs, acc)
    ReceiptTxResolver.attachTxHash(ev, resolved(spark), dropUnresolved = true)
      .select(NearFixtures.eventCols.map(col): _*)
      .orderBy(col("block_height"), col("receipt_index_in_block"),
        col("index_in_log"))
  }

  def bronzeTransactions(spark: SparkSession, dir: String): DataFrame =
    BronzeExtractors.transactionRows(blocksDf(spark), acc)
      .orderBy(col("transaction_hash"))

  def bronzeReceipts(spark: SparkSession, dir: String): DataFrame = {
    val outs = BronzeExtractors.outcomes(blocksDf(spark))
    val rows = BronzeExtractors.receiptRows(
      BronzeExtractors.outcomesOfInterest(outs, acc))
    ReceiptTxResolver.attachParentTx(rows, resolved(spark))
      .select(col("block_height"), col("block_timestamp_ns"),
        col("block_hash"), col("parent_transaction_hash"), col("receipt_id"),
        col("receiver_id"), col("predecessor_id"), col("actions"))
      .orderBy(col("receipt_id"))
  }

  def bronzeOutcomes(spark: SparkSession, dir: String): DataFrame = {
    val outs = BronzeExtractors.outcomes(blocksDf(spark))
    val rows = BronzeExtractors.executionOutcomeRows(
      BronzeExtractors.outcomesOfInterest(outs, acc))
    ReceiptTxResolver.attachParentTx(rows, resolved(spark))
      .select(col("block_height"), col("block_timestamp_ns"),
        col("block_hash"), col("parent_transaction_hash"), col("executor_id"),
        col("receipt_ids"), col("status"), col("logs"), col("tokens_burnt"),
        col("gas_burnt"), col("execution_outcome_id"), col("receipt_id"))
      .orderBy(col("execution_outcome_id"))
  }

  def resolver(spark: SparkSession, dir: String): DataFrame =
    resolved(spark)
      .select(col("receipt_id"), col("tx_hash"), col("main"),
        col("entry_height"))
      .orderBy(col("receipt_id"))

  // ------------------------------------------------------------- silver

  def m1Nep245(spark: SparkSession, dir: String): DataFrame =
    SilverTransforms.nep245Events(eventsDf(spark))
      .orderBy(col("related_receipt_id"), col("event"), col("token_id"),
        col("old_owner_id"))

  def m2TokenDiff(spark: SparkSession, dir: String): DataFrame =
    SilverTransforms.dip4TokenDiff(eventsDf(spark), acc)
      .orderBy(col("related_receipt_id"), col("intent_hash"),
        col("diff_positive_token"), col("diff_negative_token"))

  def m3PublicKeys(spark: SparkSession, dir: String): DataFrame =
    SilverTransforms.dip4PublicKeys(eventsDf(spark), acc)
      .orderBy(col("related_receipt_id"), col("event"), col("public_key"))

  def m4IntentsExecuted(spark: SparkSession, dir: String): DataFrame =
    SilverTransforms.dip4IntentsExecuted(eventsDf(spark), acc)
      .orderBy(col("related_receipt_id"), col("account_id"),
        col("intent_hash"))

  def m5FeeChanged(spark: SparkSession, dir: String): DataFrame =
    SilverTransforms.dip4FeeChanged(eventsDf(spark), acc)
      .orderBy(col("related_receipt_id"), col("old_fee"))

  def m6Transfer(spark: SparkSession, dir: String): DataFrame =
    SilverTransforms.dip4Transfer(eventsDf(spark), acc)
      .orderBy(col("related_receipt_id"), col("intent_hash"), col("token_id"))

  def m7StagingTransfer(spark: SparkSession, dir: String): DataFrame =
    SilverTransforms.stagingDip4Transfer(eventsDf(spark), acc)
      .orderBy(col("related_receipt_id"), col("intent_hash"), col("token_id"))

  def m8Transfers(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsDf(spark)
    SilverTransforms.silverTransfers(
      SilverTransforms.nep245Events(ev),
      SilverTransforms.dip4Transfer(ev, acc), acc)
      .orderBy(col("related_receipt_id"), col("event"), col("token_id"),
        col("old_owner_id"))
  }

  def m9StagingTransfers(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsDf(spark)
    SilverTransforms.stagingSilverTransfers(
      SilverTransforms.nep245Events(ev),
      SilverTransforms.stagingDip4Transfer(ev, acc), acc)
      .orderBy(col("related_receipt_id"), col("event"), col("token_id"))
  }

  def m10Referral(spark: SparkSession, dir: String): DataFrame =
    SilverTransforms.dip4TransfersWithReferral(eventsDf(spark), acc)
      .select(col("block_height"), col("block_timestamp_ns"),
        col("block_hash"), col("contract_id"), col("execution_status"),
        col("version"), col("standard"), col("event"),
        col("related_receipt_id"), col("related_receipt_receiver_id"),
        col("related_receipt_predecessor_id"), col("tx_hash"), col("memo"),
        col("old_owner_id"), col("new_owner_id"), col("intent_hash"),
        col("token_id"), col("amount_str"), col("amount"),
        col("amount_numeric"), col("referral"))
      .orderBy(col("related_receipt_id"), col("intent_hash"), col("token_id"))

  // --------------------------------------------------------------- gold

  def goldMetrics(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsDf(spark)
    GoldViews.intentsMetrics(
      SilverTransforms.nep245Events(ev),
      SilverTransforms.dip4TokenDiff(ev, acc),
      assetsDf(spark))
      .orderBy(col("day"), col("symbol"), col("referral"))
  }
}
