package graft.sink

import org.apache.spark.sql.types.StructType
import ClickHouseDialect._

/** The silver-layer init surface a live ClickHouse target receives
  * (clickhouse/init/02-silver-tables.sql): seven ingest-time
  * materialized views over the `events` core table, their target
  * ReplacingMergeTree tables, and the two plain union views. Each MV
  * body is ASSEMBLED from the structured facts of the matching Spark
  * transform — filter predicates, decode mode (whole document vs
  * arrayJoin over the JSON array), JSON extractions, and the flatten
  * stage — i.e. the same semantics [[graft.silver.SilverTransforms]]
  * executes in Catalyst (M1–M9, gate-verified), rendered in the
  * ClickHouse dialect. `silverInitStatements` returns the whole script
  * in dependency order for [[ClickHouseDialect.executeBatchWithRetry]].
  *
  * The `>= '2025-02-12 …'` minimum block timestamps are the event
  * standards' on-chain activation times (02-silver-tables.sql:82,153,
  * 224,277,325) — deployment facts, mirrored by the transforms'
  * `minTimestampNs` parameters.
  */
object ClickHouseSilverDdl {

  val prodContracts = Seq("defuse-alpha.near", "intents.near")
  val stagingContract = Seq("staging-intents.near")

  private val dt9 = "DateTime64(9, 'UTC')"

  /** The eleven bronze passthrough columns every silver row carries
    * (SilverTransforms.passthrough), in the reference's MV order with
    * receiver/predecessor order a per-MV choice. */
  private def passCols(receiverFirst: Boolean): Seq[(String, String)] = {
    val head = Seq(
      "block_height" -> "UInt64",
      "block_timestamp" -> dt9,
      "block_hash" -> "String",
      "contract_id" -> "String",
      "execution_status" -> "String",
      "version" -> "String",
      "standard" -> "String",
      "event" -> "String",
      "related_receipt_id" -> "String")
    val tail =
      if (receiverFirst)
        Seq("related_receipt_receiver_id" -> "String",
          "related_receipt_predecessor_id" -> "String")
      else
        Seq("related_receipt_predecessor_id" -> "String",
          "related_receipt_receiver_id" -> "String")
    head ++ tail
  }

  private def withTxHash(cols: Seq[(String, String)]): Seq[(String, String)] =
    cols.take(3) ++ Seq("tx_hash" -> "String") ++ cols.drop(3)

  private def names(cols: Seq[(String, String)]): Seq[String] = cols.map(_._1)

  private def finalSelect(from: String, cols: Seq[String],
      complexSettings: Boolean): String =
    s"SELECT ${cols.mkString(", ")}\nFROM $from\n" +
      mvSettings(complexSettings)

  // ---------------- mv_silver_nep_245_events (02:57-93) -------------

  val nep245MinTs = "2025-02-12 22:10:00"

  val nep245MvColumns: Seq[(String, String)] =
    withTxHash(passCols(receiverFirst = true)) ++ Seq(
      "memo" -> "String",
      "old_owner_id" -> "Nullable(String)",
      "new_owner_id" -> "Nullable(String)",
      "token_id" -> "String",
      "amount" -> "Float64")

  /** nep245: explode the event-JSON array, owner columns conditional on
    * mt_transfer vs mt_mint/mt_burn, then zip-explode (token_ids,
    * amounts) — the CH twin of SilverTransforms.nep245Events. */
  def nep245MvDdl: String = {
    val body =
      decodedEventsCte(
        Seq("standard = 'nep245'",
          s"block_timestamp >= '$nep245MinTs'"),
        explodeArray = true) +
      parsedCte("tokens", "decoded_events", Seq(
        jsonValue("memo") -> "memo",
        ("if(event = 'mt_transfer', " +
          s"${jsonValue("old_owner_id", coalesced = false)}, " +
          s"${jsonValue("owner_id", coalesced = false)})") -> "old_owner_id",
        ("if(event = 'mt_transfer', " +
          s"${jsonValue("new_owner_id", coalesced = false)}, " +
          s"${jsonValue("owner_id", coalesced = false)})") -> "new_owner_id",
        "JSONExtractArrayRaw(data_row, 'token_ids')" -> "token_ids",
        "JSONExtractArrayRaw(data_row, 'amounts')" -> "amounts")) +
      (", tokens_flattened AS (\n" +
        "    SELECT *, (arrayJoin(arrayZip(token_ids, amounts)) AS t).1" +
        " AS token_id, t.2 AS amount\n    FROM tokens\n)\n") +
      finalSelect("tokens_flattened",
        names(withTxHash(passCols(receiverFirst = true))) ++ Seq(
          "memo", "old_owner_id", "new_owner_id",
          "replaceAll(token_id, '\"', '') AS token_id",
          "CAST(replaceAll(amount, '\"', ''), 'Float64') AS amount"),
        complexSettings = false)
    createMaterializedViewDdl("mv_silver_nep_245_events",
      "silver_nep_245_events", nep245MvColumns, body)
  }

  // ---------------- mv_silver_dip4_token_diff (02:129-170) ----------

  val tokenDiffMinTs = "2025-02-18 22:55:00"

  val tokenDiffMvColumns: Seq[(String, String)] =
    passCols(receiverFirst = false) ++ Seq(
      "account_id" -> "String",
      "diff_positive_token" -> "String",
      "diff_positive_amount" -> "Float64",
      "diff_negative_token" -> "String",
      "diff_negative_amount" -> "Float64",
      "intent_hash" -> "String",
      "referral" -> "String")

  /** token_diff: explode the event array, then explode the `diff`
    * JSON map into (token, amount) pairs and sign-split — the CH twin
    * of SilverTransforms.dip4TokenDiff. */
  def tokenDiffMvDdl: String = {
    val body =
      decodedEventsCte(
        Seq(contractsIn(prodContracts), "standard = 'dip4'",
          "event = 'token_diff'",
          s"block_timestamp >= '$tokenDiffMinTs'"),
        explodeArray = true) +
      parsedCte("parsed_json", "decoded_events", Seq(
        jsonValue("account_id") -> "account_id",
        jsonValue("diff") -> "diff",
        jsonValue("intent_hash") -> "intent_hash",
        jsonValue("referral") -> "referral")) +
      // clause order matches the reference byte-for-byte
      // (02-silver-tables.sql:160 leads with `diff,` before the
      // arrayJoin and trails the `*` — semantically identical, pinned
      // so textual diffing against the init file stays clean;
      // ADVICE r12)
      (", diff_kvs AS (\n    SELECT diff, arrayJoin(" +
        "JSONExtractKeysAndValues(assumeNotNull(diff), 'Float64'))" +
        " AS diff_kv, *\n    FROM parsed_json\n)\n") +
      finalSelect("diff_kvs",
        names(passCols(receiverFirst = false)) ++ Seq(
          "account_id",
          "if((diff_kv.2) >= 0, diff_kv.1, '') AS diff_positive_token",
          "if((diff_kv.2) >= 0, diff_kv.2, 0) AS diff_positive_amount",
          "if((diff_kv.2) < 0, diff_kv.1, '') AS diff_negative_token",
          "if((diff_kv.2) < 0, diff_kv.2, 0) AS diff_negative_amount",
          "intent_hash", "referral"),
        complexSettings = true)
    createMaterializedViewDdl("mv_silver_dip4_token_diff",
      "silver_dip4_token_diff", tokenDiffMvColumns, body)
  }

  // ---------------- mv_silver_dip4_public_keys (02:201-228) ---------

  val publicKeysMinTs = "2025-02-12 23:35:00"

  val publicKeysMvColumns: Seq[(String, String)] =
    passCols(receiverFirst = false) ++ Seq(
      "account_id" -> "String", "public_key" -> "String")

  /** public_keys: the data document is a single JSON OBJECT (no array
    * explode) — SilverTransforms.dip4PublicKeys. */
  def publicKeysMvDdl: String = {
    val body =
      decodedEventsCte(
        Seq(contractsIn(prodContracts), "standard = 'dip4'",
          "event IN ('public_key_added', 'public_key_removed')",
          s"block_timestamp >= '$publicKeysMinTs'"),
        explodeArray = false) + "\n" +
      finalSelect("decoded_events",
        names(passCols(receiverFirst = false)) ++ Seq(
          s"${jsonValue("account_id")} AS account_id",
          s"${jsonValue("public_key")} AS public_key"),
        complexSettings = true)
    createMaterializedViewDdl("mv_silver_dip4_public_keys",
      "silver_dip4_public_keys", publicKeysMvColumns, body)
  }

  // ---------------- mv_silver_dip4_intents_executed (02:254-281) ----

  val intentsExecutedMinTs = "2025-02-12 23:45:00"

  val intentsExecutedMvColumns: Seq[(String, String)] =
    passCols(receiverFirst = false) ++ Seq(
      "account_id" -> "String", "intent_hash" -> "String")

  def intentsExecutedMvDdl: String = {
    val body =
      decodedEventsCte(
        Seq(contractsIn(prodContracts), "standard = 'dip4'",
          "event = 'intents_executed'",
          s"block_timestamp >= '$intentsExecutedMinTs'"),
        explodeArray = true) + "\n" +
      finalSelect("decoded_events",
        names(passCols(receiverFirst = false)) ++ Seq(
          s"${jsonValue("account_id")} AS account_id",
          s"${jsonValue("intent_hash")} AS intent_hash"),
        complexSettings = true)
    createMaterializedViewDdl("mv_silver_dip4_intents_executed",
      "silver_dip4_intents_executed", intentsExecutedMvColumns, body)
  }

  // ---------------- silver_mv_dip4_fee_changed (02:307-330) ---------

  val feeChangedMinTs = "2025-02-12 23:50:00"

  val feeChangedMvColumns: Seq[(String, String)] =
    passCols(receiverFirst = false) ++ Seq(
      "old_fee" -> "String", "new_fee" -> "String")

  /** fee_changed — NB the reference names this one `silver_mv_…`, not
    * `mv_silver_…` (02:307); the dialect reproduces the quirk. */
  def feeChangedMvDdl: String = {
    val body =
      decodedEventsCte(
        Seq(contractsIn(prodContracts), "standard = 'dip4'",
          "event = 'fee_changed'",
          s"block_timestamp >= '$feeChangedMinTs'"),
        explodeArray = false) + "\n" +
      finalSelect("decoded_events",
        names(passCols(receiverFirst = false)) ++ Seq(
          s"${jsonValue("old_fee")} AS old_fee",
          s"${jsonValue("new_fee")} AS new_fee"),
        complexSettings = true)
    createMaterializedViewDdl("silver_mv_dip4_fee_changed",
      "silver_dip4_fee_changed", feeChangedMvColumns, body)
  }

  // ---------------- mv_silver_dip4_transfer (+staging) (02:365-510) -

  val transferMvColumns: Seq[(String, String)] =
    withTxHash(passCols(receiverFirst = true)) ++ Seq(
      "memo" -> "Nullable(String)",
      "old_owner_id" -> "Nullable(String)",
      "new_owner_id" -> "Nullable(String)",
      "token_id" -> "String",
      "amount" -> "Float64",
      "intent_hash" -> "String")

  /** transfer: explode the event array, extract the `tokens` map as
    * (token, amount-string) pairs and explode those — the CH twin of
    * SilverTransforms.dip4Transfer; `staging` swaps the contract
    * filter (the M7 prod/staging CRITICAL split), nothing else. */
  private def transferBody(contracts: Seq[String]): String =
    decodedEventsCte(
      Seq(contractsIn(contracts), "standard = 'dip4'",
        "event = 'transfer'"),
      explodeArray = true) +
    parsedCte("parsed", "decoded_events", Seq(
      jsonValue("memo") -> "memo",
      jsonValue("account_id", coalesced = false) -> "old_owner_id",
      jsonValue("receiver_id", coalesced = false) -> "new_owner_id",
      jsonValue("intent_hash") -> "intent_hash",
      ("JSONExtractKeysAndValues(assumeNotNull(coalesce(" +
        s"${jsonValue("tokens", coalesced = false)}, '{}')), 'String')")
        -> "token_pairs")) +
    (", tokens_flattened AS (\n    SELECT *, (arrayJoin(token_pairs)" +
      " AS tp).1 AS token_id, tp.2 AS amount_str\n    FROM parsed\n)\n") +
    finalSelect("tokens_flattened",
      names(withTxHash(passCols(receiverFirst = true))) ++ Seq(
        "memo", "old_owner_id", "new_owner_id", "token_id",
        "CAST(replaceAll(amount_str, '\"', ''), 'Float64') AS amount",
        "intent_hash"),
      complexSettings = true)

  def transferMvDdl: String =
    createMaterializedViewDdl("mv_silver_dip4_transfer",
      "silver_dip4_transfer", transferMvColumns,
      transferBody(prodContracts))

  def stagingTransferMvDdl: String =
    createMaterializedViewDdl("mv_staging_silver_dip4_transfer",
      "staging_silver_dip4_transfer", transferMvColumns,
      transferBody(stagingContract))

  // ---------------- union views (02:412-439, 516-541) ---------------

  val transfersViewColumns: Seq[(String, String)] =
    withTxHash(passCols(receiverFirst = true)) ++ Seq(
      "memo" -> "Nullable(String)",
      "old_owner_id" -> "Nullable(String)",
      "new_owner_id" -> "Nullable(String)",
      "token_id" -> "Nullable(String)",
      "amount" -> "Nullable(Float64)",
      "intent_hash" -> "String")

  /** silver_transfers / staging_silver_transfers — UNION ALL of the
    * nep245 silver rows (intent_hash defaulted '') and the dip4
    * transfer silver rows, split by contract environment — the CH twin
    * of SilverTransforms.silverTransfers / stagingSilverTransfers
    * (M8/M9). */
  private def transfersViewBody(nepWhere: String,
      dip4Table: String): String = {
    val cols = names(transfersViewColumns).dropRight(1)
    s"SELECT ${cols.mkString(", ")}, '' AS intent_hash\n" +
      s"FROM silver_nep_245_events\nWHERE $nepWhere\n" +
      "UNION ALL\n" +
      s"SELECT ${(cols :+ "intent_hash").mkString(", ")}\n" +
      s"FROM $dip4Table"
  }

  def transfersViewDdl: String =
    createViewDdl("silver_transfers", transfersViewColumns,
      transfersViewBody(contractsIn(prodContracts), "silver_dip4_transfer"))

  def stagingTransfersViewDdl: String =
    createViewDdl("staging_silver_transfers", transfersViewColumns,
      transfersViewBody(contractsIn(stagingContract),
        "staging_silver_dip4_transfer"))

  // ---------------- whole init script -------------------------------

  /** The full 02-init surface in dependency order (target table before
    * its MV; union views last). Table DDLs are generated from the
    * SAME Spark schemas the silver transforms emit — pass each
    * transform's `.schema` here; ship with
    * [[ClickHouseDialect.executeBatchWithRetry]]. */
  def silverInitStatements(
      assetsSchema: StructType,
      nep245Schema: StructType,
      tokenDiffSchema: StructType,
      publicKeysSchema: StructType,
      intentsExecutedSchema: StructType,
      feeChangedSchema: StructType,
      transferSchema: StructType): Seq[String] = Seq(
    createTableDdl(defuseAssetsSpec, assetsSchema),
    createTableDdl(silverNep245Spec, nep245Schema),
    nep245MvDdl,
    createTableDdl(silverTokenDiffSpec, tokenDiffSchema),
    tokenDiffMvDdl,
    createTableDdl(silverPublicKeysSpec, publicKeysSchema),
    publicKeysMvDdl,
    createTableDdl(silverIntentsExecutedSpec, intentsExecutedSchema),
    intentsExecutedMvDdl,
    createTableDdl(silverFeeChangedSpec, feeChangedSchema),
    feeChangedMvDdl,
    createTableDdl(silverTransferSpec, transferSchema),
    transferMvDdl,
    transfersViewDdl,
    createTableDdl(stagingSilverTransferSpec, transferSchema),
    stagingTransferMvDdl,
    stagingTransfersViewDdl)
}
