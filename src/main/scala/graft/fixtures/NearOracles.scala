package graft.fixtures

/** DuckDB oracle SQL for the NEAR silver/gold queries — independent
  * re-implementations of the reference's MV pipelines
  * (clickhouse/init/02-silver-tables.sql, 03-gold-views.sql) in DuckDB
  * JSON SQL over the SAME pinned bronze events that feed the Spark
  * transforms ([[NearFixtures.eventsCte]]). Any divergence between the
  * Spark DataFrame logic and this SQL fails the correctness gate.
  */
object NearOracles {

  private val prodIn = "('defuse-alpha.near', 'intents.near')"
  private val stagingIn = "('staging-intents.near')"

  /** The 11 passthrough columns every silver table carries. */
  private val pass = Seq("block_height", "block_timestamp_ns", "block_hash",
    "contract_id", "execution_status", "version", "standard", "event",
    "related_receipt_id", "related_receipt_receiver_id",
    "related_receipt_predecessor_id").mkString(", ")

  private def withNe(body: String) = s"WITH ${NearFixtures.eventsCte},\n$body"

  /** M1 — nep245 explode + conditional owners + token/amount zip. */
  def m1Sql: String = withNe(
    s"""b AS (SELECT ne.*, unnest(from_json(data, '["JSON"]')) AS dr
       |  FROM ne WHERE standard = 'nep245' AND block_timestamp_ns >= 0),
       |o AS (SELECT *,
       |    coalesce(json_extract_string(dr, '$$.memo'), '') AS memo,
       |    CASE WHEN event = 'mt_transfer'
       |         THEN json_extract_string(dr, '$$.old_owner_id')
       |         ELSE json_extract_string(dr, '$$.owner_id') END AS old_owner_id,
       |    CASE WHEN event = 'mt_transfer'
       |         THEN json_extract_string(dr, '$$.new_owner_id')
       |         ELSE json_extract_string(dr, '$$.owner_id') END AS new_owner_id,
       |    unnest(list_zip(
       |      from_json(json_extract(dr, '$$.token_ids'), '["VARCHAR"]'),
       |      from_json(json_extract(dr, '$$.amounts'), '["VARCHAR"]'))) AS pair
       |  FROM b)
       |SELECT $pass, tx_hash, memo, old_owner_id, new_owner_id,
       |  pair[1] AS token_id, CAST(pair[2] AS DOUBLE) AS amount
       |FROM o ORDER BY related_receipt_id, event, token_id, old_owner_id""".stripMargin)

  /** M2 — token_diff explode + diff-map explode + sign split. */
  def m2Sql: String = withNe(
    s"""b AS (SELECT ne.*, unnest(from_json(data, '["JSON"]')) AS dr
       |  FROM ne WHERE contract_id IN $prodIn AND standard = 'dip4'
       |    AND event = 'token_diff' AND block_timestamp_ns >= 0),
       |i AS (SELECT *,
       |    coalesce(json_extract_string(dr, '$$.account_id'), '') AS account_id,
       |    coalesce(json_extract_string(dr, '$$.intent_hash'), '') AS intent_hash,
       |    coalesce(json_extract_string(dr, '$$.referral'), '') AS referral
       |  FROM b),
       |k AS (SELECT *, unnest(json_keys(dr, '$$.diff')) AS diff_token FROM i),
       |v AS (SELECT *, CAST(json_extract(dr, '$$.diff."' || diff_token || '"')
       |    AS DOUBLE) AS diff_amount FROM k)
       |SELECT $pass, account_id, intent_hash, referral,
       |  CASE WHEN diff_amount >= 0 THEN diff_token ELSE '' END AS diff_positive_token,
       |  CASE WHEN diff_amount >= 0 THEN diff_amount ELSE 0.0 END AS diff_positive_amount,
       |  CASE WHEN diff_amount < 0 THEN diff_token ELSE '' END AS diff_negative_token,
       |  CASE WHEN diff_amount < 0 THEN diff_amount ELSE 0.0 END AS diff_negative_amount
       |FROM v ORDER BY related_receipt_id, intent_hash,
       |  diff_positive_token, diff_negative_token""".stripMargin)

  /** M3 — public keys (single-object payload, no explode). */
  def m3Sql: String = withNe(
    s"""r AS (SELECT $pass,
       |    coalesce(json_extract_string(data, '$$.account_id'), '') AS account_id,
       |    coalesce(json_extract_string(data, '$$.public_key'), '') AS public_key
       |  FROM ne WHERE contract_id IN $prodIn AND standard = 'dip4'
       |    AND event IN ('public_key_added', 'public_key_removed')
       |    AND block_timestamp_ns >= 0)
       |SELECT * FROM r ORDER BY related_receipt_id, event, public_key""".stripMargin)

  /** M4 — intents_executed (array payload). */
  def m4Sql: String = withNe(
    s"""b AS (SELECT ne.*, unnest(from_json(data, '["JSON"]')) AS dr
       |  FROM ne WHERE contract_id IN $prodIn AND standard = 'dip4'
       |    AND event = 'intents_executed' AND block_timestamp_ns >= 0)
       |SELECT $pass,
       |  coalesce(json_extract_string(dr, '$$.account_id'), '') AS account_id,
       |  coalesce(json_extract_string(dr, '$$.intent_hash'), '') AS intent_hash
       |FROM b ORDER BY related_receipt_id, account_id, intent_hash""".stripMargin)

  /** M5 — fee_changed (single-object payload). */
  def m5Sql: String = withNe(
    s"""r AS (SELECT $pass,
       |    coalesce(json_extract_string(data, '$$.old_fee'), '') AS old_fee,
       |    coalesce(json_extract_string(data, '$$.new_fee'), '') AS new_fee
       |  FROM ne WHERE contract_id IN $prodIn AND standard = 'dip4'
       |    AND event = 'fee_changed' AND block_timestamp_ns >= 0)
       |SELECT * FROM r ORDER BY related_receipt_id, old_fee""".stripMargin)

  /** Shared body of M6/M7 as a CTE chain parameterized by the contract
    * filter; ends at relation `v` with amount_str per (item, token). */
  private def transferBody(contractsIn: String) =
    s"""b AS (SELECT ne.*, unnest(from_json(data, '["JSON"]')) AS dr
       |  FROM ne WHERE contract_id IN $contractsIn AND standard = 'dip4'
       |    AND event = 'transfer'),
       |i AS (SELECT *,
       |    coalesce(json_extract_string(dr, '$$.memo'), '') AS memo,
       |    json_extract_string(dr, '$$.account_id') AS old_owner_id,
       |    json_extract_string(dr, '$$.receiver_id') AS new_owner_id,
       |    coalesce(json_extract_string(dr, '$$.intent_hash'), '') AS intent_hash
       |  FROM b),
       |k AS (SELECT *, unnest(json_keys(dr, '$$.tokens')) AS token_id FROM i),
       |v AS (SELECT *, json_extract_string(dr, '$$.tokens."' || token_id || '"')
       |    AS amount_str FROM k)""".stripMargin

  private val transferSelect =
    s"""SELECT $pass, tx_hash, memo, old_owner_id, new_owner_id, intent_hash,
       |  token_id, amount_str, CAST(amount_str AS DOUBLE) AS amount
       |FROM v ORDER BY related_receipt_id, intent_hash, token_id""".stripMargin

  /** M6 — dip4 transfer (prod contracts). */
  def m6Sql: String = withNe(transferBody(prodIn) + "\n" + transferSelect)

  /** M7 — dip4 transfer (staging ONLY — the critical account split). */
  def m7Sql: String = withNe(transferBody(stagingIn) + "\n" + transferSelect)

  private def unionSql(contractsIn: String) = withNe(
    s"""nb AS (SELECT ne.*, unnest(from_json(data, '["JSON"]')) AS dr
       |  FROM ne WHERE standard = 'nep245' AND block_timestamp_ns >= 0
       |    AND contract_id IN $contractsIn),
       |no2 AS (SELECT *,
       |    coalesce(json_extract_string(dr, '$$.memo'), '') AS memo,
       |    CASE WHEN event = 'mt_transfer'
       |         THEN json_extract_string(dr, '$$.old_owner_id')
       |         ELSE json_extract_string(dr, '$$.owner_id') END AS old_owner_id,
       |    CASE WHEN event = 'mt_transfer'
       |         THEN json_extract_string(dr, '$$.new_owner_id')
       |         ELSE json_extract_string(dr, '$$.owner_id') END AS new_owner_id,
       |    unnest(list_zip(
       |      from_json(json_extract(dr, '$$.token_ids'), '["VARCHAR"]'),
       |      from_json(json_extract(dr, '$$.amounts'), '["VARCHAR"]'))) AS pair
       |  FROM nb),
       |${transferBody(contractsIn)},
       |u AS (
       |  SELECT $pass, tx_hash, memo, old_owner_id, new_owner_id,
       |    pair[1] AS token_id, CAST(pair[2] AS DOUBLE) AS amount,
       |    '' AS intent_hash
       |  FROM no2
       |  UNION ALL
       |  SELECT $pass, tx_hash, memo, old_owner_id, new_owner_id,
       |    token_id, CAST(amount_str AS DOUBLE) AS amount, intent_hash
       |  FROM v)
       |SELECT * FROM u
       |ORDER BY related_receipt_id, event, token_id, old_owner_id""".stripMargin)

  /** M8 — prod transfers union view. */
  def m8Sql: String = unionSql(prodIn)

  /** M9 — staging transfers union view. */
  def m9Sql: String = unionSql(stagingIn)

  /** M10 — transfers + first-non-empty-referral join + NUMERIC amount.
    * The fixture has at most one non-empty referral per receipt, so MIN
    * equals the Spark side's first-in-block-order pick. amount_numeric is
    * compared as its canonical string (38-digit decimal stringification
    * diverges between engines in the driver's hash; the round trip
    * through DECIMAL(38,0) still proves the exact-NUMERIC parse). */
  def m10Sql: String = withNe(
    s"""${transferBody(prodIn)},
       |refs AS (SELECT related_receipt_id, MIN(r) AS referral FROM (
       |    SELECT ne.related_receipt_id,
       |      json_extract_string(unnest(from_json(data, '["JSON"]')),
       |        '$$.referral') AS r
       |    FROM ne WHERE contract_id IN $prodIn AND standard = 'dip4'
       |      AND event = 'token_diff') rr
       |  WHERE r IS NOT NULL AND r != '' GROUP BY related_receipt_id)
       |SELECT $pass, tx_hash, memo, old_owner_id, new_owner_id, intent_hash,
       |  token_id, amount_str, CAST(amount_str AS DOUBLE) AS amount,
       |  CAST(CAST(amount_str AS DECIMAL(38,0)) AS VARCHAR) AS amount_numeric,
       |  refs.referral
       |FROM v LEFT JOIN refs USING (related_receipt_id)
       |ORDER BY related_receipt_id, intent_hash, token_id""".stripMargin)

  // ----------------------------------------------------- validation V5-V11

  /** Portable 60-bit fingerprint (first 15 md5 nibbles as BIGINT) —
    * bit-identical to Spark's conv(substring(md5(x),1,15),16,10). */
  private def h60(x: String): String =
    "CAST(list_sum(list_transform(range(1, 16), i -> " +
      s"CAST(instr('0123456789abcdef', substring(md5($x), i, 1)) - 1 AS BIGINT)" +
      " * CAST(pow(16, 15 - i) AS BIGINT))) AS BIGINT)"

  /** Null-safe pipe-joined row image, mirroring Validation.rowImage. */
  private def cws(cols: Seq[String]): String =
    cols.map(c => s"coalesce(CAST($c AS VARCHAR), '')")
      .mkString("concat_ws('|', ", ", ", ")")

  private val eventImage = cws(NearFixtures.eventCols)

  def vFingerprintsSql: String = {
    val txCols = Seq("block_height", "block_timestamp_ns", "block_hash",
      "transaction_hash", "signer_id", "receiver_id", "actions")
    val rcCols = Seq("block_height", "block_timestamp_ns", "block_hash",
      "parent_transaction_hash", "receipt_id", "receiver_id",
      "predecessor_id", "actions")
    val ocCols = Seq("block_height", "block_timestamp_ns", "block_hash",
      "parent_transaction_hash", "executor_id",
      "array_to_string(receipt_ids, ',')", "status", "logs", "tokens_burnt",
      "gas_burnt", "execution_outcome_id", "receipt_id")
    s"""WITH ${NearFixtures.eventsCte},
       |${NearFixtures.transactionsCte},
       |${NearFixtures.receiptsCte},
       |${NearFixtures.outcomesCte},
       |u AS (
       |  SELECT 'events' AS table_name, COUNT(*) AS n_rows,
       |    bit_xor(${h60(cws(Seq("related_receipt_id", "index_in_log")))}) AS pk_fingerprint,
       |    bit_xor(${h60(eventImage)}) AS row_fingerprint FROM ne
       |  UNION ALL
       |  SELECT 'transactions', COUNT(*),
       |    bit_xor(${h60(cws(Seq("transaction_hash")))}),
       |    bit_xor(${h60(cws(txCols))}) FROM nt
       |  UNION ALL
       |  SELECT 'receipts', COUNT(*),
       |    bit_xor(${h60(cws(Seq("receipt_id")))}),
       |    bit_xor(${h60(cws(rcCols))}) FROM nr
       |  UNION ALL
       |  SELECT 'outcomes', COUNT(*),
       |    bit_xor(${h60(cws(Seq("execution_outcome_id")))}),
       |    bit_xor(${h60(cws(ocCols))}) FROM no_)
       |SELECT * FROM u ORDER BY table_name""".stripMargin
  }

  def vDomainSql: String = withNe(
    s"""r AS (SELECT COUNT(*) AS n_rows,
       |  CAST(SUM(CASE WHEN contract_id NOT IN
       |    ('defuse-alpha.near', 'intents.near', 'staging-intents.near')
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outside_domain FROM ne)
       |SELECT * FROM r""".stripMargin)

  def vJsonValidSql: String =
    s"""WITH ${NearFixtures.eventsCte},
       |${NearFixtures.receiptsCte},
       |${NearFixtures.outcomesCte},
       |u AS (
       |  SELECT 'receipts.actions' AS checked, COUNT(*) AS n_rows,
       |    CAST(SUM(CASE WHEN NOT json_valid(actions) THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_invalid FROM nr
       |  UNION ALL
       |  SELECT 'outcomes.logs', COUNT(*),
       |    CAST(SUM(CASE WHEN NOT json_valid(logs) THEN 1 ELSE 0 END)
       |      AS BIGINT) FROM no_
       |  UNION ALL
       |  SELECT 'events.data', COUNT(*),
       |    CAST(SUM(CASE WHEN NOT json_valid(data) THEN 1 ELSE 0 END)
       |      AS BIGINT) FROM ne)
       |SELECT * FROM u ORDER BY checked""".stripMargin

  def vDrilldownSql: String = withNe(
    s"""r AS (SELECT block_height, COUNT(*) AS n_rows,
       |    bit_xor(${h60(eventImage)}) AS block_fingerprint
       |  FROM ne GROUP BY block_height)
       |SELECT * FROM r ORDER BY block_height""".stripMargin)

  def vDiffSql: String =
    """SELECT * FROM (VALUES
      |    ('r10', CAST(1 AS BIGINT), 'mismatch'),
      |    ('r6', CAST(3 AS BIGINT), 'only_a'))
      |  AS d(related_receipt_id, index_in_log, status)
      |ORDER BY related_receipt_id, index_in_log""".stripMargin

  def vToleranceSql: String = withNe(
    s"""${transferBody(prodIn)},
       |c AS (SELECT CAST(amount_str AS DOUBLE) AS a,
       |    CAST(CAST(amount_str AS DECIMAL(38,0)) AS DOUBLE) AS e FROM v)
       |SELECT COUNT(*) AS n_rows,
       |  CAST(SUM(CASE WHEN abs(a - e) / greatest(abs(e), 1e-300) > 1e-10
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_exceeding_tol,
       |  MAX(abs(a - e) / greatest(abs(e), 1e-300)) AS max_rel_err
       |FROM c""".stripMargin)

  /** Gold — G1-G8 over the M1/M2 CTEs + the assets VALUES. */
  def goldSql: String = withNe(
    s"""${NearFixtures.assetsCte},
       |nb AS (SELECT ne.*, unnest(from_json(data, '["JSON"]')) AS dr
       |  FROM ne WHERE standard = 'nep245' AND block_timestamp_ns >= 0),
       |n AS (SELECT *,
       |    block_timestamp_ns // 86400000000000 AS day,
       |    coalesce(json_extract_string(dr, '$$.memo'), '') AS memo,
       |    CASE WHEN event = 'mt_transfer'
       |         THEN json_extract_string(dr, '$$.old_owner_id')
       |         ELSE json_extract_string(dr, '$$.owner_id') END AS old_owner_id,
       |    CASE WHEN event = 'mt_transfer'
       |         THEN json_extract_string(dr, '$$.new_owner_id')
       |         ELSE json_extract_string(dr, '$$.owner_id') END AS new_owner_id,
       |    unnest(list_zip(
       |      from_json(json_extract(dr, '$$.token_ids'), '["VARCHAR"]'),
       |      from_json(json_extract(dr, '$$.amounts'), '["VARCHAR"]'))) AS pair
       |  FROM nb),
       |td AS (SELECT ne.related_receipt_id AS rid,
       |    coalesce(json_extract_string(unnest(from_json(data, '["JSON"]')),
       |      '$$.referral'), '') AS referral
       |  FROM ne WHERE contract_id IN $prodIn AND standard = 'dip4'
       |    AND event = 'token_diff' AND block_timestamp_ns >= 0),
       |ad AS (SELECT price_updated_at_ns // 86400000000000 AS price_day,
       |    defuse_asset_id, decimals, price, symbol, blockchain FROM na),
       |j AS (SELECT n.block_timestamp_ns, n.day, n.block_hash, n.event,
       |    n.memo, n.old_owner_id, n.new_owner_id,
       |    pair[1] AS token_id,
       |    (CAST(pair[2] AS DOUBLE) / pow(10, ad.decimals)) * ad.price
       |      AS usd_value,
       |    ad.symbol, ad.blockchain, td.referral
       |  FROM n
       |  LEFT JOIN td ON td.rid = n.related_receipt_id
       |  LEFT JOIN ad ON n.day = ad.price_day
       |    AND pair[1] = ad.defuse_asset_id
       |  WHERE NOT (length(td.referral) = 0 AND length(n.memo) = 0)),
       |dd AS (SELECT DISTINCT block_timestamp_ns, day, block_hash, event,
       |    memo, old_owner_id, new_owner_id, token_id, usd_value, symbol,
       |    blockchain, referral FROM j)
       |SELECT day, symbol, coalesce(referral, 'Others') AS referral,
       |  blockchain,
       |  SUM(CASE WHEN event = 'mt_transfer' THEN usd_value END)
       |    AS transfer_volume,
       |  SUM(CASE WHEN event = 'mt_mint' THEN usd_value END) AS deposits,
       |  SUM(CASE WHEN event = 'mt_burn' THEN usd_value END) * -1
       |    AS withdraws,
       |  SUM(CASE WHEN event = 'mt_mint' THEN usd_value
       |      WHEN event = 'mt_burn' THEN usd_value * -1 END) AS netflow
       |FROM dd
       |WHERE symbol != '' AND blockchain != ''
       |GROUP BY day, symbol, coalesce(referral, 'Others'), blockchain
       |ORDER BY day, symbol, referral""".stripMargin)

  // ---------------------------------------------------------------------
  // Deep-chain scale corpus (BlockGen.genDeepBlocks): the corpus is
  // CLOSED-FORM in (origin k, height h0 = 1000 + 10k, gap g =
  // {1,5,50,51}[k%4], depth d_max = 3 + k%3), so the oracles regenerate
  // the ground truth from range() — no recursion — while the Spark side
  // must run the real multi-hop resolution/BFS/cascade to agree.
  // TTL rule (NearModel.TtlBlocks = 50, reference config.rs:27-29):
  // hop resolves iff gap <= 50, so gap-51 chains keep only their seed.
  // ---------------------------------------------------------------------

  private val deepChainCte: String =
    """WITH c AS (
      |  SELECT k,
      |    CAST(1000 + k*10 AS BIGINT) AS h0,
      |    CAST(CASE k % 4 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 50
      |         ELSE 51 END AS BIGINT) AS g,
      |    3 + (k % 3) AS d_max
      |  FROM (SELECT unnest(range(0, 400)) AS k)),
      |dd AS (SELECT unnest(range(0, 6)) AS d)""".stripMargin

  val scaleResolverSql: String =
    s"""$deepChainCte
      |SELECT 'r' || CAST(h0 AS VARCHAR) || 'x' || CAST(d AS VARCHAR)
      |    AS receipt_id,
      |  'tx' || CAST(h0 AS VARCHAR) AS tx_hash,
      |  TRUE AS main,
      |  h0 + d*g AS entry_height
      |FROM c CROSS JOIN dd
      |WHERE d <= d_max AND (d = 0 OR g <= 50)
      |ORDER BY receipt_id""".stripMargin

  val scaleDepthSql: String =
    s"""$deepChainCte
      |SELECT 'r' || CAST(h0 AS VARCHAR) || 'x' || CAST(d AS VARCHAR)
      |    AS receipt_id,
      |  d AS depth
      |FROM c CROSS JOIN dd
      |WHERE d <= d_max
      |ORDER BY receipt_id""".stripMargin

  /** Gold over the hot-key skew corpus (BlockGen.genSkewBlocks):
    * closed-form — every cold event lands in `Others`, every hot event
    * survives the DISTINCT (unique dyadic usd values) and fans out
    * across the 3 hot referrals; sums are exact (n/64 addends), so
    * SUM order cannot flake the hash. Replays the G5 formula
    * (amount / 10^decimals · price) verbatim. */
  val skewGoldSql: String =
    """WITH cold AS (SELECT unnest(range(0, 400)) AS k),
      |hot AS (SELECT unnest(range(0, 1600)) AS j),
      |refs AS (SELECT unnest(['alpha','beta','gamma']) AS referral),
      |rows_ AS (
      |  SELECT (CAST(15625 * (10000 + k) AS DOUBLE) / pow(10, 6)) * 1.0
      |      AS usd, 'Others' AS referral
      |  FROM cold
      |  UNION ALL
      |  SELECT (CAST(15625 * (j + 1) AS DOUBLE) / pow(10, 6)) * 1.0
      |      AS usd, referral
      |  FROM hot CROSS JOIN refs)
      |SELECT CAST(1700000000000000000 // 86400000000000 AS BIGINT) AS day,
      |  'USDC' AS symbol, referral, 'near' AS blockchain,
      |  SUM(usd) AS transfer_volume,
      |  CAST(NULL AS DOUBLE) AS deposits,
      |  CAST(NULL AS DOUBLE) AS withdraws,
      |  CAST(NULL AS DOUBLE) AS netflow
      |FROM rows_
      |GROUP BY referral
      |ORDER BY day, symbol, referral""".stripMargin

  val scaleEventsSql: String =
    s"""$deepChainCte
      |SELECT h0 + d_max*g AS block_height,
      |  'r' || CAST(h0 AS VARCHAR) || 'x' || CAST(d_max - 1 AS VARCHAR)
      |    AS related_receipt_id,
      |  'tx' || CAST(h0 AS VARCHAR) AS tx_hash,
      |  'a' || CAST(h0 AS VARCHAR) || '.near' AS old_owner_id,
      |  'b' || CAST(h0 AS VARCHAR) || '.near' AS new_owner_id,
      |  'nep141:usdc.near' AS token_id,
      |  CAST(k AS DOUBLE) AS amount,
      |  'm' || CAST(h0 AS VARCHAR) AS memo
      |FROM c
      |WHERE g <= 50
      |ORDER BY related_receipt_id""".stripMargin
}
