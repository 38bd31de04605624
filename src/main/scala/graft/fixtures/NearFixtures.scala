package graft.fixtures

import graft.model._

/** Deterministic NEAR fixture corpus (FIXTURES.md §1-§2) plus the pinned
  * expected bronze rows, shared by BOTH sides of the correctness gate:
  *
  *  - the Spark queries run the real extraction/resolution over
  *    [[blocks]] and are compared against [[expectedEvents]] etc.
  *    rendered as DuckDB VALUES (a golden test of P1-P13 + T2-T5), and
  *  - the silver/gold queries consume [[expectedEvents]] as input while
  *    their oracles re-implement M1-M10/G1-G8 independently in DuckDB
  *    JSON SQL over the same VALUES (a differential test).
  *
  * Coverage: multi-hop receipt chains, potential-tier seeds (tx2 not of
  * interest), TTL-expired propagation (r3→r9, gap 60 > 50 blocks),
  * unresolvable receipts dropped (r7, r9), refund predecessor `system`
  * (r7), malformed EVENT_JSON, non-prefixed logs, substring filter
  * misses, unserializable actions skipped, Action/Data/
  * GlobalContractDistribution receipt kinds, prod vs staging contracts,
  * and two event days for the gold view.
  */
object NearFixtures {

  val accounts: AccountsConfig = AccountsConfig()

  val T0: Long = 1700000000000000000L // epoch ns
  val Day: Long = 86400L * 1000000000L

  // ------------------------------------------------------- event payloads
  // All JSON minified (no spaces) so from_json's raw-substring `data`
  // round-trips byte-identically; integer-only numbers for the same
  // reason. No single quotes anywhere → trivial SQL literal rendering.

  private def ej(json: String) = NearModel.EventJsonPrefix + json

  val dNep245Transfer =
    """[{"memo":"swap","old_owner_id":"alice.near","new_owner_id":"bob.near","token_ids":["nep141:usdc.near","nep141:wnear.near"],"amounts":["1000000","2500000000"]},{"old_owner_id":"x.near","new_owner_id":"y.near","token_ids":["nep141:dai.near"],"amounts":["7"]}]"""
  val dTokenDiffR1 =
    """[{"account_id":"alice.near","diff":{"nep141:usdc.near":1000000},"intent_hash":"ihr1","referral":"partner.near"}]"""
  val dTokenDiffR4 =
    """[{"account_id":"alice.near","diff":{"nep141:usdc.near":-5000000,"nep141:wnear.near":2500000000},"intent_hash":"ih1","referral":"app.near"},{"account_id":"bob.near","diff":{"nep141:dai.near":15},"intent_hash":"ih2"}]"""
  val dDip4Transfer =
    """[{"memo":"tip","account_id":"carol.near","receiver_id":"dan.near","intent_hash":"ih3","tokens":{"nep141:usdc.near":"42","nep141:wnear.near":"100"}}]"""
  val dPublicKey =
    """{"account_id":"alice.near","public_key":"ed25519:AbCdEf"}"""
  val dFeeChanged = """{"old_fee":"30","new_fee":"25"}"""
  val dIntentsExecuted =
    """[{"account_id":"alice.near","intent_hash":"ih1"},{"account_id":"bob.near","intent_hash":"ih2"}]"""
  val dMtBurnR7 =
    """[{"owner_id":"gone.near","token_ids":["nep141:usdc.near"],"amounts":["5"]}]"""
  val dStagingTransfer =
    """[{"account_id":"eve.near","receiver_id":"frank.near","intent_hash":"ih4","tokens":{"nep141:usdc.near":"9"}}]"""
  val dStagingMint =
    """[{"owner_id":"eve.near","token_ids":["nep141:usdc.near"],"amounts":["11"]}]"""
  val dMtMintR9 =
    """[{"owner_id":"ghost.near","token_ids":["nep141:usdc.near"],"amounts":["13"]}]"""
  val dD2Transfer =
    """[{"memo":"d2","old_owner_id":"g.near","new_owner_id":"h.near","token_ids":["nep141:usdc.near"],"amounts":["3000000"]}]"""
  val dD2Mint =
    """[{"memo":"mintmemo","owner_id":"bob.near","token_ids":["nep141:wnear.near"],"amounts":["500"]}]"""

  private def payload(standard: String, event: String, data: String) =
    s"""{"standard":"$standard","version":"1.0.0","event":"$event","data":$data}"""

  // --------------------------------------------------------------- blocks

  private def out(receipt: ReceiptView, id: String, o: OutcomeView) =
    OutcomeWithReceipt(receipt, id, o)

  def blocks: Seq[Block] = Seq(
    Block(BlockHeader(100L, T0, "B100"), Seq(Shard(
      chunk = Some(Chunk(Seq(
        TxWithOutcome(
          TransactionView("tx1", "alice.near", "intents.near", Seq(
            ActionView("FunctionCall",
              """{"method_name":"execute","deposit":"0"}"""),
            ActionView("Delegate", "{}", serializable = false))),
          "oc_tx1",
          OutcomeView("alice.near", Seq("r1"), "SuccessReceiptId", Nil, "0", 1L)),
        TxWithOutcome(
          TransactionView("tx2", "bob.near", "carol.near", Seq(
            ActionView("Transfer", """{"deposit":"100"}"""))),
          "oc_tx2",
          OutcomeView("bob.near", Seq("r2"), "SuccessReceiptId", Nil, "0", 1L)),
        TxWithOutcome(
          TransactionView("tx3", "dave.near", "defuse-alpha.near", Seq(
            ActionView("Transfer", """{"deposit":"1"}"""))),
          "oc_tx3",
          OutcomeView("dave.near", Seq("r3"), "SuccessReceiptId", Nil, "0", 1L)))),
      ),
      receipt_execution_outcomes = Nil))),

    Block(BlockHeader(101L, T0 + 1000000000L, "B101"), Seq(Shard(
      chunk = Some(Chunk(Seq(
        TxWithOutcome(
          TransactionView("tx4", "eve.near", "staging-intents.near", Seq(
            ActionView("FunctionCall", """{"method_name":"transfer"}"""))),
          "oc_tx4",
          OutcomeView("eve.near", Seq("r8"), "SuccessReceiptId", Nil, "0", 1L)))),
      ),
      receipt_execution_outcomes = Seq(
        out(ReceiptView("r1", "intents.near", "alice.near", "Action", Seq(
            ActionView("FunctionCall", """{"method_name":"execute"}""")), None),
          "o1",
          OutcomeView("intents.near", Seq("r4", "r5"), "SuccessReceiptId",
            Seq(ej(payload("nep245", "mt_transfer", dNep245Transfer)),
              "plain log without prefix",
              ej("""{"standard":"other","version":"1.0.0","event":"noop","data":{}}"""),
              ej(payload("dip4", "token_diff", dTokenDiffR1))),
            "300", 100L)),
        out(ReceiptView("r2", "carol.near", "bob.near", "Action", Seq(
            ActionView("Transfer", """{"deposit":"100"}""")), None),
          "o2",
          OutcomeView("carol.near", Seq("r6"), "SuccessValue", Nil, "0", 50L)))))),

    Block(BlockHeader(102L, T0 + 2000000000L, "B102"), Seq(Shard(
      chunk = None,
      receipt_execution_outcomes = Seq(
        out(ReceiptView("r4", "defuse-alpha.near", "intents.near", "Action", Seq(
            ActionView("FunctionCall", """{"method_name":"mt_transfer"}""")), None),
          "o3",
          OutcomeView("defuse-alpha.near", Nil, "SuccessValue",
            Seq(ej(payload("dip4", "token_diff", dTokenDiffR4)),
              """EVENT_JSON:{"standard":"dip4", broken"""),
            "0", 10L)),
        out(ReceiptView("r6", "intents.near", "carol.near", "Action", Nil, None),
          "o4",
          OutcomeView("intents.near", Nil, "Failure",
            Seq(ej(payload("dip4", "transfer", dDip4Transfer)),
              ej(payload("dip4", "public_key_added", dPublicKey)),
              ej(payload("dip4", "fee_changed", dFeeChanged)),
              ej(payload("dip4", "intents_executed", dIntentsExecuted))),
            "0", 20L)),
        out(ReceiptView("r7", "intents.near", "system", "Action", Nil, None),
          "o5",
          OutcomeView("intents.near", Nil, "SuccessValue",
            Seq(ej(payload("nep245", "mt_burn", dMtBurnR7))), "0", 5L)),
        out(ReceiptView("r8", "staging-intents.near", "eve.near", "Data", Nil,
            Some("""{"value":1}""")),
          "o6",
          OutcomeView("staging-intents.near", Nil, "SuccessValue",
            Seq(ej(payload("dip4", "transfer", dStagingTransfer)),
              ej(payload("nep245", "mt_mint", dStagingMint))),
            "0", 7L)))))),

    Block(BlockHeader(160L, T0 + 3 * Day, "B160"), Seq(Shard(
      chunk = Some(Chunk(Seq(
        TxWithOutcome(
          TransactionView("tx5", "alice.near", "intents.near", Nil),
          "oc_tx5",
          OutcomeView("alice.near", Seq("r10"), "SuccessReceiptId", Nil, "0", 1L)))),
      ),
      receipt_execution_outcomes = Seq(
        out(ReceiptView("r3", "defuse-alpha.near", "dave.near",
            "GlobalContractDistribution", Nil, None),
          "o7",
          OutcomeView("defuse-alpha.near", Seq("r9"), "SuccessValue", Nil,
            "0", 9L)))))),

    Block(BlockHeader(161L, T0 + 3 * Day + 1000000000L, "B161"), Seq(Shard(
      chunk = None,
      receipt_execution_outcomes = Seq(
        out(ReceiptView("r9", "intents.near", "defuse-alpha.near", "Action",
            Nil, None),
          "o8",
          OutcomeView("intents.near", Nil, "SuccessValue",
            Seq(ej(payload("nep245", "mt_mint", dMtMintR9))), "0", 3L)),
        out(ReceiptView("r10", "intents.near", "alice.near", "Action", Seq(
            ActionView("FunctionCall", """{"method_name":"execute"}""")), None),
          "o10",
          OutcomeView("intents.near", Nil, "SuccessValue",
            Seq(ej(payload("nep245", "mt_transfer", dD2Transfer)),
              ej(payload("nep245", "mt_mint", dD2Mint))), "0", 4L)))))))

  // -------------------------------------------------- expected bronze rows

  /** Expected `events` rows after extraction + resolution + drop policy.
    * Hand-derived from [[blocks]]; the gate compares the real pipeline
    * against these (rendered as VALUES). */
  def expectedEvents: Seq[EventRow] = Seq(
    EventRow(101L, T0 + 1000000000L, "B101", "intents.near",
      "success_receipt_id", "1.0.0", "nep245", 0L, "mt_transfer",
      dNep245Transfer, "r1", "intents.near", "alice.near", Some("tx1"), 0L),
    EventRow(101L, T0 + 1000000000L, "B101", "intents.near",
      "success_receipt_id", "1.0.0", "dip4", 3L, "token_diff",
      dTokenDiffR1, "r1", "intents.near", "alice.near", Some("tx1"), 0L),
    EventRow(102L, T0 + 2000000000L, "B102", "defuse-alpha.near",
      "success_value", "1.0.0", "dip4", 0L, "token_diff",
      dTokenDiffR4, "r4", "defuse-alpha.near", "intents.near", Some("tx1"), 0L),
    EventRow(102L, T0 + 2000000000L, "B102", "intents.near",
      "failure", "1.0.0", "dip4", 0L, "transfer",
      dDip4Transfer, "r6", "intents.near", "carol.near", Some("tx2"), 1L),
    EventRow(102L, T0 + 2000000000L, "B102", "intents.near",
      "failure", "1.0.0", "dip4", 1L, "public_key_added",
      dPublicKey, "r6", "intents.near", "carol.near", Some("tx2"), 1L),
    EventRow(102L, T0 + 2000000000L, "B102", "intents.near",
      "failure", "1.0.0", "dip4", 2L, "fee_changed",
      dFeeChanged, "r6", "intents.near", "carol.near", Some("tx2"), 1L),
    EventRow(102L, T0 + 2000000000L, "B102", "intents.near",
      "failure", "1.0.0", "dip4", 3L, "intents_executed",
      dIntentsExecuted, "r6", "intents.near", "carol.near", Some("tx2"), 1L),
    EventRow(102L, T0 + 2000000000L, "B102", "staging-intents.near",
      "success_value", "1.0.0", "dip4", 0L, "transfer",
      dStagingTransfer, "r8", "staging-intents.near", "eve.near", Some("tx4"), 3L),
    EventRow(102L, T0 + 2000000000L, "B102", "staging-intents.near",
      "success_value", "1.0.0", "nep245", 1L, "mt_mint",
      dStagingMint, "r8", "staging-intents.near", "eve.near", Some("tx4"), 3L),
    EventRow(161L, T0 + 3 * Day + 1000000000L, "B161", "intents.near",
      "success_value", "1.0.0", "nep245", 0L, "mt_transfer",
      dD2Transfer, "r10", "intents.near", "alice.near", Some("tx5"), 1L),
    EventRow(161L, T0 + 3 * Day + 1000000000L, "B161", "intents.near",
      "success_value", "1.0.0", "nep245", 1L, "mt_mint",
      dD2Mint, "r10", "intents.near", "alice.near", Some("tx5"), 1L))

  /** Expected `transactions` rows (accounts-of-interest only; tx2 is
    * bob→carol and filtered; tx1's Delegate action is unserializable and
    * skipped from the JSON). */
  def expectedTransactions: Seq[TransactionRow] = Seq(
    TransactionRow(100L, T0, "B100", "tx1", "alice.near", "intents.near",
      """[{"action_type":"FunctionCall","params":{"method_name":"execute","deposit":"0"}}]"""),
    TransactionRow(100L, T0, "B100", "tx3", "dave.near", "defuse-alpha.near",
      """[{"action_type":"Transfer","params":{"deposit":"1"}}]"""),
    TransactionRow(101L, T0 + 1000000000L, "B101", "tx4", "eve.near",
      "staging-intents.near",
      """[{"action_type":"FunctionCall","params":{"method_name":"transfer"}}]"""),
    TransactionRow(160L, T0 + 3 * Day, "B160", "tx5", "alice.near",
      "intents.near", "[]"))

  /** Expected `receipts` rows (outcomes of interest; r2 filtered out).
    * Kinds: Action→actions JSON, Data→raw data / "null",
    * GlobalContractDistribution→"". Unresolved parents → ''. */
  def expectedReceipts: Seq[ReceiptRow] = Seq(
    ReceiptRow(101L, T0 + 1000000000L, "B101", "tx1", "r1", "intents.near",
      "alice.near",
      """[{"action_type":"FunctionCall","params":{"method_name":"execute"}}]"""),
    ReceiptRow(102L, T0 + 2000000000L, "B102", "tx1", "r4",
      "defuse-alpha.near", "intents.near",
      """[{"action_type":"FunctionCall","params":{"method_name":"mt_transfer"}}]"""),
    ReceiptRow(102L, T0 + 2000000000L, "B102", "tx2", "r6", "intents.near",
      "carol.near", "[]"),
    ReceiptRow(102L, T0 + 2000000000L, "B102", "", "r7", "intents.near",
      "system", "[]"),
    ReceiptRow(102L, T0 + 2000000000L, "B102", "tx4", "r8",
      "staging-intents.near", "eve.near", """{"value":1}"""),
    // r3's seed entry (height 100) is TTL-expired by its execution at
    // 160 (gap 60 > 50) — the lookup misses, parent stays ''
    ReceiptRow(160L, T0 + 3 * Day, "B160", "", "r3", "defuse-alpha.near",
      "dave.near", ""),
    ReceiptRow(161L, T0 + 3 * Day + 1000000000L, "B161", "", "r9",
      "intents.near", "defuse-alpha.near", "[]"),
    ReceiptRow(161L, T0 + 3 * Day + 1000000000L, "B161", "tx5", "r10",
      "intents.near", "alice.near",
      """[{"action_type":"FunctionCall","params":{"method_name":"execute"}}]"""))

  /** JSON-encode a log array exactly like Spark's to_json — i.e.
    * Jackson's escaping: short escapes for \b \t \n \f \r, uppercase
    * `\u00XX` for other control chars, no spaces; `[]` when empty
    * (P12). */
  def jsonLogs(logs: Seq[String]): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\b' => "\\b"
      case '\t' => "\\t"
      case '\n' => "\\n"
      case '\f' => "\\f"
      case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04X"
      case c => c.toString
    }
    if (logs.isEmpty) "[]"
    else logs.map(s => "\"" + esc(s) + "\"").mkString("[", ",", "]")
  }

  private def logsOf(oid: String): Seq[String] = {
    val all = blocks.flatMap(_.shards).flatMap(_.receipt_execution_outcomes)
    all.find(_.outcome_id == oid).get.outcome.logs
  }

  /** Expected `execution_outcomes` rows + trailing receipt_id column
    * (the extractor keeps it for the resolver join). */
  def expectedOutcomes: Seq[(ExecutionOutcomeRow, String)] = Seq(
    (ExecutionOutcomeRow(101L, T0 + 1000000000L, "B101", "tx1",
      "intents.near", Seq("r4", "r5"), "success_receipt_id",
      jsonLogs(logsOf("o1")), "300", 100L, "o1"), "r1"),
    (ExecutionOutcomeRow(102L, T0 + 2000000000L, "B102", "tx1",
      "defuse-alpha.near", Nil, "success_value",
      jsonLogs(logsOf("o3")), "0", 10L, "o3"), "r4"),
    (ExecutionOutcomeRow(102L, T0 + 2000000000L, "B102", "tx2",
      "intents.near", Nil, "failure",
      jsonLogs(logsOf("o4")), "0", 20L, "o4"), "r6"),
    (ExecutionOutcomeRow(102L, T0 + 2000000000L, "B102", "",
      "intents.near", Nil, "success_value",
      jsonLogs(logsOf("o5")), "0", 5L, "o5"), "r7"),
    (ExecutionOutcomeRow(102L, T0 + 2000000000L, "B102", "tx4",
      "staging-intents.near", Nil, "success_value",
      jsonLogs(logsOf("o6")), "0", 7L, "o6"), "r8"),
    (ExecutionOutcomeRow(160L, T0 + 3 * Day, "B160", "", // r3 TTL-expired
      "defuse-alpha.near", Seq("r9"), "success_value", "[]", "0", 9L, "o7"),
      "r3"),
    (ExecutionOutcomeRow(161L, T0 + 3 * Day + 1000000000L, "B161", "",
      "intents.near", Nil, "success_value",
      jsonLogs(logsOf("o8")), "0", 3L, "o8"), "r9"),
    (ExecutionOutcomeRow(161L, T0 + 3 * Day + 1000000000L, "B161", "tx5",
      "intents.near", Nil, "success_value",
      jsonLogs(logsOf("o10")), "0", 4L, "o10"), "r10"))

  /** Expected resolver output: (receipt_id, tx_hash, main, entry_height).
    * r7 never seeded; r9 blocked by TTL (hop at 160, seed at 100,
    * gap 60 > 50); r6 resolved through the potential tier (main=false). */
  def expectedResolution: Seq[(String, String, Boolean, Long)] = Seq(
    ("r1", "tx1", true, 100L),
    ("r10", "tx5", true, 160L),
    ("r2", "tx2", false, 100L),
    ("r3", "tx3", true, 100L),
    ("r4", "tx1", true, 101L),
    ("r5", "tx1", true, 101L),
    ("r6", "tx2", false, 101L),
    ("r8", "tx4", true, 101L))

  /** defuse_assets dimension fixture (S4 shape, 02-silver-tables.sql:12-22).
    * decimals ≤ 18 so pow(10, decimals) is an exact double in every
    * engine; two price days matching the two event days. */
  case class AssetRow(blockchain: String, contract_address: String,
      decimals: Long, defuse_asset_id: String, price: Double,
      price_updated_at_ns: Long, symbol: String)

  def assetRows: Seq[AssetRow] = Seq(
    AssetRow("near", "usdc.near", 6L, "nep141:usdc.near", 1.0,
      T0 + 1000000000L, "USDC"),
    AssetRow("near", "usdc.near", 6L, "nep141:usdc.near", 1.0,
      T0 + 3 * Day, "USDC"),
    AssetRow("near", "wnear.near", 18L, "nep141:wnear.near", 3.5,
      T0 + 1000000000L, "WNEAR"),
    AssetRow("near", "wnear.near", 18L, "nep141:wnear.near", 3.5,
      T0 + 3 * Day, "WNEAR"))

  /** The S4 HTTP feed body (`{"items":[...]}`, README.md:293-310) the
    * assets loader parses — rendered from [[assetRows]] so the loader's
    * output must equal the assets VALUES oracle. */
  def assetsJsonPayload: String = {
    val items = assetRows.map(a =>
      s"""{"blockchain":"${a.blockchain}",""" +
        s""""contract_address":"${a.contract_address}",""" +
        s""""decimals":${a.decimals},""" +
        s""""defuse_asset_id":"${a.defuse_asset_id}",""" +
        s""""price":${a.price},""" +
        s""""price_updated_at_ns":${a.price_updated_at_ns},""" +
        s""""symbol":"${a.symbol}"}""").mkString(",")
    s"""{"items":[$items]}"""
  }

  // ------------------------------------------------------- SQL rendering

  private def q(s: String) = "'" + s.replace("'", "''") + "'"
  private def qo(s: Option[String]) = s.map(q).getOrElse("NULL")
  private def L(x: Long) = s"CAST($x AS BIGINT)"
  private def strList(ss: Seq[String]) =
    if (ss.isEmpty) "CAST([] AS VARCHAR[])" else ss.map(q).mkString("[", ", ", "]")

  val eventCols: Seq[String] = Seq("block_height", "block_timestamp_ns",
    "block_hash", "contract_id", "execution_status", "version", "standard",
    "index_in_log", "event", "data", "related_receipt_id",
    "related_receipt_receiver_id", "related_receipt_predecessor_id",
    "tx_hash", "receipt_index_in_block")

  /** `ne(...) AS (VALUES ...)` CTE body for the expected events. */
  def eventsCte: String = {
    val rows = expectedEvents.map(e =>
      s"(${L(e.block_height)}, ${L(e.block_timestamp_ns)}, ${q(e.block_hash)}, " +
        s"${q(e.contract_id)}, ${q(e.execution_status)}, ${q(e.version)}, " +
        s"${q(e.standard)}, ${L(e.index_in_log)}, ${q(e.event)}, ${q(e.data)}, " +
        s"${q(e.related_receipt_id)}, ${q(e.related_receipt_receiver_id)}, " +
        s"${q(e.related_receipt_predecessor_id)}, ${qo(e.tx_hash)}, " +
        s"${L(e.receipt_index_in_block)})")
      .mkString(",\n    ")
    s"ne(${eventCols.mkString(", ")}) AS (VALUES\n    $rows)"
  }

  /** `nt(...) AS (VALUES ...)` CTE body for expected transactions. */
  def transactionsCte: String = {
    val rows = expectedTransactions.map(t =>
      s"(${L(t.block_height)}, ${L(t.block_timestamp_ns)}, ${q(t.block_hash)}, " +
        s"${q(t.transaction_hash)}, ${q(t.signer_id)}, ${q(t.receiver_id)}, " +
        s"${q(t.actions)})").mkString(",\n    ")
    "nt(block_height, block_timestamp_ns, block_hash, transaction_hash, " +
      s"signer_id, receiver_id, actions) AS (VALUES\n    $rows)"
  }

  def transactionsSql: String =
    s"WITH $transactionsCte\nSELECT * FROM nt ORDER BY transaction_hash"

  /** `nr(...) AS (VALUES ...)` CTE body for expected receipts. */
  def receiptsCte: String = {
    val rows = expectedReceipts.map(r =>
      s"(${L(r.block_height)}, ${L(r.block_timestamp_ns)}, ${q(r.block_hash)}, " +
        s"${q(r.parent_transaction_hash)}, ${q(r.receipt_id)}, " +
        s"${q(r.receiver_id)}, ${q(r.predecessor_id)}, ${q(r.actions)})")
      .mkString(",\n    ")
    "nr(block_height, block_timestamp_ns, block_hash, " +
      "parent_transaction_hash, receipt_id, receiver_id, predecessor_id, " +
      s"actions) AS (VALUES\n    $rows)"
  }

  def receiptsSql: String =
    s"WITH $receiptsCte\nSELECT * FROM nr ORDER BY receipt_id"

  /** `no_(...) AS (VALUES ...)` CTE body for expected outcomes. */
  def outcomesCte: String = {
    val rows = expectedOutcomes.map { case (o, rid) =>
      s"(${L(o.block_height)}, ${L(o.block_timestamp_ns)}, ${q(o.block_hash)}, " +
        s"${q(o.parent_transaction_hash)}, ${q(o.executor_id)}, " +
        s"${strList(o.receipt_ids)}, ${q(o.status)}, ${q(o.logs)}, " +
        s"${q(o.tokens_burnt)}, ${L(o.gas_burnt)}, " +
        s"${q(o.execution_outcome_id)}, ${q(rid)})"
    }.mkString(",\n    ")
    "no_(block_height, block_timestamp_ns, block_hash, " +
      "parent_transaction_hash, executor_id, receipt_ids, status, logs, " +
      s"tokens_burnt, gas_burnt, execution_outcome_id, receipt_id) AS (VALUES\n    $rows)"
  }

  /** receipt_ids serialized to a comma-joined string, mirroring the
    * declared query's concat_ws (the driver's compare cannot hash raw
    * arrays). */
  def outcomesSql: String =
    s"WITH $outcomesCte\nSELECT block_height, block_timestamp_ns, " +
      "block_hash, parent_transaction_hash, executor_id, " +
      // coalesce: DuckDB array_to_string([]) is NULL, Spark concat_ws is ''
      "coalesce(array_to_string(receipt_ids, ','), '') AS receipt_ids, " +
      "status, logs, " +
      "tokens_burnt, gas_burnt, execution_outcome_id, receipt_id " +
      "FROM no_ ORDER BY execution_outcome_id"

  def eventsSql: String =
    s"WITH $eventsCte\nSELECT * FROM ne " +
      "ORDER BY block_height, receipt_index_in_block, index_in_log"

  /** Receipt-DAG depth oracle: recursive closure over the pinned
    * outcome → receipt_ids edges, MIN(depth) per vertex from the
    * in-degree-0 roots — the independent replay of
    * [[graft.queries.NearQueries.nearReceiptDepth]]'s frontier BFS. */
  def receiptDepthSql: String =
    s"""WITH RECURSIVE $outcomesCte,
       |e AS (SELECT DISTINCT src, dst FROM (
       |    SELECT receipt_id AS src, unnest(receipt_ids) AS dst
       |    FROM no_) x),
       |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
       |roots AS (SELECT id FROM v WHERE id NOT IN (SELECT dst FROM e)),
       |walk(id, depth) AS (
       |  SELECT id, 0 FROM roots
       |  UNION ALL
       |  SELECT e.dst, walk.depth + 1 FROM walk JOIN e ON e.src = walk.id)
       |SELECT id AS receipt_id, CAST(MIN(depth) AS BIGINT) AS depth
       |FROM walk GROUP BY id ORDER BY receipt_id""".stripMargin

  def resolverSql: String = {
    val rows = expectedResolution.map { case (r, tx, main, h) =>
      s"(${q(r)}, ${q(tx)}, ${if (main) "TRUE" else "FALSE"}, ${L(h)})"
    }.mkString(",\n    ")
    "WITH rs(receipt_id, tx_hash, main, entry_height) AS (VALUES\n    " +
      rows + ")\nSELECT * FROM rs ORDER BY receipt_id"
  }

  def assetsCte: String = {
    val rows = assetRows.map(a =>
      s"(${q(a.blockchain)}, ${q(a.contract_address)}, ${L(a.decimals)}, " +
        s"${q(a.defuse_asset_id)}, CAST(${a.price} AS DOUBLE), " +
        s"${L(a.price_updated_at_ns)}, ${q(a.symbol)})").mkString(",\n    ")
    "na(blockchain, contract_address, decimals, defuse_asset_id, price, " +
      s"price_updated_at_ns, symbol) AS (VALUES\n    $rows)"
  }
}
