package graft.model

/** Data model for the NEAR-indexer capabilities (SURVEY.md §1).
  *
  * Input shape mirrors the fields the reference's extractors actually
  * read from a `StreamerMessage` (FIXTURES.md §1; reference:
  * indexer-common/src/extractors, the .rs files), expressed as Scala case classes
  * so fixtures are `Dataset[Block]`s with full Encoder support.
  *
  * Timestamps are epoch NANOSECONDS kept as Long end-to-end — the
  * source of truth, exactly like the reference's `block_timestamp: u64`
  * (indexer-primitives/src/lib.rs:28); µs/TimestampType views are
  * derived only at comparison boundaries.
  */

// ---------------------------------------------------------------- input

case class BlockHeader(height: Long, timestamp: Long, hash: String)

/** Tagged action, serialized into the `actions` JSON string columns as
  * `{"action_type": ..., "params": {...}}` — reference:
  * indexer-primitives/src/lib.rs:93-108. `params` is a raw JSON string
  * (schema-on-read, like the reference's serde_json::Value).
  * `serializable=false` models the reference's silently-skipped
  * unserializable variants (filter_map(.ok())). */
case class ActionView(
    action_type: String,
    params: String,
    serializable: Boolean = true)

case class TransactionView(
    hash: String,
    signer_id: String,
    receiver_id: String,
    actions: Seq[ActionView])

/** Execution outcome fields read by the extractors — reference:
  * FIXTURES.md §1. `status_kind` ∈ SuccessReceiptId | SuccessValue |
  * Unknown | Failure (mapped to snake_case downstream, events.rs:235-246). */
case class OutcomeView(
    executor_id: String,
    receipt_ids: Seq[String],
    status_kind: String,
    logs: Seq[String],
    tokens_burnt: String,
    gas_burnt: Long)

case class TxWithOutcome(
    transaction: TransactionView,
    outcome_id: String,
    outcome: OutcomeView)

/** Receipt enum projection (reference: receipts_and_outcomes.rs:193-225):
  * kind ∈ Action (actions used) | Data (data used) |
  * GlobalContractDistribution (empty actions string). */
case class ReceiptView(
    receipt_id: String,
    receiver_id: String,
    predecessor_id: String,
    kind: String,
    actions: Seq[ActionView],
    data: Option[String])

case class OutcomeWithReceipt(
    receipt: ReceiptView,
    outcome_id: String,
    outcome: OutcomeView)

case class Chunk(transactions: Seq[TxWithOutcome])

case class Shard(
    chunk: Option[Chunk],
    receipt_execution_outcomes: Seq[OutcomeWithReceipt])

/** The unit of ingestion (one block, processed in height order). */
case class Block(header: BlockHeader, shards: Seq[Shard])

// --------------------------------------------------------------- bronze

/** events table row — reference: indexer-primitives/src/lib.rs:24-42,
  * clickhouse/init/01-core-tables.sql:4-27. */
case class EventRow(
    block_height: Long,
    block_timestamp_ns: Long,
    block_hash: String,
    contract_id: String,
    execution_status: String,
    version: String,
    standard: String,
    index_in_log: Long,
    event: String,
    data: String,
    related_receipt_id: String,
    related_receipt_receiver_id: String,
    related_receipt_predecessor_id: String,
    tx_hash: Option[String],
    receipt_index_in_block: Long)

/** transactions table row — lib.rs:52-62 / 01-core-tables.sql:30-45. */
case class TransactionRow(
    block_height: Long,
    block_timestamp_ns: Long,
    block_hash: String,
    transaction_hash: String,
    signer_id: String,
    receiver_id: String,
    actions: String)

/** receipts table row — lib.rs:64-75 / 01-core-tables.sql:48-65. */
case class ReceiptRow(
    block_height: Long,
    block_timestamp_ns: Long,
    block_hash: String,
    parent_transaction_hash: String,
    receipt_id: String,
    receiver_id: String,
    predecessor_id: String,
    actions: String)

/** execution_outcomes table row — lib.rs:77-91 / 01-core-tables.sql:68-86.
  * tokens_burnt is a u128 kept as string, by design. */
case class ExecutionOutcomeRow(
    block_height: Long,
    block_timestamp_ns: Long,
    block_hash: String,
    parent_transaction_hash: String,
    executor_id: String,
    receipt_ids: Seq[String],
    status: String,
    logs: String,
    tokens_burnt: String,
    gas_burnt: Long,
    execution_outcome_id: String)

// ---------------------------------------------------------------- config

/** Accounts-of-interest configuration — reference:
  * indexer-common/src/lib.rs:10-11, indexer-clickhouse/src/config.rs:52-55,
  * CLAUDE.md "Accounts of Interest — CRITICAL" (prod vs staging split). */
case class AccountsConfig(
    prodContracts: Seq[String] = Seq("defuse-alpha.near", "intents.near"),
    stagingContracts: Seq[String] = Seq("staging-intents.near")) {
  def all: Seq[String] = prodContracts ++ stagingContracts
}

object NearModel {
  /** Execution-status mapping — reference: events.rs:235-246. */
  val StatusMapping: Map[String, String] = Map(
    "SuccessReceiptId" -> "success_receipt_id",
    "SuccessValue" -> "success_value",
    "Unknown" -> "unknown",
    "Failure" -> "failure")

  /** Receipt→tx state TTL in blocks (≈ 900 s; README.md:10). */
  val TtlBlocks: Long = 50L

  val EventJsonPrefix = "EVENT_JSON:"
}
