package graft

import org.apache.spark.sql.Encoders
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{EventRow, ExecutionOutcomeRow, ReceiptRow, TransactionRow}
import graft.sink.ClickHouseDialect._

/** The ClickHouse seam, asserted against the reference's own DDL
  * (clickhouse/init/01-core-tables.sql) — every statement a live
  * ClickHouse target would receive is generated and checked here; the
  * only untested step is the JDBC `execute` itself (no server in this
  * sandbox — see the dialect's scaladoc and README seam note). */
class ClickHouseDialectSpec extends AnyFunSuite {

  private val eventSchema = Encoders.product[EventRow].schema
  private val txSchema = Encoders.product[TransactionRow].schema
  private val receiptSchema = Encoders.product[ReceiptRow].schema
  private val outcomeSchema = Encoders.product[ExecutionOutcomeRow].schema

  test("events DDL: engine/key/settings match 01-core-tables.sql:24-27") {
    val ddl = createTableDdl(eventsSpec, eventSchema)
    // the ReplacingMergeTree contract lines, verbatim from the reference
    assert(ddl.contains("ENGINE = ReplacingMergeTree"))
    assert(ddl.contains(
      "PRIMARY KEY (block_height, related_receipt_id, index_in_log)"))
    assert(ddl.contains(
      "ORDER BY (block_height, related_receipt_id, index_in_log)"))
    assert(ddl.contains("SETTINGS index_granularity = 8192"))
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS events ("))
  }

  test("events DDL: column types mirror the reference schema") {
    val ddl = createTableDdl(eventsSpec, eventSchema)
    assert(ddl.contains("block_height UInt64"))
    // block_timestamp_ns Long renders as the reference's DateTime64(9)
    assert(ddl.contains("block_timestamp DateTime64(9, 'UTC')"))
    assert(!ddl.contains("block_timestamp_ns"))
    assert(ddl.contains("contract_id String"))
    // the ONE nullable scalar (01-core-tables.sql:18)
    assert(ddl.contains("tx_hash Nullable(String)"))
    assert(ddl.contains("index_in_log UInt64"))
    assert(ddl.contains("receipt_index_in_block UInt64"))
    // exactly one Nullable column in this table
    assert(ddl.split("Nullable").length === 2)
  }

  test("events DDL: skip indexes (minmax + bloom) as in the reference") {
    val ddl = createTableDdl(eventsSpec, eventSchema)
    assert(ddl.contains(
      "INDEX block_timestamp_minmax_idx block_timestamp TYPE minmax GRANULARITY 1"))
    assert(ddl.contains(
      "INDEX contract_id_bloom_idx contract_id TYPE bloom_filter() GRANULARITY 1"))
    assert(ddl.contains(
      "INDEX related_receipt_id_bloom_idx related_receipt_id TYPE bloom_filter() GRANULARITY 1"))
  }

  test("core-table keys: transactions/receipts/outcomes order keys") {
    assert(createTableDdl(transactionsSpec, txSchema)
      .contains("ORDER BY (block_height, transaction_hash)"))
    assert(createTableDdl(receiptsSpec, receiptSchema)
      .contains("ORDER BY (block_height, receipt_id)"))
    val oddl = createTableDdl(executionOutcomesSpec, outcomeSchema)
    assert(oddl.contains("ORDER BY (block_height, execution_outcome_id)"))
    // Array(String) for receipt_ids; u128-as-string for tokens_burnt
    assert(oddl.contains("receipt_ids Array(String)"))
    assert(oddl.contains("tokens_burnt String"))
    assert(oddl.contains("gas_burnt UInt64"))
  }

  test("insert SQL: parameterized batch statement with renamed columns") {
    val sql = insertSql(transactionsSpec, txSchema)
    assert(sql === "INSERT INTO transactions (block_height, " +
      "block_timestamp, block_hash, transaction_hash, signer_id, " +
      "receiver_id, actions) VALUES (?, ?, ?, ?, ?, ?, ?)")
    // ns-Long timestamp binds through server-side toDateTime64
    val tsField = txSchema("block_timestamp_ns")
    assert(insertColumnExpr(transactionsSpec, tsField) ===
      "toDateTime64(? / 1000000000, 9)")
    assert(insertColumnExpr(transactionsSpec, txSchema("block_hash")) === "?")
  }

  test("literal VALUES insert: escaping, options, arrays, NULL") {
    assert(literal("it's") === "'it\\'s'")
    assert(literal("a\\b") === "'a\\\\b'")
    assert(literal(None) === "NULL")
    assert(literal(Some("x")) === "'x'")
    assert(literal(Seq("a", "b")) === "['a', 'b']")
    assert(literal(42L) === "42")
    import org.apache.spark.sql.types._
    val sql = insertValuesSql(
      ChTableSpec("t", Seq("a")),
      StructType(Seq(StructField("a", LongType), StructField("b", StringType))),
      Seq(Seq(1L, "x"), Seq(2L, "y's")))
    assert(sql === "INSERT INTO t (a, b) VALUES (1, 'x'), (2, 'y\\'s')")
  }

  test("FINAL read and OPTIMIZE compaction text") {
    assert(selectFinalSql(eventsSpec) === "SELECT * FROM events FINAL")
    assert(optimizeSql(eventsSpec) === "OPTIMIZE TABLE events FINAL")
  }

  test("K1 retry wiring: failed batch re-executes whole, then succeeds") {
    var calls = List.empty[String]
    var failures = 2
    val flaky: String => Unit = sql => {
      calls ::= sql
      if (sql.startsWith("INSERT") && failures > 0) {
        failures -= 1
        throw new RuntimeException("simulated ClickHouse unavailable")
      }
    }
    executeBatchWithRetry(flaky, Seq("DDL1", "INSERT a", "INSERT b"))
    val seen = calls.reverse
    // two failed attempts abort mid-batch, third runs through — the
    // replayed DDL/INSERT prefix is the at-least-once delivery the
    // ReplacingMergeTree key dedups (reference database.rs:53-57)
    assert(seen === Seq("DDL1", "INSERT a", "DDL1", "INSERT a",
      "DDL1", "INSERT a", "INSERT b"))
  }

  test("unmapped Spark type fails loudly") {
    intercept[IllegalArgumentException] {
      chType(org.apache.spark.sql.types.BinaryType)
    }
  }
}
