package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.NearFixtures
import graft.queries.NearQueries
import graft.silver.SilverTransforms
import graft.sink.{ClickHouseDialect, ClickHouseSilverDdl}

/** WIRE-LEVEL ClickHouse integration contract (VERDICT r11 #8 / r12
  * #7) — the one layer of SURVEY §2 unclosable in this sandbox (no
  * server, zero egress), pre-written so a server-equipped environment
  * enables it with ONE flag:
  *
  * {{{
  *   SPARK_GRAFT_CH_URL=http://localhost:8123 \
  *   SPARK_GRAFT_CH_USER=default SPARK_GRAFT_CH_PASSWORD=... \
  *   SPARK_GRAFT_CH_DATABASE=default sbt "testOnly graft.ClickHouseWireSpec"
  * }}}
  *
  * Without the URL every test CANCELS (assume), so the suite stays
  * green offline while the contract stays compiled against the real
  * seams.
  *
  * CONNECTION CONTRACT (reference indexer-clickhouse/src/database.rs:
  * 6-12): url + user + password + database — here carried over the
  * HTTP interface (POST the statement body; `X-ClickHouse-User` /
  * `X-ClickHouse-Key` headers; `database` query parameter), which
  * needs no driver jar and is the zero-dependency twin of the Rust
  * client's HTTP transport.
  *
  * INSERT FORMAT CONTRACT: [[ClickHouseDialect.insertValuesSql]]
  * (text VALUES) is correct at any size but the server parses the SQL
  * text, so payload cost is O(rows × textual width). The reference's
  * inserter streams RowBinary always (database.rs:95-101). Threshold:
  * keep VALUES below ~10k rows per statement (sub-MB SQL text, parse
  * cost noise); above it, POST `INSERT INTO t (cols) FORMAT RowBinary`
  * with the binary body — same at-least-once + FINAL semantics, the
  * encoding is the only difference. The micro-batch writer
  * ([[ClickHouseDialect.executeBatchWithRetry]]) is format-agnostic:
  * it retries whole statements, and replays are absorbed by
  * ReplacingMergeTree keys exactly as the parquet sink's FINAL read
  * absorbs them.
  *
  * DDL REPLAY CONTRACT: every statement in the init scripts is
  * `CREATE ... IF NOT EXISTS`, so the whole-batch retry (which
  * re-executes statements that already succeeded — K1's contract) is
  * idempotent across the full init surface.
  */
class ClickHouseWireSpec extends AnyFunSuite {

  private val chUrl = sys.env.get("SPARK_GRAFT_CH_URL")
  private def server: String =
    chUrl.getOrElse(fail("unreachable: assume() gates every test"))

  /** POST one statement over the HTTP interface; throws on non-200 —
    * the `execute` seam [[ClickHouseDialect.executeBatchWithRetry]]
    * wraps in the exponential-backoff retry. */
  private def httpExecute(sql: String): Unit = {
    val db = sys.env.getOrElse("SPARK_GRAFT_CH_DATABASE", "default")
    val url = new java.net.URI(s"$server/?database=$db").toURL
    val conn = url.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    // a hung/half-open server must fail the test, not stall the suite
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(30000)
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    sys.env.get("SPARK_GRAFT_CH_USER")
      .foreach(conn.setRequestProperty("X-ClickHouse-User", _))
    sys.env.get("SPARK_GRAFT_CH_PASSWORD")
      .foreach(conn.setRequestProperty("X-ClickHouse-Key", _))
    conn.getOutputStream.write(sql.getBytes("UTF-8"))
    conn.getOutputStream.close()
    val code = conn.getResponseCode
    if (code != 200) {
      val err = Option(conn.getErrorStream)
        .map(s => new String(s.readAllBytes(), "UTF-8")).getOrElse("")
      throw new RuntimeException(s"ClickHouse HTTP $code: $err")
    }
    conn.getInputStream.close()
  }

  private def httpQuery(sql: String): String = {
    val db = sys.env.getOrElse("SPARK_GRAFT_CH_DATABASE", "default")
    val url = new java.net.URI(s"$server/?database=$db").toURL
    val conn = url.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    // a hung/half-open server must fail the test, not stall the suite
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(30000)
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    sys.env.get("SPARK_GRAFT_CH_USER")
      .foreach(conn.setRequestProperty("X-ClickHouse-User", _))
    sys.env.get("SPARK_GRAFT_CH_PASSWORD")
      .foreach(conn.setRequestProperty("X-ClickHouse-Key", _))
    conn.getOutputStream.write(sql.getBytes("UTF-8"))
    conn.getOutputStream.close()
    new String(conn.getInputStream.readAllBytes(), "UTF-8").trim
  }

  private lazy val spark = SharedSpark.spark
  private val acc = NearFixtures.accounts

  private lazy val initStatements: Seq[String] = {
    import spark.implicits._
    val events = NearQueries.eventsDf(spark)
    val raw = Seq(NearFixtures.assetsJsonPayload).toDF("payload")
    ClickHouseSilverDdl.silverInitStatements(
      graft.gold.GoldViews.loadAssetsFromJson(raw).schema,
      SilverTransforms.nep245Events(events).schema,
      SilverTransforms.dip4TokenDiff(events, acc).schema,
      SilverTransforms.dip4PublicKeys(events, acc).schema,
      SilverTransforms.dip4IntentsExecuted(events, acc).schema,
      SilverTransforms.dip4FeeChanged(events, acc).schema,
      SilverTransforms.dip4Transfer(events, acc).schema)
  }

  test("silver init script stands up over the wire, and a full replay " +
      "of it is a no-op (IF NOT EXISTS contract)") {
    assume(chUrl.isDefined, "set SPARK_GRAFT_CH_URL to run wire tests")
    ClickHouseDialect.executeBatchWithRetry(httpExecute, initStatements)
    // whole-batch replay — the K1 retry path re-runs already-succeeded
    // statements; every CREATE is IF NOT EXISTS so this must succeed
    ClickHouseDialect.executeBatchWithRetry(httpExecute, initStatements)
    val tables = httpQuery("SHOW TABLES").split("\n").toSet
    Seq("defuse_assets", "silver_nep_245_events",
      "silver_dip4_token_diff", "silver_dip4_public_keys",
      "silver_dip4_intents_executed", "silver_dip4_fee_changed",
      "silver_dip4_transfer")
      .foreach(t => assert(tables.contains(t), s"missing table $t"))
  }

  test("replayed VALUES insert collapses under FINAL (at-least-once + " +
      "ReplacingMergeTree, database.rs insert contract)") {
    assume(chUrl.isDefined, "set SPARK_GRAFT_CH_URL to run wire tests")
    httpExecute("DROP TABLE IF EXISTS graft_wire_probe")
    httpExecute(
      "CREATE TABLE graft_wire_probe (k UInt64, v String) " +
        "ENGINE = ReplacingMergeTree ORDER BY k")
    val insert =
      "INSERT INTO graft_wire_probe (k, v) VALUES (1, 'a'), (2, 'b')"
    // the same batch shipped twice — the retry path's visible behavior
    ClickHouseDialect.executeBatchWithRetry(httpExecute,
      Seq(insert, insert))
    assert(httpQuery(
      "SELECT count() FROM graft_wire_probe FINAL") === "2")
    httpExecute("DROP TABLE graft_wire_probe")
  }

  test("resume probe: max(block_height) over transactions " +
      "(database.rs:23-26)") {
    assume(chUrl.isDefined, "set SPARK_GRAFT_CH_URL to run wire tests")
    httpExecute("DROP TABLE IF EXISTS transactions")
    httpExecute(ClickHouseDialect.createTableDdl(
      ClickHouseDialect.transactionsSpec,
      NearQueries.bronzeTransactions(spark, "").schema))
    httpExecute("INSERT INTO transactions (block_height, " +
      "transaction_hash) VALUES (7, 'a'), (42, 'b')")
    assert(httpQuery("SELECT max(block_height) FROM transactions") === "42")
    httpExecute("DROP TABLE transactions")
  }
}
