package graft.sink

import org.apache.spark.sql.types._

/** ClickHouse SQL dialect for the sink protocol — the concrete DDL and
  * insert text a live ClickHouse target would receive, generated from
  * the SAME Spark schemas the parquet warehouse writes
  * (reference: clickhouse/init/01-core-tables.sql, the
  * `client.inserter(table)` path of indexer-clickhouse/src/database.rs:41-99).
  *
  * No ClickHouse server (or driver jar) exists in this sandbox, so the
  * seam is cut exactly where the reference cuts it: everything ABOVE
  * the wire — table DDL, batched insert statements, dedup/FINAL/
  * OPTIMIZE text, and the K1 retry policy — is real, deterministic,
  * and unit-tested against the reference's own DDL; the one
  * untestable step is the `execute: String => Unit` a JDBC connection
  * would provide. Production wires that to a ClickHouse JDBC
  * connection (the native driver would speak RowBinary instead of
  * VALUES text for bulk loads — same statements, denser wire
  * encoding); the suite wires a recorder and asserts the SQL.
  *
  * Type mapping note: every integer column in the reference schema is
  * an unsigned counter (heights, log indexes, gas) declared UInt64, so
  * LongType maps to UInt64 here; `block_timestamp_ns` Long-nanos
  * columns surface as the reference's `DateTime64(9, 'UTC')` via a
  * per-table override (the ns value itself is what
  * `toDateTime64(n/1e9, 9)` ingests — see [[insertColumnExpr]]).
  */
object ClickHouseDialect {

  /** One skip-index line — `INDEX name col TYPE kind GRANULARITY 1`
    * (01-core-tables.sql:20-23). */
  case class ChIndex(name: String, column: String, kind: String) {
    def ddl: String = s"INDEX $name $column TYPE $kind GRANULARITY 1"
  }
  def minmax(col: String): ChIndex =
    ChIndex(s"${col}_minmax_idx", col, "minmax")
  def bloom(col: String): ChIndex =
    ChIndex(s"${col}_bloom_idx", col, "bloom_filter()")

  /** Table spec: the ORDER BY/PRIMARY KEY tuple is the
    * ReplacingMergeTree dedup key (01-core-tables.sql:24-27); column
    * type overrides express what a Spark type cannot (DateTime64
    * precision, renames from the `_ns` convention). Nullability is an
    * EXPLICIT whitelist, not the Spark schema's: Scala product
    * encoders mark every String nullable, while the reference keeps
    * keys non-null and marks only the genuinely-optional scalar
    * (tx_hash Nullable(String), 01-core-tables.sql:18) — the warehouse
    * rows are non-null by construction everywhere else. */
  case class ChTableSpec(
      table: String,
      orderBy: Seq[String],
      indexes: Seq[ChIndex] = Nil,
      engine: String = "ReplacingMergeTree",
      renames: Map[String, String] = Map("block_timestamp_ns" -> "block_timestamp"),
      typeOverrides: Map[String, String] =
        Map("block_timestamp" -> "DateTime64(9, 'UTC')"),
      nullableCols: Set[String] = Set("tx_hash"),
      settings: Seq[String] = Seq("index_granularity = 8192"))

  /** Spark → ClickHouse column type. */
  def chType(dt: DataType): String = dt match {
    case LongType => "UInt64"
    case IntegerType => "UInt32"
    case StringType => "String"
    case DoubleType => "Float64"
    case BooleanType => "Bool"
    case TimestampType => "DateTime64(6, 'UTC')"
    case ArrayType(e, _) => s"Array(${chType(e)})"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case other =>
      throw new IllegalArgumentException(s"no ClickHouse mapping for $other")
  }

  private def columnName(spec: ChTableSpec, f: StructField): String =
    spec.renames.getOrElse(f.name, f.name)

  private def columnType(spec: ChTableSpec, f: StructField): String = {
    val name = columnName(spec, f)
    val base = spec.typeOverrides.getOrElse(name, chType(f.dataType))
    // Array columns are never Nullable in ClickHouse
    if (spec.nullableCols.contains(name) && !base.startsWith("Array("))
      s"Nullable($base)"
    else base
  }

  /** CREATE TABLE mirroring the reference's shape
    * (01-core-tables.sql:4-28): columns, skip indexes, ENGINE,
    * PRIMARY KEY, ORDER BY, index_granularity. */
  def createTableDdl(spec: ChTableSpec, schema: StructType): String = {
    val cols = schema.fields.map(f =>
      s"    ${columnName(spec, f)} ${columnType(spec, f)}")
    val idx = spec.indexes.map(i => s"    ${i.ddl}")
    val key = spec.orderBy.mkString(", ")
    s"CREATE TABLE IF NOT EXISTS ${spec.table} (\n" +
      (cols ++ idx).mkString(",\n") + "\n" +
      s") ENGINE = ${spec.engine}\n" +
      s"PRIMARY KEY ($key)\n" +
      s"ORDER BY ($key)" +
      (if (spec.settings.isEmpty) ""
       else s"\nSETTINGS ${spec.settings.mkString(", ")}")
  }

  /** Parameterized batched insert — the JDBC `PreparedStatement`
    * text; one `addBatch` per row, `executeBatch` per micro-batch
    * (the JDBC twin of the reference's row-buffering inserter,
    * database.rs:92-97). */
  def insertSql(spec: ChTableSpec, schema: StructType): String = {
    val cols = schema.fields.map(columnName(spec, _))
    s"INSERT INTO ${spec.table} (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
  }

  /** The value EXPRESSION the insert binds for one column: ns-Long
    * timestamp columns pass through `toDateTime64(? / 1000000000, 9)`
    * so the wire carries the exact integer and ClickHouse does the
    * (lossless, /1e9-exact-in-decimal) conversion server-side. */
  def insertColumnExpr(spec: ChTableSpec, f: StructField): String =
    if (spec.typeOverrides.contains(columnName(spec, f)) &&
        f.dataType == LongType)
      "toDateTime64(? / 1000000000, 9)"
    else "?"

  /** Literal-VALUES insert for engines/paths without prepared
    * statements (init scripts, tests): ClickHouse string literals
    * escape backslash and single quote. */
  def escape(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
  def literal(v: Any): String = v match {
    case null | None => "NULL"
    case Some(x) => literal(x)
    case s: String => escape(s)
    case xs: Seq[_] => xs.map(literal).mkString("[", ", ", "]")
    case b: Boolean => if (b) "true" else "false"
    case other => other.toString
  }
  def insertValuesSql(spec: ChTableSpec, schema: StructType,
      rows: Seq[Seq[Any]]): String = {
    val cols = schema.fields.map(columnName(spec, _))
    s"INSERT INTO ${spec.table} (${cols.mkString(", ")}) VALUES " +
      rows.map(_.map(literal).mkString("(", ", ", ")")).mkString(", ")
  }

  /** Dedup-on-read — the reference's query-side FINAL
    * (03-gold-views.sql reads `FINAL` over Replacing tables); and the
    * explicit merge the compaction analog triggers. */
  def selectFinalSql(spec: ChTableSpec): String =
    s"SELECT * FROM ${spec.table} FINAL"
  def optimizeSql(spec: ChTableSpec): String =
    s"OPTIMIZE TABLE ${spec.table} FINAL"

  /** K1 wiring: ship one micro-batch of statements under the sink's
    * exponential-backoff retry (250 ms → ×2 → cap 60 s, 10 attempts —
    * ParquetSink.withRetry, the policy of database.rs:53-57). The whole
    * batch re-executes on failure; ReplacingMergeTree absorbs the
    * replayed rows by key, which is exactly the reference's
    * at-least-once + FINAL contract. */
  def executeBatchWithRetry(execute: String => Unit,
      statements: Seq[String]): Unit =
    ParquetSink.withRetry() { statements.foreach(execute) }

  // ------------------------------------------------------------------
  // Canned specs for the four core tables — order keys and skip
  // indexes transcribed from clickhouse/init/01-core-tables.sql.
  // ------------------------------------------------------------------

  val eventsSpec: ChTableSpec = ChTableSpec(
    "events",
    orderBy = Seq("block_height", "related_receipt_id", "index_in_log"),
    indexes = Seq(minmax("block_timestamp"), bloom("contract_id"),
      bloom("related_receipt_id"), bloom("related_receipt_receiver_id")))

  val transactionsSpec: ChTableSpec = ChTableSpec(
    "transactions",
    orderBy = Seq("block_height", "transaction_hash"),
    indexes = Seq(minmax("block_timestamp"), bloom("transaction_hash"),
      bloom("signer_id"), bloom("receiver_id")))

  val receiptsSpec: ChTableSpec = ChTableSpec(
    "receipts",
    orderBy = Seq("block_height", "receipt_id"),
    indexes = Seq(minmax("block_timestamp"), bloom("receipt_id"),
      bloom("receiver_id"), bloom("predecessor_id"),
      bloom("parent_transaction_hash")))

  val executionOutcomesSpec: ChTableSpec = ChTableSpec(
    "execution_outcomes",
    orderBy = Seq("block_height", "execution_outcome_id"),
    indexes = Seq(minmax("block_timestamp"), bloom("executor_id"),
      bloom("parent_transaction_hash")))

  // ------------------------------------------------------------------
  // Silver layer DDL surface (clickhouse/init/02-silver-tables.sql):
  // target tables, ingest-time materialized views, and the two union
  // views. In THIS engine the transform itself executes as the Spark
  // plan (graft.silver.SilverTransforms — the gate-verified semantics);
  // a live ClickHouse deployment instead materializes at insert time
  // via these MVs, so the dialect must be able to stand up that whole
  // surface over the wire. Table DDLs are generated from the SAME
  // Spark schemas the silver transforms emit (the core-table
  // discipline); MV bodies are ASSEMBLED from the structured facts of
  // each transform (filter predicates, decode/explode mode, JSON
  // extractions) by the combinators below — the same facts
  // SilverTransforms implements in Catalyst, rendered in ClickHouse's
  // dialect (JSON_VALUE / arrayJoin / JSONExtractKeysAndValues).
  // ------------------------------------------------------------------

  /** The reference's silver skip-index block: minmax on
    * block_timestamp + blooms on (contract_id, related_receipt_id,
    * related_receipt_receiver_id), names `<prefix><col>_minmax_idx` /
    * `<prefix><col>_bloom_index` (02-silver-tables.sql:48-51 et al). */
  def silverIndexes(prefix: String): Seq[ChIndex] = Seq(
    ChIndex(s"${prefix}block_timestamp_minmax_idx",
      "block_timestamp", "minmax"),
    ChIndex(s"${prefix}contract_id_bloom_index",
      "contract_id", "bloom_filter()"),
    ChIndex(s"${prefix}related_receipt_id_bloom_index",
      "related_receipt_id", "bloom_filter()"),
    ChIndex(s"${prefix}related_receipt_receiver_id_bloom_index",
      "related_receipt_receiver_id", "bloom_filter()"))

  private val nullableKeySettings =
    Seq("allow_nullable_key = true", "index_granularity = 8192")
  private val transferNullable =
    Set("memo", "old_owner_id", "new_owner_id", "token_id", "amount")

  /** defuse_assets (02:12-22) — dimension table, no MV (refreshed by
    * the daily job, [[graft.sources.AssetsRefresher]]); the reference
    * declares no SETTINGS clause on it. */
  val defuseAssetsSpec: ChTableSpec = ChTableSpec(
    "defuse_assets",
    orderBy = Seq("defuse_asset_id", "price_updated_at"),
    renames = Map("price_updated_at_ns" -> "price_updated_at"),
    typeOverrides = Map("price_updated_at" -> "DateTime64(9, 'UTC')"),
    nullableCols = Set.empty,
    settings = Nil)

  /** silver_nep_245_events (02:29-55) — NULLABLE dedup key members
    * (old/new owner, token_id), hence allow_nullable_key. */
  val silverNep245Spec: ChTableSpec = ChTableSpec(
    "silver_nep_245_events",
    orderBy = Seq("block_height", "related_receipt_id", "event",
      "old_owner_id", "new_owner_id", "token_id"),
    indexes = silverIndexes("nep_245_"),
    nullableCols = transferNullable,
    settings = nullableKeySettings)

  /** silver_dip4_token_diff (02:100-127). */
  val silverTokenDiffSpec: ChTableSpec = ChTableSpec(
    "silver_dip4_token_diff",
    orderBy = Seq("block_height", "related_receipt_id", "intent_hash"),
    indexes = silverIndexes("dif4_diff_"),
    nullableCols = Set("referral"))

  /** silver_dip4_public_keys (02:177-199). */
  val silverPublicKeysSpec: ChTableSpec = ChTableSpec(
    "silver_dip4_public_keys",
    orderBy = Seq("block_height", "related_receipt_id", "account_id"),
    indexes = silverIndexes("dip4_public_keys_"),
    nullableCols = Set.empty)

  /** silver_dip4_intents_executed (02:230-252). */
  val silverIntentsExecutedSpec: ChTableSpec = ChTableSpec(
    "silver_dip4_intents_executed",
    orderBy = Seq("block_height", "related_receipt_id", "intent_hash"),
    indexes = silverIndexes("dip4_intents_executed_"),
    nullableCols = Set.empty)

  /** silver_dip4_fee_changed (02:283-305). */
  val silverFeeChangedSpec: ChTableSpec = ChTableSpec(
    "silver_dip4_fee_changed",
    orderBy = Seq("block_height", "related_receipt_id"),
    indexes = silverIndexes("dip4_fee_changed_"),
    nullableCols = Set.empty)

  /** silver_dip4_transfer (02:336-363) — unprefixed index names in the
    * reference; nullable key members as in nep245. */
  val silverTransferSpec: ChTableSpec = ChTableSpec(
    "silver_dip4_transfer",
    orderBy = Seq("block_height", "related_receipt_id", "event",
      "old_owner_id", "new_owner_id", "token_id"),
    indexes = silverIndexes(""),
    nullableCols = transferNullable,
    settings = nullableKeySettings)

  /** staging_silver_dip4_transfer (02:442-468) — same shape, staging
    * contract (the M7 prod/staging CRITICAL split). */
  val stagingSilverTransferSpec: ChTableSpec =
    silverTransferSpec.copy(table = "staging_silver_dip4_transfer")

  // ---------------- MV body combinators -----------------------------

  /** `JSON_VALUE(data_row, '$.path')`, optionally '' -coalesced — the
    * ClickHouse rendering of the transforms' `from_json(...).field`
    * with tolerant-null semantics (P8). */
  def jsonValue(path: String, coalesced: Boolean = true): String =
    if (coalesced) s"coalesce(JSON_VALUE(data_row, '$$.$path'), '')"
    else s"JSON_VALUE(data_row, '$$.$path')"

  /** The prod-contracts predicate (AccountsConfig.prodContracts). */
  def contractsIn(contracts: Seq[String]): String =
    if (contracts.size == 1) s"contract_id = ${escape(contracts.head)}"
    else s"contract_id IN (${contracts.map(escape).mkString(", ")})"

  /** First CTE: select from `events`, bind `data_row` (either the raw
    * `data` document or one element of the JSON array via arrayJoin —
    * the CH twin of the transforms' `explode(from_json(data))`). */
  def decodedEventsCte(where: Seq[String], explodeArray: Boolean): String = {
    val dataRow =
      if (explodeArray) "arrayJoin(JSONExtractArrayRaw(data))" else "data"
    "WITH decoded_events AS (\n" +
      s"    SELECT *, $dataRow AS data_row\n    FROM events\n" +
      s"    WHERE ${where.map(w => s"($w)").mkString(" AND ")}\n)"
  }

  /** Optional middle CTE of named extractions over decoded_events. */
  def parsedCte(name: String, from: String,
      extracts: Seq[(String, String)]): String =
    s", $name AS (\n    SELECT *,\n" +
      extracts.map { case (e, as) => s"           $e AS $as" }
        .mkString(",\n") + s"\n    FROM $from\n)"

  /** MV settings tail — the JSON_VALUE return-type relaxations every
    * reference MV pins (02:93,170 et al). */
  def mvSettings(complex: Boolean): String =
    "SETTINGS function_json_value_return_type_allow_nullable = true" +
      (if (complex)
        ", function_json_value_return_type_allow_complex = true"
      else "")

  /** CREATE MATERIALIZED VIEW ... TO target (typed columns) AS body. */
  def createMaterializedViewDdl(mvName: String, target: String,
      columns: Seq[(String, String)], body: String): String =
    s"CREATE MATERIALIZED VIEW IF NOT EXISTS $mvName TO $target (\n" +
      columns.map { case (n, t) => s"    $n $t" }.mkString(",\n") +
      s"\n) AS\n$body"

  /** CREATE VIEW (the plain union views, 02:412-439 / 516-541). */
  def createViewDdl(name: String, columns: Seq[(String, String)],
      body: String): String =
    s"CREATE VIEW IF NOT EXISTS $name (\n" +
      columns.map { case (n, t) => s"    $n $t" }.mkString(",\n") +
      s"\n) AS\n$body"
}
