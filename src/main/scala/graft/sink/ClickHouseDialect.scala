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
      nullableCols: Set[String] = Set("tx_hash"))

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
      s"ORDER BY ($key)\n" +
      "SETTINGS index_granularity = 8192"
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
}
