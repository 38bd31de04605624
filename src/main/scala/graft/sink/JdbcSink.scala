package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PostgreSQL-style transactional sink logic (SURVEY §2.2 K3/K4):
  * idempotent `ON CONFLICT DO NOTHING` inserts and the error-driven
  * monthly-partition auto-creation loop
  * (indexer-explorer/src/database.rs:54-242).
  *
  * The side-effecting executor is a function parameter — production
  * passes a JDBC statement runner inside `foreachBatch`; tests pass a
  * recorder. All decision logic (SQL assembly, month derivation, the
  * detect-create-retry protocol) lives here. The error predicates and
  * the partition DDL default to PostgreSQL's (the reference's target)
  * and are pluggable so the same protocol runs against any JDBC engine
  * — the suite executes it end-to-end on embedded Derby (live
  * connection, real transactions, real SQLExceptions): duplicate-key =
  * DO NOTHING for K3, missing-monthly-table → CREATE → retry for K4.
  */
object JdbcSink {

  /** K3: idempotent insert — re-delivered micro-batches are no-ops,
    * giving exactly-once effect over at-least-once delivery. */
  def upsertSql(table: String, cols: Seq[String],
      conflictCols: Seq[String]): String =
    s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${conflictCols.mkString(", ")}) DO NOTHING"

  /** K4: the error PG raises when a range partition is missing
    * (database.rs:111-118 matches on this text). */
  def isMissingPartitionError(message: String): Boolean =
    message != null && message.contains("no partition of relation")

  /** K4: DDL for one monthly range partition (database.rs:122-168). */
  def monthlyPartitionDdl(parent: String, year: Int, month: Int): String = {
    val (ny, nm) = if (month == 12) (year + 1, 1) else (year, month + 1)
    f"CREATE TABLE IF NOT EXISTS ${parent}_y$year%04dm$month%02d " +
      f"PARTITION OF $parent FOR VALUES FROM ('$year%04d-$month%02d-01') " +
      f"TO ('$ny%04d-$nm%02d-01')"
  }

  /** Distinct (year, month) pairs present in a batch's nanosecond
    * timestamps — the partitions an insert may need. */
  def monthsInBatch(df: DataFrame, tsNanosCol: String): Seq[(Int, Int)] =
    df.select(
      year(to_timestamp(col(tsNanosCol) / 1000000000L)).as("y"),
      month(to_timestamp(col(tsNanosCol) / 1000000000L)).as("m"))
      .distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq

  /** K3 on engines without `ON CONFLICT` (e.g. Derby): a duplicate-key
    * violation on insert IS the "DO NOTHING" outcome. SQLState 23505 is
    * the SQL-standard unique-violation code (PG and Derby agree). */
  def isDuplicateKeyError(e: java.sql.SQLException): Boolean =
    e.getSQLState == "23505"

  /** Wrap an executor so duplicate-key violations are swallowed —
    * idempotent re-insert for dialects whose INSERT can't say
    * `ON CONFLICT DO NOTHING` inline.
    *
    * ONE ROW PER STATEMENT ONLY: the violation aborts the whole
    * statement, so a multi-row INSERT containing one duplicate would
    * silently drop its NEW rows too — and PostgreSQL additionally
    * poisons the enclosing transaction on any swallowed error. On PG
    * use the inline `ON CONFLICT DO NOTHING` of [[upsertSql]] (the
    * reference's path, database.rs:170-242); this wrapper exists for
    * row-at-a-time engines like the embedded Derby the suite drives. */
  def idempotent(execute: String => Unit): String => Unit =
    sql => try execute(sql) catch {
      case e: java.sql.SQLException if isDuplicateKeyError(e) => ()
    }

  /** K4 protocol: attempt the insert; on a missing-partition error,
    * create every partition the batch could need and retry ONCE (the
    * reference's exact flow). Any other error propagates.
    *
    * `isMissingPartition` / `partitionDdl` default to PostgreSQL
    * declarative partitioning; engines without it (Derby) plug in the
    * table-per-month twin — missing-table error, plain CREATE TABLE —
    * and the protocol is unchanged. */
  def insertWithAutoPartitions(
      execute: String => Unit,
      insertSql: String,
      parent: String,
      batchMonths: Seq[(Int, Int)],
      isMissingPartition: String => Boolean = isMissingPartitionError,
      partitionDdl: (String, Int, Int) => String = monthlyPartitionDdl): Unit =
    try execute(insertSql)
    catch {
      case e: Exception if isMissingPartition(e.getMessage) =>
        batchMonths.foreach { case (y, m) =>
          execute(partitionDdl(parent, y, m))
        }
        execute(insertSql)
    }
}
