package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-provided parquet corpus (TESTDATA.md) plus
  * session tuning shared by every entry point.
  *
  * Design note (100 TB): all readers return plain `spark.read.parquet`
  * scans — no caching, no collect — so Catalyst keeps full freedom for
  * column pruning and predicate pushdown into the parquet scan.
  */
object Tables {

  /** Idempotent per-session settings every query path relies on. */
  def tune(spark: SparkSession): SparkSession = {
    // If events.parquet carries TIMESTAMP(NANOS) — which Spark's
    // TimestampType (µs) cannot hold — read it as raw Long nanos;
    // mirrors the reference's decision to keep block_timestamp as u64
    // nanos as the source of truth (SURVEY.md §1.3). Corpora written at
    // µs precision instead are normalized in [[events]].
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // AQE's small-partition floor (minPartitionSize, default 1 MB)
    // coalesces every post-shuffle stage of a BYTE-small input to ONE
    // task — which un-does the `repartition(col("doc_id"))` fan-outs in
    // front of the CPU-bound narrow stages (codecs, hashing, shingling):
    // measured 5000 media assets encoding+decoding in a single task,
    // 2.2 s warm, vs 0.5 s across 32 once the floor is dropped.
    // `parallelismFirst` (default true) already prefers parallelism
    // over the 64 MB advisory target; removing the floor lets it
    // actually reach defaultParallelism on small-bytes/heavy-CPU
    // relations. At production scale partitions dwarf 1 MB, so this
    // changes nothing there; results are partition-count independent by
    // design (decimal-exact or order-free aggregation everywhere).
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  /** The power of 10 one digit past max(`idCol`) — the collision-free
    * id shift every synthetic corpus-evolution query uses (leaked-copy
    * decontamination, span remixes, snapshot diffs): shifted ids land
    * above the corpus range at ANY scale, and the derivation is exact
    * integer/string arithmetic the DuckDB oracles replay identically.
    * ONE definition + a loud empty-relation guard (max over an empty
    * relation is null; an unguarded getLong NPEs without context). */
  def idShift(df: DataFrame, idCol: String): Long = {
    val m = df.agg(max(col(idCol))).collect()(0)
    require(!m.isNullAt(0),
      s"idShift: relation is empty — max($idCol) is null")
    ("1" + "0" * m.getLong(0).toString.length).toLong
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    tune(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String)    = table(s, d, "region")
  def nation(s: SparkSession, d: String)    = table(s, d, "nation")
  def customer(s: SparkSession, d: String)  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = table(s, d, "supplier")
  def part(s: SparkSession, d: String)      = table(s, d, "part")
  def orders(s: SparkSession, d: String)    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = table(s, d, "lineitem")
  /** The events stream table with `ts` ALWAYS exposed as Long epoch
    * nanos, whatever physical type the parquet carries.
    *
    * The corpus has shipped `ts` both as TIMESTAMP(NANOS) (read as Long
    * via `nanosAsLong` above) and as µs-precision timestamp[us] (which
    * Spark reads as TIMESTAMP_NTZ). Every downstream query does pure
    * integer arithmetic on nanos (`ts DIV <const>`) — engine-exact and
    * identical in the DuckDB oracles, which spell the same instants as
    * `epoch_ns(ts)` — so normalize here, at the one choke point. The
    * NTZ→instant reading matches the oracle: session tz is UTC, and
    * DuckDB's `epoch_ns` treats naive timestamps as UTC-naive too.
    * The conversion is a codegen'd scalar projection on the scan — no
    * shuffle, no pushdown loss for the non-ts predicates. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case _ =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    }
  }
  def documents(s: SparkSession, d: String) = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = table(s, d, "embeddings")

  /** Exact decimal sum rendered as a double.
    *
    * Summing doubles is order-dependent, so a Spark sum and a DuckDB
    * oracle sum can differ in the last bits and fail a hash compare.
    * Casting to decimal first makes the aggregate exact and identical in
    * both engines; the final decimal→double cast is deterministic
    * (IEEE round-to-nearest) on both sides. SQL twin:
    * `CAST(SUM(CAST(x AS DECIMAL(28,s))) AS DOUBLE)`.
    */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(28, scale))).cast(DoubleType)

  /** Exact decimal average rendered as a double; SQL twin:
    * `CAST(SUM(CAST(x AS DECIMAL(28,s))) / COUNT(*) AS DOUBLE)` — NB
    * decimal/bigint division semantics differ between engines, so we
    * divide as doubles AFTER the exact sum: sum is exact, the single
    * division is deterministic.
    */
  def davg(c: Column, scale: Int = 4): Column =
    (sum(c.cast(DecimalType(28, scale))).cast(DoubleType) /
      count(lit(1)).cast(DoubleType))
}
