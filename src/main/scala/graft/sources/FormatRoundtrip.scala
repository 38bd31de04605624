package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.validate.Validation.{h60, rowImage}

/** CROSS-FORMAT SOURCE/SINK INTEGRITY — write the event stream out as
  * CSV and JSON-lines, read each back with the declared schema, and
  * fingerprint all three relations (parquet original + both round
  * trips) with the V7 order-independent xor fingerprint. Equal rows ⇒
  * equal fingerprints, so a single mangled value (quote-escaping, a
  * dropped row, a shifted column) flips the row_fp of exactly the
  * mangled format. The money column rides in the row image as its
  * CANONICAL 2-dp rendering (`CAST(value AS DECIMAL(28,2))` as string,
  * mirrored in the DuckDB oracle) — so a mangled double IS row-visible,
  * at cent granularity: a per-row drift below half a cent is seen only
  * by the exact DECIMAL aggregate `sum_value`, where mutually
  * cancelling sub-cent drifts would pass (ADVICE r11). Full-bit double
  * equality across formats is pinned by the suite (`SourcesSpec`),
  * which images the raw double at ns grain Spark-side. This is the in-sandbox
  * proof that the ingest layer is FORMAT-AGNOSTIC — the reference's
  * sources are JSON documents (near-lake) and native tables; a Spark
  * rebuild must accept the same data from any serialization without
  * drift.
  *
  * ts rides as raw Long nanos inside Spark (exact in both text
  * formats); the oracle-visible image truncates to µs (`ts DIV 1000`
  * ↔ DuckDB `epoch_us(ts)`) because DuckDB reads TIMESTAMP(NANOS)
  * parquet at µs — the repo-wide convention. Full-ns cross-format
  * equality is pinned by the suite (`SourcesSpec`), which compares the
  * three fingerprints at ns grain Spark-side.
  *
  * Scale shape: two narrow full-scan writes + three scan-and-aggregate
  * fingerprints — no shuffle anywhere (xor/sum/count are partial
  * aggregates); the money column folds as DECIMAL (dsum). */
object FormatRoundtrip {

  private val cols =
    Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  /** Write events as CSV + JSON into tmp, read back, fingerprint all
    * three formats. `usGrain`=true (the gate shape) images ts at µs for
    * oracle comparability; the spec also runs ns-grain. */
  def fingerprints(spark: SparkSession, dir: String,
      usGrain: Boolean): DataFrame =
    fingerprintsOf(events(spark, dir).select(cols.map(col): _*), usGrain)

  /** [[fingerprints]] over ANY events-shaped relation — the suite
    * feeds a corpus with embedded newlines / quotes / backslashes in
    * `props` through it to prove the multiLine + pinned-quote/escape
    * read-back survives content the driver corpus happens not to
    * contain (ADVICE r11). */
  def fingerprintsOf(relation: DataFrame, usGrain: Boolean): DataFrame = {
    val spark = relation.sparkSession
    val base = relation
    // fresh per-invocation tmpdir — the gate query and the suite's
    // newline-corpus variant must not race a shared path
    val root = java.nio.file.Files
      .createTempDirectory("graft_format_roundtrip_").toFile
    val csvPath = new java.io.File(root, "csv").getAbsolutePath
    val jsonPath = new java.io.File(root, "json").getAbsolutePath
    base.write.mode("overwrite").option("header", "true").csv(csvPath)
    base.write.mode("overwrite").json(jsonPath)
    // multiLine + pinned quote/escape on the read-back (ADVICE r11):
    // the writer quotes a props string containing an embedded newline,
    // and without multiLine the line-splitting reader would shear that
    // row on re-read even though the data round-tripped correctly.
    // Quote/escape are pinned to the writer's own defaults so the pair
    // can't drift apart across Spark versions.
    val csv = spark.read.schema(base.schema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("quote", "\"").option("escape", "\\")
      .csv(csvPath)
    val json = spark.read.schema(base.schema).json(jsonPath)
    def fp(df: DataFrame, label: String): DataFrame = {
      val tsImg =
        if (usGrain) expr("ts DIV 1000L") else col("ts")
      // canonical per-row money image: one double→DECIMAL(28,2) cast
      // (the dsum discipline — proven to round identically in DuckDB)
      // rendered as a plain string; at ns grain (the suite path) the
      // raw double itself is imaged instead, so full-bit equality
      // across formats is still pinned where no oracle is involved.
      val valImg =
        if (usGrain) col("value").cast("decimal(28,2)").cast("string")
        else col("value").cast("string")
      val img = rowImage(Seq(col("event_id"), tsImg, col("user_id"),
        col("event_type"), valImg, col("props")))
      df.agg(
        count(lit(1)).as("n_rows"),
        bit_xor(h60(img)).as("row_fp"),
        dsum(col("value"), 2).as("sum_value"))
        .withColumn("fmt", lit(label))
        .select(col("fmt"), col("n_rows"), col("row_fp"), col("sum_value"))
    }
    // Materialize the 3 fingerprint rows eagerly, then delete the
    // round-trip files: a lazily-returned frame would still scan them,
    // but repeated gate/bench runs would otherwise accumulate a full
    // CSV+JSON copy of the corpus per invocation in tmp (ADVICE r12).
    val out = fp(base, "parquet")
      .unionAll(fp(csv, "csv"))
      .unionAll(fp(json, "json"))
      .orderBy(col("fmt"))
      .localCheckpoint()
    graft.sink.ParquetSink.delete(root)
    out
  }

  /** Gate query `k_format_roundtrip`: three identical fingerprint rows
    * — and the DuckDB oracle computes the same fingerprint once from
    * parquet, cross-joined to the three format labels, so EVERY format
    * must match the second engine, not just match each other. */
  def kFormatRoundtrip(spark: SparkSession, dir: String): DataFrame =
    fingerprints(spark, dir, usGrain = true)
}
