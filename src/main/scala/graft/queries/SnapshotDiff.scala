package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Snapshot DIFF — change-data-capture between two versions of a
  * table: which keys were added, removed, or changed, with content
  * fingerprints on both sides. The audit read every evolving lakehouse
  * table needs; the reference's cross-validation scripts compute the
  * same classification between two ENGINES
  * (`scripts/cross-validate-pg.sh:96-200` — normalized projection +
  * row diff), here it runs between two VERSIONS. The sink's time
  * travel ([[graft.sink.ParquetSink]] pins, proven by
  * `near_read_asof`) supplies real version pairs in production; the
  * declared query models the two pins as deterministic relations so
  * the DIFF operator itself is gate-checked end to end.
  *
  * Snapshot B evolves A deterministically: doc_id ≡ 0 (mod 11)
  * removed; ≡ 0 (mod 7) (and surviving) edited; ≡ 0 (mod 13)
  * re-added as a new document under the 10^k-shifted id (the
  * [[graft.llm.TextAnalysis.tDecontaminate]] shift device).
  *
  * Scale shape: two narrow scans projecting (key, md5) — content
  * hashing collapses row comparison to fixed-width keys, so the diff
  * join never carries text — and ONE keyed full-outer join (AQE-owned;
  * neither side is broadcastable at scale, same reasoning as
  * `j_full_outer_recon`). Output is change-volume-sized, not
  * table-sized. */
object SnapshotDiff {

  def kSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir)
    val a = docs.select(col("doc_id"), md5(col("text")).as("ha"))
    val shift = idShift(docs, "doc_id")
    val b = docs.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" rev2"))).otherwise(col("text")))
          .as("hb"))
      .unionByName(docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + shift).as("doc_id"),
          md5(concat(col("text"), lit(" new doc"))).as("hb")))
    a.join(b, Seq("doc_id"), "full_outer")
      .filter(col("ha").isNull || col("hb").isNull || col("ha") =!= col("hb"))
      .withColumn("status",
        when(col("ha").isNull, lit("added"))
          .when(col("hb").isNull, lit("removed"))
          .otherwise(lit("changed")))
      .select(col("doc_id"), col("status"),
        coalesce(col("ha"), lit("")).as("old_hash"),
        coalesce(col("hb"), lit("")).as("new_hash"))
      .orderBy(col("doc_id"))
  }
}
