package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Validation harness (SURVEY §2.7): the reference's bash/SQL checks
  * (scripts/validate.sh, cross-validate.sh, cross-validate-pg.sh) as
  * Spark operators.
  *
  * Fingerprints use a PORTABLE 60-bit hash — the first 15 md5 hex
  * nibbles as a BIGINT — instead of the reference's cityHash64, so the
  * same value is computable in Spark (`conv(substring(md5(x),1,15),
  * 16,10)`), DuckDB (nibble positional sum), and plain Python; combined
  * with the order-independent `bit_xor` aggregate this reproduces
  * cross-validate.sh's `groupBitXor(cityHash64(...))` design (V7)
  * without the engine-specific hash.
  *
  * Scale: every check is a scan + partial aggregate (no joins except
  * the diff/tolerance compares, which shuffle once on the compare key).
  */
object Validation {

  /** Portable 60-bit string fingerprint (see object doc). */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Null-safe pipe-joined row image: every column cast to string,
    * NULL → '' (the normalization cross-validate-pg.sh:110-116 applies
    * before diffing). Arrays must be pre-joined by the caller. */
  def rowImage(cols: Seq[Column]): Column =
    concat_ws("|", cols.map(c => coalesce(c.cast("string"), lit(""))): _*)

  /** V7: order-independent table fingerprint — row count, bit_xor of
    * the PK fingerprint, bit_xor of the full-row fingerprint. */
  def tableFingerprint(df: DataFrame, tableName: String,
      pkCols: Seq[Column], allCols: Seq[Column]): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      bit_xor(h60(rowImage(pkCols))).as("pk_fingerprint"),
      bit_xor(h60(rowImage(allCols))).as("row_fingerprint"))
      .withColumn("table_name", lit(tableName))
      .select("table_name", "n_rows", "pk_fingerprint", "row_fingerprint")

  /** V5: domain check — rows whose column falls outside the allowed
    * account set (validate.sh:155-156 expects 0). */
  def domainCheck(df: DataFrame, c: Column, allowed: Seq[String]): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      sum(when(!c.isin(allowed: _*), 1L).otherwise(0L)).as("n_outside_domain"))

  /** V6: JSON validity — `get_json_object(c, '$')` is NULL exactly when
    * the string is not valid JSON (validate.sh:162-169). */
  def jsonValidity(df: DataFrame, label: String, c: Column): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      sum(when(get_json_object(c, "$").isNull, 1L).otherwise(0L))
        .as("n_invalid"))
      .withColumn("checked", lit(label))
      .select("checked", "n_rows", "n_invalid")

  /** V8: per-block drill-down — row count + order-independent
    * fingerprint per block (cross-validate.sh:156-226). */
  def blockDrilldown(df: DataFrame, fpCols: Seq[Column]): DataFrame =
    df.groupBy(col("block_height"))
      .agg(count(lit(1)).as("n_rows"),
        bit_xor(h60(rowImage(fpCols))).as("block_fingerprint"))
      .orderBy(col("block_height"))

  /** V10: normalized row-level diff keyed on `keyCols`: rows present on
    * one side only, or present on both with differing row images
    * (cross-validate-pg.sh:96-200). Empty result = tables identical. */
  def diffReport(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      imageCols: Seq[String]): DataFrame = {
    def proj(df: DataFrame, side: String) = df.select(
      keyCols.map(col) :+
        rowImage(imageCols.map(col)).as(s"__img_$side"): _*)
    proj(a, "a").join(proj(b, "b"), keyCols, "full_outer")
      .withColumn("status",
        when(col("__img_a").isNull, lit("only_b"))
          .when(col("__img_b").isNull, lit("only_a"))
          .when(col("__img_a") =!= col("__img_b"), lit("mismatch")))
      .filter(col("status").isNotNull)
      .select(keyCols.map(col) :+ col("status"): _*)
      .orderBy(keyCols.map(col): _*)
  }

  /** V11: float-vs-exact compare with relative tolerance
    * (cross-validate-pg.sh:203-252, tolerance 1e-10). */
  def toleranceCompare(df: DataFrame, approx: Column, exact: Column,
      relTol: Double = 1e-10): DataFrame = {
    val rel = abs(approx - exact) / greatest(abs(exact), lit(1e-300))
    df.agg(
      count(lit(1)).as("n_rows"),
      sum(when(rel > relTol, 1L).otherwise(0L)).as("n_exceeding_tol"),
      max(rel).as("max_rel_err"))
  }
}
