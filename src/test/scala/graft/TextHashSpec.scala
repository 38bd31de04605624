package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the single-pass gram-hash expressions
  * ([[graft.functions.GramHash]]) that replaced the explode-based
  * near-dup pipeline: the hashed gram SETS must be the exact hash image
  * of the gram-string sets the DuckDB oracle computes, or the
  * verify-stage Jaccard silently drifts. */
class TextHashSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("token_shingle_hashes cardinality equals the distinct shingle-string " +
    "count for every corpus document (tokenization parity with split/trim)") {
    val d = Tables.documents(spark, dir)
      .withColumn("t", split(trim(col("text")), "\\s+"))
      .withColumn("n_strings",
        when(size(col("t")) >= 3,
          size(expr("array_distinct(transform(sequence(0, size(t) - 3), " +
            "i -> concat_ws(' ', t[i], t[i+1], t[i+2])))")))
          .otherwise(lit(0)))
      .withColumn("n_hashes", size(expr("token_shingle_hashes(text, 3)")))
    assert(d.filter(col("n_strings") =!= col("n_hashes")).count() === 0)
    assert(d.filter(col("n_hashes") > 0).count() > 0)
  }

  test("char_gram_hashes cardinality equals the distinct substring count " +
    "and is char-aware on multi-byte text") {
    val d = Tables.documents(spark, dir)
      .withColumn("n_strings",
        when(length(col("text")) >= 16,
          size(expr("array_distinct(transform(" +
            "sequence(1, length(text) - 15), i -> substring(text, i, 16)))")))
          .otherwise(lit(0)))
      .withColumn("n_hashes", size(expr("char_gram_hashes(text, 16)")))
    assert(d.filter(col("n_strings") =!= col("n_hashes")).count() === 0)

    import spark.implicits._
    // 2-byte and 3-byte codepoints: grams must follow CHAR offsets;
    // "ααββ" has three distinct char-2-grams, "aあいう" three, and the
    // repeated-gram string dedups
    val m = Seq("ααββ", "aあいう", "abab").toDF("text")
      .select(size(expr("char_gram_hashes(text, 2)")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(m === Seq(3, 3, 2))
  }

  test("short inputs yield empty sets, null stays null, signature is " +
    "deterministic with k slots") {
    import spark.implicits._
    val r = Seq(("ab", "one two"), ("", "")).toDF("a", "b")
      .select(
        size(expr("char_gram_hashes(a, 16)")).as("cg"),
        size(expr("token_shingle_hashes(b, 3)")).as("ts"))
      .collect()
    assert(r.map(x => (x.getInt(0), x.getInt(1))).toSeq === Seq((0, 0), (0, 0)))

    val n = Seq(Option.empty[String]).toDF("text")
      .select(expr("char_gram_hashes(text, 16)").as("g")).collect()
    assert(n.head.isNullAt(0))

    val sig = Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("minhash_sig(token_shingle_hashes(text, 3), 32)").as("sig"))
      .filter(size(col("sig")) > 0)
    val a = sig.collect().map(r2 => r2.getLong(0) -> r2.getSeq[Long](1)).toMap
    val b = sig.collect().map(r2 => r2.getLong(0) -> r2.getSeq[Long](1)).toMap
    assert(a === b)
    assert(a.values.forall(_.length === 32))
    assert(a.nonEmpty)
  }

  test("hashed-set Jaccard equals string-set Jaccard on all candidate " +
    "pairs of the corpus (the verify-stage parity the oracle relies on)") {
    val docs = Tables.documents(spark, dir)
      .withColumn("t", split(trim(col("text")), "\\s+"))
      .filter(size(col("t")) >= 3)
      .withColumn("ss", expr("array_distinct(transform(sequence(0, size(t) - 3), " +
        "i -> concat_ws(' ', t[i], t[i+1], t[i+2])))"))
      .withColumn("gs", expr("token_shingle_hashes(text, 3)"))
      .select("doc_id", "ss", "gs")
    val pairs = docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("j_str",
        size(array_intersect(col("a.ss"), col("b.ss"))).cast("double") /
          size(array_distinct(concat(col("a.ss"), col("b.ss")))).cast("double"))
      .withColumn("inter",
        size(array_intersect(col("a.gs"), col("b.gs"))).cast("double"))
      .withColumn("j_hash",
        col("inter") / (size(col("a.gs")) + size(col("b.gs")) - col("inter")))
    assert(pairs.filter(col("j_str") =!= col("j_hash")).count() === 0)
  }
}
