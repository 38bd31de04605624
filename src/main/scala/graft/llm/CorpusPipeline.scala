package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryCaches
import graft.Tables._
import TextAnalysis.tokens

/** End-to-end corpus-cleaning pipeline — the composition every
  * training-data build runs, as ONE declarative plan:
  *
  *   re-ingested corpus
  *     → quality gate      (distinct-ratio/length score ≥ 0.6)
  *     → language gate     (stopword-profile guess ≠ 'other')
  *     → exact dedup       (min doc_id per normalized content hash)
  *     → near-dup removal  (MinHash-LSH pairs ≥ 0.8 Jaccard; the
  *                          larger id of each verified pair drops)
  *     → surviving documents with their gate metrics
  *
  * The input is the documents table unioned with a shifted-id copy of
  * itself (the same at-least-once re-insert model as
  * [[Dedup.dExactDedup]], reference semantics: ReplacingMergeTree PK
  * dedup, clickhouse/init/01-core-tables.sql:24-27), so every stage has
  * work to do: the union doubles the corpus, exact dedup halves it,
  * the gates and the near-dup stage each drop real documents.
  *
  * Stage ORDER is the 100-TB design: the quality/language gates are
  * narrow per-row projections evaluated FIRST, directly over the scan,
  * so the expensive stages (the exact-dedup shuffle, the LSH signature
  * map and its candidate join) only ever see the gated subset. Dedup
  * policies are deterministic (min-id survivor on both the exact and
  * the near-dup stage) per the round-1 determinism finding.
  *
  * Near-dup drop policy: a document drops iff it is the LARGER id of
  * ANY verified pair (jaccard ≥ 0.8). This is non-iterative and
  * order-independent — expressible identically in the DuckDB oracle as
  * an anti-join against the exact all-pairs relation (the LSH
  * candidates have recall ≈ 1 at the threshold, see [[Dedup]]'s object
  * scaladoc for the band-recall argument).
  */
object CorpusPipeline {

  /** Quality/lang gate thresholds; see [[TextAnalysis.tQualityScore]] /
    * [[TextAnalysis.tLangId]] for the underlying metrics. */
  private val MinQuality = 0.6
  private val MinhashThreshold = 0.8

  /** Gate metrics as one narrow projection (no shuffle): whitespace
    * tokens → counts → quality score + stopword-profile language guess,
    * computed exactly as the standalone `t_quality_score` / `t_lang_id`
    * operators do. */
  private def withGateMetrics(docs: DataFrame): DataFrame =
    docs
      .withColumn("t", tokens(col("text")))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("t"))).cast("long"))
      .withColumn("quality",
        TextAnalysis.qualityCol(col("n_tokens"), col("n_distinct")))
      .withColumn("stop_count", TextAnalysis.stopCountCol)
      .withColumn("stop_ratio",
        col("stop_count").cast("double") / col("n_tokens").cast("double"))
      .withColumn("lang_guess", TextAnalysis.langGuessCol(col("stop_ratio")))

  /** Gate stage shared with the streaming twin
    * ([[graft.streaming.StreamingCorpusClean]]): metrics + the quality
    * and language filters, one narrow pass. */
  private[graft] def gateBatch(docs: DataFrame): DataFrame =
    withGateMetrics(docs)
      .filter(col("quality") >= MinQuality && col("lang_guess") =!= "other")

  /** The full cleaning pipeline over the re-ingested corpus. Returns
    * the surviving documents with their gate metrics, ordered by id. */
  def pipeCorpusClean(spark: SparkSession, dir: String): DataFrame = {
    val base = documents(spark, dir).select(
      col("doc_id"), col("lang"), col("text"))
    val reingested = base.withColumn("doc_id", col("doc_id") + lit(100000L))
    val corpus = base.unionByName(reingested)

    // exact-dedup key FIRST, then fan out by it (r17, guide §2.4/§2.5):
    // the cheap md5 is the only per-row work the byte-small 2-split
    // scan pays; the explicit hash exchange is the SAME partitioning
    // the exact-dedup window requires (so no second exchange appears),
    // and it moves the EXPENSIVE gate metrics (tokenize +
    // array_distinct per doc) to the post-shuffle side where they run
    // at full parallelism instead of riding the scan's split count.
    // Gate-then-dedup semantics are unchanged: norm_hash is
    // row-deterministic and the quality/lang filter still applies
    // before the window numbers survivors.
    import graft.Tables.FanoutOps
    val hashed = corpus.withColumn("norm_hash", md5(lower(trim(col("text")))))
      .fanout(col("norm_hash"))
    val gated = gateBatch(hashed)

    // exact dedup: deterministic min-id survivor per normalized hash —
    // one hash-partitioned window, the K2/ReplacingMergeTree shape
    val hashW = Window.partitionBy(col("norm_hash")).orderBy(col("doc_id"))
    val exactDeduped = gated
      .withColumn("rn", row_number().over(hashW))
      .filter(col("rn") === 1)
      .drop("rn")

    // near-dup removal among exact-dedup survivors: banded-LSH
    // candidates + exact-Jaccard verify (never all-pairs), then an
    // anti-join dropping the larger id of every verified pair
    val survivors = QueryCaches.persistTracked(exactDeduped)
    val nearDupPairs = Dedup.lshVerifiedPairsFromDocs(
      survivors.select(col("doc_id"), col("text")),
      "token_shingle_hashes(text, 3)", MinhashThreshold)
    val dropIds = nearDupPairs.select(col("doc_b").as("doc_id")).distinct()

    survivors
      .join(dropIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("lang_guess"),
        col("n_tokens"), col("quality"))
      .orderBy(col("doc_id"))
  }
}
