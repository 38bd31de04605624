package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryCaches
import graft.Tables._

/** Text-analysis operators for a large-scale training-data pipeline over
  * the `documents` table (doc_id, text, lang, source, n_chars).
  *
  * These extend the reference's silver-layer shapes (stringly-typed
  * schema-on-read, per-row projections — SURVEY §2.5) to the operations
  * an LLM data pipeline needs: tokenization, language-ID heuristics,
  * quality scoring, content fingerprinting.
  *
  * Scale design (100 TB): every operator here is a narrow per-row
  * projection or a partial (map-side combined) aggregation — no joins,
  * no window over the full corpus, nothing driver-side. All expressions
  * are built-in Catalyst functions (codegen'd, no UDFs), so plans stay
  * inside WholeStageCodegen and filters/projections push into the scan.
  */
object TextAnalysis {

  /** Whitespace tokens of the raw text. `trim` first so leading blanks
    * don't create an empty leading token — identical semantics to the
    * DuckDB oracle's `string_split_regex(trim(text), '\s+')`. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** THE quality formula — single definition shared by the standalone
    * score query, the percentile calibration, and the corpus-cleaning
    * gate (one source of truth; the DuckDB oracles mirror it term by
    * term): 0.5·lexical-diversity + a length component saturating at
    * 50 tokens. */
  private[llm] def qualityCol(nTokens: Column, nDistinct: Column): Column =
    lit(0.5) * (nDistinct.cast("double") / nTokens.cast("double")) +
      when(nTokens >= 50, lit(0.5))
        .otherwise(nTokens.cast("double") * lit(0.01))

  /** THE language-guess thresholds — shared by `t_lang_id` and the
    * cleaning gate. */
  private[llm] def langGuessCol(stopRatio: Column): Column =
    when(stopRatio >= 0.1, lit("en_like"))
      .when(stopRatio >= 0.05, lit("latin_like"))
      .otherwise(lit("other"))

  /** Stopword hits among tokens column `t` — the lang-ID signal. */
  private[llm] def stopCountCol: Column =
    size(expr("filter(t, x -> array_contains(" +
      "array('the','a','of','and','in','to','is'), x))")).cast("long")

  /** Corpus statistics per (lang, source): doc counts, exact char/token
    * totals (integer sums — no float nondeterminism), and averages
    * derived by a single double division. */
  def tTextStats(spark: SparkSession, dir: String): DataFrame = {
    documents(spark, dir)
      .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tokens")).as("total_tokens"))
      .withColumn("avg_chars",
        col("total_chars").cast("double") / col("n_docs").cast("double"))
      .withColumn("avg_tokens",
        col("total_tokens").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("lang"), col("source"))
  }

  /** Language-ID heuristic: ratio of English function words among the
    * whitespace tokens (an n-gram/stopword profile — the classic cheap
    * lang-ID signal). Deterministic: integer counts, one double
    * division, threshold CASE identical in the oracle. */
  def tLangId(spark: SparkSession, dir: String): DataFrame = {
    documents(spark, dir)
      .withColumn("t", tokens(col("text")))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .withColumn("stop_count", stopCountCol)
      .withColumn("stop_ratio",
        col("stop_count").cast("double") / col("n_tokens").cast("double"))
      .withColumn("lang_guess", langGuessCol(col("stop_ratio")))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("stop_count"),
        col("stop_ratio"), col("lang_guess"))
      .orderBy(col("doc_id"))
  }

  /** Per-document quality score: lexical diversity (distinct-token
    * ratio), mean token length, and a length-saturating component —
    * the length/punct/stopword-ratio family of heuristic filters used
    * to gate training data. All ratios are one double division over
    * exact integers; the score is a fixed linear combination evaluated
    * in the same operation order as the oracle. */
  def tQualityScore(spark: SparkSession, dir: String): DataFrame = {
    documents(spark, dir)
      .withColumn("t", tokens(col("text")))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("t"))).cast("long"))
      .withColumn("distinct_ratio",
        col("n_distinct").cast("double") / col("n_tokens").cast("double"))
      .withColumn("nonspace_chars",
        length(regexp_replace(col("text"), "\\s+", "")).cast("long"))
      .withColumn("avg_token_len",
        col("nonspace_chars").cast("double") / col("n_tokens").cast("double"))
      .withColumn("quality", qualityCol(col("n_tokens"), col("n_distinct")))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("n_distinct"),
        col("distinct_ratio"), col("avg_token_len"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** Token counting with two tokenizers (per doc): whitespace words and
    * a BPE-ish regex (letter runs / digit runs / single punctuation —
    * the pre-tokenization split GPT-style BPE vocabularies assume).
    * Identical `regexp_extract_all` semantics in the DuckDB oracle. */
  def tTokenCount(spark: SparkSession, dir: String): DataFrame = {
    documents(spark, dir)
      .withColumn("n_ws_tokens", size(tokens(col("text"))).cast("long"))
      .withColumn("n_bpeish_tokens",
        size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"))
          .cast("long"))
      .withColumn("tokens_per_word",
        col("n_bpeish_tokens").cast("double") / col("n_ws_tokens").cast("double"))
      .select(col("doc_id"), col("lang"), col("n_ws_tokens"),
        col("n_bpeish_tokens"), col("tokens_per_word"))
      .orderBy(col("doc_id"))
  }

  /** DSIR-SHAPED DATA SELECTION — importance weights from hashed
    * n-gram bag models (Xie et al., "Data Selection for Language Models
    * via Importance Resampling", NeurIPS 2023): score every raw-corpus
    * document by how much more likely its token-bucket profile is under
    * a TARGET distribution (here the English subset — the multilingual-
    * pool-to-English-target selection the paper motivates) than under
    * the raw-corpus distribution, then keep the top-k. The paper's
    * features are exactly this: tokens hashed into a fixed bucket
    * vocabulary, two unigram bucket models with add-one smoothing, and
    * per-document weights summed over token instances.
    *
    * Integer-exact per the repo's pre-log discipline (the
    * [[tCollocations]] / BM25-idf precedent — no engine ever takes a
    * log): the paper's per-bucket log-ratio log(p_t(b)/p_r(b)) rides as
    * the floor-scaled smoothed count ratio
    * `s(b) = (10⁶·(ct(b)+1)) div (cr(b)+1)`, which is monotone in the
    * true ratio bucket-by-bucket, bounded ≤ 10⁶ (target counts are a
    * subset of raw counts, so ct ≤ cr), and zero-information-neutral in
    * the same place (bucket all-target ⇒ s → 10⁶; bucket absent from
    * target ⇒ s → 10⁶/(cr+1) → 0). The per-document score is the
    * length-normalized fold `(Σ c·s) div n_tokens` — dividing by token
    * count cancels the global-normalizer term the paper's log form
    * carries (log((Nt+V)/(Nr+V)) is constant per token instance), so
    * the ranking matches the average-target-likeness ordering without
    * floats. Production DSIR samples with Gumbel-noise-perturbed
    * weights; the deterministic gate shape is the top-k rank selection
    * (the paper's temperature→0 limit), tie-broken by doc_id.
    *
    * Scale shape: ONE wide shuffle to (doc_id, bucket) counts; the
    * bucket MODEL is a B-bounded aggregation of that relation (B=1024
    * rows whatever the corpus — both 100-TB-safe and broadcast-safe);
    * the rejoin is a broadcast hash join; the final fold and rank are
    * doc-grain.
    *
    * `target` is ANY boolean predicate over the document relation's
    * columns (VERDICT r14 #7 — real curation points DSIR at a held-out
    * quality corpus, not always a language subset): the docs matching
    * it ARE the target distribution. Default keeps the paper's
    * multilingual-pool→English shape; the `t_dsir_target_source` gate
    * row exercises a source-based target (curated sources as the
    * quality corpus). */
  def tDsirWeights(spark: SparkSession, dir: String,
      buckets: Int = 1024, k: Int = 100,
      target: Column = col("lang") === "en"): DataFrame =
    dsirFromCounts(dsirDocBucketCounts(
      documents(spark, dir), buckets, target), k)

  /** The per-(doc, bucket) token-count relation — DSIR's fact table,
    * and the streaming twin's PK-FINAL state (each doc's counts are
    * computed entirely from that one document, so rows arrive once and
    * never change). The target-membership flag rides along
    * (functionally dependent on doc_id — evaluated here, while the doc
    * row is in hand) so the target model splits out of the same
    * relation whatever predicate defines it. */
  private[graft] def dsirDocBucketCounts(docs: DataFrame,
      buckets: Int = 1024,
      target: Column = col("lang") === "en"): DataFrame = {
    val h60 = graft.validate.Validation.h60 _
    docs
      .select(col("doc_id"), target.as("is_target"),
        explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("doc_id"),
        pmod(h60(col("token")), lit(buckets.toLong)).as("b"))
      // is_target is functionally dependent on doc_id (evaluated from
      // the doc row before the explode), so it rides as an aggregate
      // instead of widening the shuffle key (VERDICT r15 #2: the r15
      // change that put it IN the key moved warm_med 1.12 → 1.57 s;
      // max() over a constant-per-group boolean is exact)
      .agg(count(lit(1)).as("c"), max(col("is_target")).as("is_target"))
      .select(col("doc_id"), col("is_target"), col("b"), col("c"))
  }

  /** Model + per-doc fold + top-k over a (doc_id, is_target, b, c)
    * count relation — ONE definition shared by the batch query and the
    * streaming twin's read, so the two cannot drift. */
  private[graft] def dsirFromCounts(db: DataFrame, k: Int): DataFrame = {
    val dbT = QueryCaches.persistTracked(db)
    // bucket model: raw counts + target counts in one pass over the
    // bounded (docs × buckets) relation
    val model = dbT.groupBy(col("b"))
      .agg(sum(col("c")).as("cr"),
        sum(when(col("is_target"), col("c")).otherwise(0L)).as("ct"))
      .withColumn("s",
        expr("(1000000L * (ct + 1L)) div (cr + 1L)"))
      .select(col("b"), col("s"))
    val scored = dbT.join(broadcast(model), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * col("s")).as("dsir_sum"))
      .withColumn("dsir_avg_scaled",
        expr("dsir_sum div n_tokens"))
    // top-k FIRST via sort+limit (planned as TakeOrdered — no global
    // single-partition window over the full doc relation), then rank
    // the k survivors (the unpartitioned window touches k rows only)
    val top = scored
      .orderBy(col("dsir_avg_scaled").desc, col("doc_id")).limit(k)
    val w = Window.orderBy(col("dsir_avg_scaled").desc, col("doc_id"))
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("n_tokens"),
        col("dsir_sum"), col("dsir_avg_scaled"))
      .orderBy(col("rank"))
  }

  /** Deterministic train/val/test split assignment — the reproducible
    * alternative to `rand()` sampling every training-data build needs:
    * the split is a pure function of doc_id, so it is stable across
    * reruns, engines, and corpus growth (adding documents never moves
    * an existing one between splits — rand() reshuffles everything).
    *
    * Bucket = first two md5 nibbles of the id string (0..255, extracted
    * with the same portable instr() arithmetic as [[Dedup.dSimhash]]),
    * split at 230/243 ≈ 90/5/5. A narrow per-row projection — no
    * shuffle, no state, pushes column pruning to the scan. */
  /** THE split assignment — md5 bucket + 230/243 thresholds — shared by
    * [[tSplitAssign]], the dataset card, and its streaming twin so the
    * three can never drift. */
  private[graft] def withSplit(df: DataFrame): DataFrame = df
    .withColumn("h", md5(col("doc_id").cast("string")))
    .withColumn("bucket",
      expr("((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16 + " +
        "instr('0123456789abcdef', substring(h, 2, 1)) - 1)").cast("long"))
    .withColumn("split",
      when(col("bucket") < 230, lit("train"))
        .when(col("bucket") < 243, lit("val"))
        .otherwise(lit("test")))

  def tSplitAssign(spark: SparkSession, dir: String): DataFrame = {
    withSplit(documents(spark, dir))
      .select(col("doc_id"), col("bucket"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Dataset card: the per-(split, language) composition report every
    * dataset release ships — document counts, exact token totals, and
    * each language's token share of its split. One partial aggregation
    * to a (splits × languages)-bounded relation; the per-split totals
    * it joins against are an even smaller (≤3-row) broadcast. Shares
    * are one double division over exact integer sums — deterministic
    * in both engines. */
  def tDatasetCard(spark: SparkSession, dir: String): DataFrame = {
    val per = withSplit(documents(spark, dir))
      .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
    val splitTotals = per.groupBy(col("split"))
      .agg(sum(col("total_tokens")).as("split_tokens"))
    per.join(broadcast(splitTotals), Seq("split"))
      .withColumn("token_share",
        col("total_tokens").cast("double") / col("split_tokens").cast("double"))
      .select(col("split"), col("lang"), col("n_docs"), col("total_tokens"),
        col("token_share"))
      .orderBy(col("split"), col("lang"))
  }

  /** Top-k vocabulary across the corpus: term frequency (total
    * occurrences) and document frequency per whitespace token, top k by
    * frequency — the vocabulary-construction pass of a tokenizer-
    * training pipeline.
    *
    * Scale shape: explode to token rows, then ONE hash-partitioned
    * aggregation with map-side partial combine (count and a doc-id
    * HLL-free exact distinct via the two-level groupBy), and a
    * `TakeOrderedAndProject` for the top-k — each partition keeps only
    * its local top k, the driver merges P·k rows, never a global sort.
    * The (tf DESC, token ASC) order is total, so the k-cut is
    * deterministic under ties in both engines. */
  def tVocabTopk(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf_doc"))
      .groupBy(col("token"))
      .agg(sum(col("tf_doc")).as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(k)
  }

  /** Corpus-level BIGRAM counts, top-k — the n-gram LM statistics pass
    * (contamination analysis, LM smoothing tables, memorization
    * studies all start here). The lateral shape: each document explodes
    * into its adjacent token pairs via a single codegen'd
    * `transform(sequence(...))` — no positional self-join, no gram
    * rows persisted — then two hash-partitioned aggregates (per-doc,
    * then corpus) exactly like [[tVocabTopk]], ending in
    * `TakeOrderedAndProject` (per-partition top-k, driver merges P·k).
    *
    * Scale shape: the explode multiplies rows by ~tokens-per-doc but
    * each row is a short string; the (bigram, doc) pre-aggregate
    * combines map-side, so the wide shuffle carries distinct pairs,
    * not occurrences. */
  def tBigramTopk(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    documents(spark, dir)
      .fanout(col("doc_id")) // parallelize the narrow stage (see Dedup)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(
        expr("transform(sequence(0, size(t) - 2), " +
          "i -> concat_ws(' ', t[i], t[i + 1]))")).as("bigram"))
      .groupBy(col("bigram"), col("doc_id"))
      .agg(count(lit(1)).as("tf_doc"))
      .groupBy(col("bigram"))
      .agg(sum(col("tf_doc")).as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("bigram"))
      .limit(k)
  }

  /** Exact distributed percentiles of the quality score per language —
    * the calibration pass that turns a quality FILTER threshold ("keep
    * the top 25%") into a concrete cut value.
    *
    * NEAREST-RANK formulation (value at rank ceil(p·n)), NOT an
    * interpolating `percentile`/`quantile_cont`: nearest-rank is a pure
    * integer-rank lookup, so the Spark plan and the DuckDB oracle are
    * the same arithmetic bit-for-bit — interpolation formulas differ
    * between engines in the last ulps.
    *
    * Shape — the HISTOGRAM formulation, not a per-group window over raw
    * rows: a `Window.partitionBy(lang)` over documents puts each
    * language's ENTIRE corpus in one task (languages are few — the
    * textbook skew trap at 100 TB). Instead: (1) one hash-partitioned
    * groupBy on (lang, quality) builds the value histogram in parallel
    * with map-side combine; (2) the cumulative window runs over
    * DISTINCT VALUES per language — bounded by value cardinality, not
    * corpus size; (3) the percentile is the smallest value whose
    * cumulative count reaches ceil(p·n), one tiny join + min-agg.
    * Identical output to the rank-lookup definition (equal values share
    * a rank range), proven against a local sort model in the suite. */
  def tQualityPercentiles(spark: SparkSession, dir: String,
      ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9)): DataFrame = {
    val scored = documents(spark, dir)
      .withColumn("t", tokens(col("text")))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("t"))).cast("long"))
      .withColumn("quality", qualityCol(col("n_tokens"), col("n_distinct")))
      .select(col("lang"), col("quality"))
    val hist = QueryCaches.persistTracked(
      scored.groupBy(col("lang"), col("quality"))
        .agg(count(lit(1)).as("cnt"))) // window + per-lang totals read it
    val w = Window.partitionBy(col("lang")).orderBy(col("quality"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(w))
    val targets = hist.groupBy(col("lang")).agg(sum(col("cnt")).as("n"))
      .select(col("lang"), col("n"),
        explode(array(ps.map(lit(_)): _*)).as("p"))
      .withColumn("target_rn",
        ceil(col("p") * col("n").cast("double")).cast("long"))
    targets.join(cum, Seq("lang"))
      .filter(col("cum") >= col("target_rn"))
      .groupBy(col("lang"), col("p"))
      .agg(min(col("quality")).as("q_at_p"))
      .orderBy(col("lang"), col("p"))
  }

  /** Exact WEIGHTED percentiles — the ClickHouse
    * `quantilesExactWeighted` analog: the q-quantile of document length
    * (n_chars) weighted by TOKEN COUNT, i.e. the length a token drawn
    * at random sits in — the distribution that matters when budgeting
    * token throughput rather than doc counts (long docs carry most of
    * the tokens, so the weighted median sits far above the unweighted
    * one).
    *
    * Same nearest-rank + histogram discipline as
    * [[tQualityPercentiles]]: per-(lang, value) WEIGHT sums build in
    * parallel with map-side combine, the cumulative window runs over
    * DISTINCT values only, and the quantile is the smallest value whose
    * cumulative weight reaches ceil(p·W) — integer targets, engine-
    * identical. */
  def tWeightedPercentiles(spark: SparkSession, dir: String,
      ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9)): DataFrame =
    weightedPercentilesFromHist(QueryCaches.persistTracked(
      weightHist(documents(spark, dir))), ps)

  /** The (lang, value, weight-sum) histogram — ADDITIVE, so the
    * streaming twin maintains exactly this relation as a summing MV. */
  private[graft] def weightHist(docs: DataFrame): DataFrame = docs
    .select(col("lang"), col("n_chars").as("value"),
      size(tokens(col("text"))).cast("long").as("w"))
    .groupBy(col("lang"), col("value"))
    .agg(sum(col("w")).as("wsum"))

  /** The nearest-rank lookup over any (lang, value, wsum) histogram —
    * shared by the batch query and the streaming summing-MV twin
    * ([[graft.streaming.StreamingWeighted]]). */
  private[graft] def weightedPercentilesFromHist(hist: DataFrame,
      ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9)): DataFrame = {
    val wCum = Window.partitionBy(col("lang")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("wsum")).over(wCum))
    val targets = hist.groupBy(col("lang")).agg(sum(col("wsum")).as("wtot"))
      .select(col("lang"), col("wtot"),
        explode(array(ps.map(lit(_)): _*)).as("p"))
      .withColumn("target",
        ceil(col("p") * col("wtot").cast("double")).cast("long"))
    targets.join(cum, Seq("lang"))
      .filter(col("cum") >= col("target"))
      .groupBy(col("lang"), col("p"))
      .agg(min(col("value")).as("v_at_p"))
      .orderBy(col("lang"), col("p"))
  }

  /** Gopher-style repetition filters per document: the fraction of
    * bigram slots taken by the single most frequent token bigram, and
    * the fraction of 3-token shingles that are duplicates of an earlier
    * shingle in the same doc — the "remove documents that repeat
    * themselves" gate of a training-data quality pipeline.
    *
    * Scale shape: the shingle-duplication terms are narrow per-row
    * array arithmetic (array_distinct is linear in doc length); the
    * top-bigram count explodes to (doc_id, gram) rows and runs TWO
    * hash-partitioned aggregations with map-side combine — never a
    * per-doc quadratic scan of the gram list, so a pathological long
    * doc costs O(len), not O(len²). The join back to the per-doc base
    * is doc_id-to-doc_id (AQE-owned; both sides are corpus-row-count
    * sized). All ratios are one IEEE double division over exact
    * integers — bit-identical in the DuckDB oracle. */
  def tRepetition(spark: SparkSession, dir: String): DataFrame = {
    val base = documents(spark, dir)
      .withColumn("t", tokens(col("text")))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .withColumn("n_bigrams",
        greatest(col("n_tokens") - 1, lit(0L)).cast("long"))
      .withColumn("n_shingles3",
        greatest(col("n_tokens") - 2, lit(0L)).cast("long"))
      .withColumn("n_distinct_shingles3",
        when(size(col("t")) >= 3,
          size(expr("array_distinct(transform(sequence(0, size(t) - 3), " +
            "i -> concat_ws(' ', t[i], t[i+1], t[i+2])))")))
          .otherwise(lit(0)).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("n_bigrams"),
        col("n_shingles3"), col("n_distinct_shingles3"))
    val topBigram = documents(spark, dir)
      .withColumn("t", tokens(col("text")))
      .filter(size(col("t")) >= 2) // sequence(0, negative) counts DOWN
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, size(t) - 2), " +
          "i -> concat_ws(' ', t[i], t[i+1]))")).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(max(col("cnt")).as("top_bigram_cnt"))
    base.join(topBigram, Seq("doc_id"), "left")
      .withColumn("top_bigram_cnt",
        coalesce(col("top_bigram_cnt"), lit(0L)).cast("long"))
      .withColumn("top_bigram_frac",
        when(col("n_bigrams") > 0,
          col("top_bigram_cnt").cast("double") / col("n_bigrams").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("dup_shingle_frac",
        when(col("n_shingles3") > 0,
          (col("n_shingles3") - col("n_distinct_shingles3")).cast("double") /
            col("n_shingles3").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("repetitive",
        col("top_bigram_frac") > 0.1 || col("dup_shingle_frac") > 0.3)
      .select(col("doc_id"), col("n_tokens"), col("top_bigram_cnt"),
        col("top_bigram_frac"), col("dup_shingle_frac"), col("repetitive"))
      .orderBy(col("doc_id"))
  }

  /** SIMPSON LEXICAL CONCENTRATION per document — the collision
    * probability of the unigram distribution: the chance two tokens
    * drawn WITHOUT replacement are the same type,
    * Σ c·(c−1) / (n·(n−1)). It is the exact-rational diversity index
    * (1 − concentration = Gini–Simpson diversity): [[tRepetition]]'s
    * top-bigram fraction sees only the single heaviest n-gram, while
    * Simpson weighs the WHOLE distribution — a doc that rotates three
    * spam phrases scores high here and low there. Entropy would need a
    * log (not correctly rounded across engines); Simpson is integer
    * arithmetic plus ONE division of exactly-derived longs, so the gate
    * hash-compares it bit-for-bit.
    *
    * Scale shape: explode → hash-partitioned (doc, token) count with
    * map-side combine → per-doc Σ c·(c−1) — two narrow aggregations,
    * no window, no broadcast; single-token docs report NULL (the
    * index is undefined at n=1), spelled identically in the oracle. */
  def tSimpsonDiversity(spark: SparkSession, dir: String): DataFrame = {
    documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * (col("c") - 1)).as("rep_pairs"))
      .withColumn("simpson_concentration",
        when(col("n_tokens") > 1,
          col("rep_pairs").cast("double") /
            (col("n_tokens") * (col("n_tokens") - 1)).cast("double")))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("rep_pairs"), col("simpson_concentration"))
      .orderBy(col("doc_id"))
  }

  /** Top-k salient terms per document by TF-IDF. The IDF is the plain
    * corpus-size-over-document-frequency RATIO (unsmoothed linear idf),
    * not log-idf: division is IEEE-exact in both engines, whereas ln is
    * a transcendental whose last-ulp rounding is not mandated — the
    * score ordering these inputs produce is identical, and the gate
    * hash-compares raw doubles.
    *
    * Scale shape: TF is one explode + hash-partitioned aggregation with
    * map-side combine; DF aggregates the TF relation (vocab-bounded
    * output) and is explicitly broadcast — the classic bounded-dimension
    * join; the corpus row count is a scalar aggregate (one tiny job,
    * driver state = one long). The top-k window partitions by doc_id —
    * partition size is a single document's vocabulary, so there is no
    * skew regardless of corpus size, and (tfidf DESC, token ASC) is a
    * total order making the k-cut deterministic under ties. */
  def tTfidfTopk(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    // persisted: DF derives from TF, and without the persist Catalyst
    // re-runs the whole tokenize+explode+aggregate lineage a second
    // time for the DF branch — 2× the corpus scan and shuffle at scale
    // (cache contract: tracked, released by the materializer — see
    // Dedup's scaladoc)
    val tf = QueryCaches.persistTracked(documents(spark, dir)
      .fanout(col("doc_id")) // parallelize the narrow stage (see Dedup)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = documents(spark, dir).count()
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("token"))
    tf.join(broadcast(df), Seq("token"))
      .withColumn("tfidf",
        col("tf").cast("double") * (lit(n.toDouble) / col("df").cast("double")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        col("tfidf"), col("rn"))
      .orderBy(col("doc_id"), col("rn"))
  }

  /** PII detection + redaction — the scrubbing pass a training-data
    * pipeline runs before anything else. The corpus carries no PII, so
    * the query first plants deterministic synthetic PII (an email on
    * doc_id ≡ 0 (mod 10), a phone number on ≡ 5 — the same
    * model-the-input trick the dedup queries use with shifted-id
    * copies), then detects and redacts it with engine-portable regexes.
    *
    * A narrow per-row projection: regex extraction and replacement are
    * codegen'd string ops, no shuffle, no state; the redacted text is
    * returned as its md5 so the gate compares content without hauling
    * full text through the result. */
  def tPiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9]+@[a-z0-9.]+[.][a-z]+"
    val phoneRe = "555-[0-9]{4}"
    documents(spark, dir)
      .withColumn("text2",
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" reach user"), col("doc_id").cast("string"),
            lit("@mail.example.com now")))
          .when(col("doc_id") % 10 === 5,
            concat(col("text"), lit(" call 555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
              lit(" today")))
          .otherwise(col("text")))
      .withColumn("n_emails",
        size(expr(s"regexp_extract_all(text2, '$emailRe', 0)")).cast("long"))
      .withColumn("n_phones",
        size(expr(s"regexp_extract_all(text2, '$phoneRe', 0)")).cast("long"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col("text2"), emailRe, "[EMAIL]"),
          phoneRe, "[PHONE]"))
      .withColumn("redacted_hash", md5(col("redacted")))
      .withColumn("has_pii", col("n_emails") + col("n_phones") > 0)
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        col("has_pii"), col("redacted_hash"))
      .orderBy(col("doc_id"))
  }

  /** Benchmark decontamination: flag training documents sharing any
    * 8-token shingle with a held-out evaluation set — the overlap check
    * every training build runs so eval answers don't leak into the
    * training corpus. Eval set = doc_id ≡ 0 (mod 97); the corpus is
    * modeled with those same eval docs RE-ENTERING the crawl under new
    * ids with a trailing edit (the real-world leak this pass exists to
    * catch), so the query provably fires on every leak — chance
    * 8-shingle collisions are ~|eval shingles| / 31⁸, though organic
    * NEAR-DUPLICATES of eval docs (the corpus carries injected twins)
    * also fire, which is exactly the true positive an overlap check is
    * for.
    *
    * Scale shape: both sides explode to per-doc DISTINCT shingle rows
    * (narrow + one explode); the eval side is bounded by the eval-set
    * size (benchmarks are small — thousands of docs, not corpora) and
    * is explicitly broadcast after a distinct — so the contamination
    * check is a broadcast semi-join + per-doc count over the corpus
    * scan, no shuffle of corpus shingles at all. The final left join
    * restores zero-match docs (AQE-owned, doc_id keys). */
  def tDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir).select(col("doc_id"), col("text"))
    // persisted: the eval set is benchmark-bounded and feeds THREE
    // branches (its own shingles, the leaked-copy synthesis, and via
    // scanSide the output id list) — without the persist each branch
    // re-scans the corpus text column just to re-filter it
    val evalDocs =
      QueryCaches.persistTracked(docs.filter(col("doc_id") % 97 === 0))
    // Leaked ids are shifted by [[graft.Tables.idShift]] (the power of
    // 10 one digit past max(doc_id)): always above the corpus range at
    // ANY scale (a fixed +200000 silently collides once the corpus
    // passes 200001 docs — ADVICE r6). The mod-97 disjointness argument
    // survives: 97 is prime and divides no power of 10, so
    // (e + shift) % 97 != 0 for eval ids e ≡ 0 (mod 97) whenever
    // shift % 97 != 0 — which 10^k guarantees. One narrow max()
    // aggregate over the id column (parquet stats make it a
    // metadata-cheap scan), the same driver-scalar device as
    // tStratifiedSample's n_min.
    val shift = graft.Tables.idShift(docs, "doc_id")
    val leaked = evalDocs.select((col("doc_id") + shift).as("doc_id"),
      concat(col("text"), lit(" leaked into the training crawl")).as("text"))
    val scanSide = docs.filter(col("doc_id") % 97 =!= 0).unionByName(leaked)
    val gram8 = "transform(sequence(0, size(t) - 8), i -> concat_ws(' ', " +
      "t[i], t[i+1], t[i+2], t[i+3], t[i+4], t[i+5], t[i+6], t[i+7]))"
    def shingles(df: DataFrame): DataFrame = df
      .withColumn("t", tokens(col("text")))
      .filter(size(col("t")) >= 8) // sequence(0, negative) counts DOWN
      .select(col("doc_id"),
        explode(expr(s"array_distinct($gram8)")).as("shingle"))
    val evalShingles = shingles(evalDocs).select(col("shingle")).distinct()
    val matched = shingles(scanSide)
      .join(broadcast(evalShingles), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matched"))
    scanSide.select(col("doc_id"))
      .join(matched, Seq("doc_id"), "left")
      .withColumn("n_matched", coalesce(col("n_matched"), lit(0L)).cast("long"))
      .withColumn("contaminated", col("n_matched") > 0)
      .orderBy(col("doc_id"))
  }

  /** Temperature-based stratified sampling — the data-MIXING op of a
    * multilingual training build: downsample dominant languages toward
    * the rare ones so the mix follows p_l^α (α = 0.5) instead of the
    * raw crawl distribution. Keep-rate per language = sqrt(n_min/n_l)
    * (1.0 for the rarest stratum); membership is the same deterministic
    * md5-bucket device as [[tSplitAssign]], widened to 16 bits of
    * resolution — stable across reruns and engines, no rand().
    *
    * Cross-engine determinism: sqrt is IEEE-754 CORRECTLY ROUNDED
    * (unlike ln/pow, which is why the temperature is exactly 0.5), and
    * the rate never crosses engines as a normalized sum — n_min/n_l is
    * one exact division, so Spark and DuckDB compare bit-identical
    * doubles. Scale shape: per-language counts are one partial
    * aggregation to a language-bounded relation, broadcast back; the
    * filter is a narrow per-row projection. */
  def tStratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val counts = documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
    val nMin = counts.agg(min(col("n_l"))).collect()(0).getLong(0)
    val bucket16 =
      "((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 4096 + " +
        "(instr('0123456789abcdef', substring(h, 2, 1)) - 1) * 256 + " +
        "(instr('0123456789abcdef', substring(h, 3, 1)) - 1) * 16 + " +
        "instr('0123456789abcdef', substring(h, 4, 1)) - 1)"
    documents(spark, dir)
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("bucket", expr(bucket16).cast("long"))
      .join(broadcast(counts), Seq("lang"))
      .withColumn("keep_rate",
        sqrt(lit(nMin.toDouble) / col("n_l").cast("double")))
      .filter(col("bucket").cast("double") < col("keep_rate") * 65536.0)
      .select(col("doc_id"), col("lang"), col("bucket"), col("n_l"),
        col("keep_rate"))
      .orderBy(col("doc_id"))
  }

  /** Token-budget prefix cut: take documents in a deterministic
    * hash-priority order until a token budget is exhausted — how a
    * training build caps a source at N tokens without biasing toward
    * any id range. Priority order = (bucket, doc_id), bucket being the
    * [[tSplitAssign]] md5 device, so the cut is reproducible and
    * unbiased.
    *
    * Scale shape: a single global cumulative-sum window would put the
    * WHOLE corpus in one task — the skew trap [[tQualityPercentiles]]
    * dodges. Instead the classic two-pass offset pattern (same shape as
    * the distributed chunk writer, [[graft.streaming.StreamingDedup]]):
    * (1) per-bucket token totals — one partial aggregation to a
    * 256-row relation; (2) running offsets over those 256 rows (the
    * only single-partition window, bounded by the bucket count, not
    * the corpus); (3) within-bucket cumulative sums, partitioned by
    * bucket — parallel, each partition 1/256 of the corpus; offset +
    * within-bucket cum = exact global prefix sum. All integer
    * arithmetic — no float order sensitivity anywhere. */
  def tTokenBudget(spark: SparkSession, dir: String,
      budget: Long = 20000L): DataFrame = {
    // persisted: both the 256-row offsets aggregate and the main join
    // consume `scored` — unpersisted, the full scan+md5+tokenize
    // lineage would execute twice (ADVICE r6; tracked cache contract)
    val scored = QueryCaches.persistTracked(documents(spark, dir)
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("bucket",
        expr("((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16 + " +
          "instr('0123456789abcdef', substring(h, 2, 1)) - 1)").cast("long"))
      .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
      .select(col("doc_id"), col("bucket"), col("n_tokens")))
    val offsets = scored.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
      .withColumn("offset",
        coalesce(sum(col("bucket_tokens")).over(
          Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("offset"))
    val wInBucket = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum_tokens",
        (col("offset") + sum(col("n_tokens")).over(wInBucket)).cast("long"))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("bucket"), col("n_tokens"), col("cum_tokens"))
      .orderBy(col("bucket"), col("doc_id"))
  }

  /** Sequence packing (concat-and-chunk): lay all documents out on one
    * deterministic token tape — hash-priority (bucket, doc_id) order,
    * as in [[tTokenBudget]] — and cut it into fixed 512-token training
    * sequences. Each document's placement is (tape offset, first/last
    * sequence id, spans) — the manifest a sharded tokenizer job needs
    * to emit packed sequences without any coordination beyond this
    * metadata. The final stage of a training-data build.
    *
    * Scale shape: the exclusive global prefix sum is the same two-pass
    * offset pattern as [[tTokenBudget]] (per-bucket parallel windows +
    * a 256-row offsets relation; the only single-partition window is
    * bucket-count-bounded). Everything else is per-row integer
    * arithmetic — exact in both engines. */
  def tSeqPack(spark: SparkSession, dir: String,
      seqLen: Long = 512L): DataFrame = {
    // persisted: offsets + main join both read it (see tTokenBudget)
    val scored = QueryCaches.persistTracked(documents(spark, dir)
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("bucket",
        expr("((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16 + " +
          "instr('0123456789abcdef', substring(h, 2, 1)) - 1)").cast("long"))
      .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
      .select(col("doc_id"), col("bucket"), col("n_tokens")))
    val offsets = scored.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
      .withColumn("offset",
        coalesce(sum(col("bucket_tokens")).over(
          Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("offset"))
    val wInBucket = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    scored.join(broadcast(offsets), Seq("bucket"))
      .withColumn("tok_start",
        (col("offset") +
          coalesce(sum(col("n_tokens")).over(wInBucket), lit(0L))).cast("long"))
      // integer `div`, not `/`: long `/` goes through DOUBLE division,
      // which is only exact below 2^53 — a 100 TB token tape is within
      // that, but the integer form is exact unconditionally
      .withColumn("seq_first", expr(s"tok_start div $seqLen").cast("long"))
      .withColumn("seq_last",
        expr(s"(tok_start + n_tokens - 1) div $seqLen").cast("long"))
      .withColumn("spans", (col("seq_last") - col("seq_first") + 1).cast("long"))
      .select(col("doc_id"), col("bucket"), col("n_tokens"), col("tok_start"),
        col("seq_first"), col("seq_last"), col("spans"))
      .orderBy(col("bucket"), col("doc_id"))
  }

  /** GUARANTEED heavy hitters via a Count-Min sketch candidate stage +
    * exact verify — the frequent-token pass (stopword mining, tokenizer
    * merges, contamination hot-strings) shaped for a corpus whose
    * distinct-token space does NOT fit anywhere.
    *
    * Heavy hitter = token with ≥ φ·N occurrences (N = total stream
    * length), the classic φ-fraction definition, so the threshold
    * scales with the corpus instead of being an absolute count.
    *
    * Shape (candidates-then-verify, the same design language as the
    * dedup families):
    *  1. SKETCH: one pass over occurrences; each lands in `depth`
    *     (row, xxhash64(token, row) mod width) cells. Map-side combine
    *     reduces the shuffle to ≤ depth·width cell partials; the merged
    *     sketch (depth·width longs — here 4·512) collects to the
    *     driver and rides back as ONE `typedLit` constant.
    *  2. PRUNE: a token's estimate = min over rows of its cells; CMS
    *     only ever OVER-estimates, so `est ≥ T` keeps every true heavy
    *     hitter — recall 1 by construction, the same guarantee story as
    *     [[Dedup.dPrefixPairs]]. The filter runs BEFORE the per-token
    *     shuffle, which is the point at 100 TB: the exact groupBy sees
    *     only candidate occurrences, not the full long-tail vocabulary.
    *  3. VERIFY: exact counts of the survivors; `HAVING cnt ≥ T` drops
    *     the sketch's false positives, so the OUTPUT is exact — the
    *     DuckDB oracle never needs to model the sketch at all.
    *
    * (On this synthetic corpus the vocabulary is ~31 tokens, so the
    * prune stage is degenerate — every token is a candidate; the
    * mechanism and its guarantee are what the spec pins.) */
  def tHeavyHitters(spark: SparkSession, dir: String, phi: Double = 0.02,
      depth: Int = 4, width: Int = 512): DataFrame = {
    val toks = documents(spark, dir)
      .select(explode(tokens(col("text"))).as("token"))
    // ceil(φ·N) as exact integer arithmetic: N is a scalar long, and
    // floor/ceil on φ·N at these magnitudes is well inside double
    // exactness; both engines compute the identical threshold.
    val n = toks.count()
    val minCount = math.ceil(phi * n).toLong
    val cellRows = toks
      .select(explode(array((0 until depth).map(r => struct(
        lit(r).as("r"),
        pmod(xxhash64(col("token"), lit(r)), lit(width)).cast("int").as("c"))): _*))
        .as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("n"))
      .collect() // bounded: ≤ depth·width rows regardless of corpus size
    val cells = Array.fill(depth, width)(0L)
    cellRows.foreach(row => cells(row.getInt(0))(row.getInt(1)) = row.getLong(2))
    val cellsLit = typedLit(cells.map(_.toIndexedSeq).toIndexedSeq)
    val est = (0 until depth).map(r =>
      element_at(element_at(cellsLit, lit(r + 1)),
        (pmod(xxhash64(col("token"), lit(r)), lit(width)) + lit(1)).cast("int")))
      .reduce(least(_, _))
    toks.filter(est >= lit(minCount))
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .filter(col("tf") >= lit(minCount))
      .orderBy(col("tf").desc, col("token"))
  }

  /** Sliding-window token CHUNKING — the training-example splitter that
    * turns long documents into overlapping fixed-size windows (the
    * stride-overlap scheme of BERT-style context windowing). One chunk
    * per (doc, start) with start = 0, stride, 2·stride, … < n_tokens;
    * the final window truncates at the document end.
    *
    * Scale shape: a single codegen'd `posexplode(sequence(...))` per
    * document — no self-join, no window function, no state; chunk text
    * re-materializes via `slice` + `concat_ws` inside the same
    * projection. Embarrassingly parallel, pushdown-friendly. */
  def tChunkWindows(spark: SparkSession, dir: String, win: Int = 16,
      stride: Int = 12): DataFrame = {
    documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")))
      .filter(col("n") >= 1)
      .select(col("doc_id"), col("t"), col("n"),
        posexplode(expr(s"sequence(0, n - 1, $stride)"))
          .as(Seq("chunk_idx", "start_tok")))
      .withColumn("chunk_len", least(lit(win), col("n") - col("start_tok")))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("t"), col("start_tok") + 1, col("chunk_len"))))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        col("chunk_len").cast("long").as("chunk_len"), col("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Quality-ranked CURATION under a per-source token budget — the
    * data-mixture assembly step: within each source, take documents in
    * (quality DESC, doc_id) order while the cumulative token count
    * stays within budget (greedy prefix selection; a document that
    * would overflow the budget is skipped, as are all after it in that
    * source). Reuses THE quality formula ([[qualityCol]] — one source
    * of truth with `t_quality_score` and the corpus-clean gate).
    *
    * Scale note: the in-source prefix sum is a window partitioned by
    * source — with few huge sources that is the sequential-scan skew
    * trap. At 100 TB the equivalent selection is computed by CUT VALUE
    * instead: histogram quality per source (the
    * [[tQualityPercentiles]] formulation), binary-search the quality
    * threshold whose token mass meets the budget, then filter — two
    * narrow passes, no window. The window form is kept here because it
    * is exact at any tie and the oracle mirrors it row for row. */
  def tCurateBudget(spark: SparkSession, dir: String,
      budget: Long = 800L): DataFrame = {
    val scored = documents(spark, dir)
      .withColumn("t", tokens(col("text")))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("t"))).cast("long"))
      .withColumn("quality", qualityCol(col("n_tokens"), col("n_distinct")))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("quality"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    scored
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("cum_before") + col("n_tokens") <= budget)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("quality"),
        col("cum_before"))
      .orderBy(col("source"), col("cum_before"))
  }

  /** VOCABULARY GROWTH curve (Heaps' law measurement): distinct TYPE
    * counts over growing corpus prefixes, at two grains — unigram
    * tokens and 3-token shingles — the pass that sizes a tokenizer
    * vocabulary and decides when more data stops buying new types
    * (this corpus's unigram vocabulary saturates in the first bucket;
    * the shingle types keep growing, which is exactly the contrast the
    * curve exists to show). The doc-id range splits into `buckets`
    * equal ranges; each type's FIRST document determines where it
    * enters, and the curve is the cumulative bucket sum. All integer
    * arithmetic.
    *
    * Scale shape: one explode + min-aggregate per type at each grain
    * (map-side combined), then a bucket-bounded cumulative window —
    * the corpus is touched once per grain, the curve costs
    * O(buckets). */
  def tVocabGrowth(spark: SparkSession, dir: String,
      buckets: Int = 10): DataFrame = {
    val docs = documents(spark, dir)
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    // integer DIV, not `/`: long `/` routes through double division,
    // whose rounding can cross an integer boundary before the cast
    def growth(typed: DataFrame, cnt: String): DataFrame = typed
      .groupBy(col("ty"))
      .agg(min(col("doc_id")).as("first_doc"))
      .withColumn("bucket",
        expr(s"(first_doc * $buckets) DIV ${maxId + 1}L"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as(cnt))
    val base = docs
      .withColumn("t", tokens(col("text")))
    val uni = growth(
      base.select(col("doc_id"), explode(col("t")).as("ty")), "new_tokens")
    val shn = growth(
      base.filter(size(col("t")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(t) - 3), " +
            "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("ty")),
      "new_shingles")
    val grid = spark.range(buckets).select(col("id").as("bucket"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(uni, Seq("bucket"), "left")
      .join(shn, Seq("bucket"), "left")
      .withColumn("new_tokens", coalesce(col("new_tokens"), lit(0L)))
      .withColumn("new_shingles", coalesce(col("new_shingles"), lit(0L)))
      .withColumn("vocab_size", sum(col("new_tokens")).over(w))
      .withColumn("shingle_vocab_size", sum(col("new_shingles")).over(w))
      .select(col("bucket"), col("new_tokens"), col("vocab_size"),
        col("new_shingles"), col("shingle_vocab_size"))
      .orderBy(col("bucket"))
  }

  /** COLLOCATION mining by LIFT — the PMI pass of corpus analysis
    * without the cross-engine log-bit hazard (lift = the PMI argument
    * before the log; the RANKING is identical because log is
    * monotone): for adjacent token pairs with count ≥ `minCount`,
    * lift(a,b) = p(ab) / (p(a)·p(b)) computed as ONE division of two
    * EXACT decimal products — c_ab·N_u² as decimal(38,0), exact while
    * the triple product stays under 10³⁸ (true through ~10¹²-token
    * corpora; at the extreme 100 TB tail, ~10¹⁴ tokens, c_ab·N_u² can
    * exceed 38 digits and Spark's non-ANSI decimal arithmetic would
    * NULL the lift rather than error — the at-scale variant should
    * then fold one factor down first, e.g. c_ab/N_u as a double,
    * trading bit-exactness for range) — each product cast to double
    * once (correctly-rounded nearest in both engines), top-k by
    * (lift DESC, bigram).
    *
    * Scale shape: two hash-partitioned counts (unigram occurrences,
    * adjacent-pair occurrences via the [[tBigramTopk]] transform-
    * explode — no positional self-join), a vocab-bounded join of pair
    * counts to both unigram counts, `TakeOrderedAndProject` for the
    * k-cut. */
  def tCollocations(spark: SparkSession, dir: String, k: Int = 50,
      minCount: Long = 5L): DataFrame = {
    val toks = QueryCaches.persistTracked(documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("t")))
    val uni = toks
      .select(explode(col("t")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cu"))
    val nUni = toks.select(explode(col("t")).as("token")).count()
    val bi = toks
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), " +
          "i -> named_struct('w1', t[i], 'w2', t[i + 1]))")).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= minCount)
    val nBi = toks.filter(size(col("t")) >= 2)
      .select((size(col("t")) - 1).cast("long").as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    bi
      .join(uni.select(col("token").as("w1"), col("cu").as("cu1")), Seq("w1"))
      .join(uni.select(col("token").as("w2"), col("cu").as("cu2")), Seq("w2"))
      .withColumn("lift",
        (col("cb").cast("decimal(38,0)") * lit(nUni) * lit(nUni))
          .cast("double") /
          (lit(nBi).cast("decimal(38,0)") * col("cu1") * col("cu2"))
            .cast("double"))
      .withColumn("bigram", concat_ws(" ", col("w1"), col("w2")))
      .select(col("bigram"), col("cb"), col("cu1"), col("cu2"), col("lift"))
      .orderBy(col("lift").desc, col("bigram"))
      .limit(k)
  }

  /** Data-MIXTURE plan: given target domain weights, compute the
    * largest feasible training mix and the per-domain sampling rates —
    * the mixture-rebalancing arithmetic (DoReMi-style fixed target
    * weights; the weights here are configuration, the operator is the
    * distributed accounting). Sources group into 4 domains
    * (source number mod 4) with target shares 0.4/0.3/0.2/0.1; the
    * BOTTLENECK domain (min available/weight) caps the total feasible
    * token count T, each domain then contributes floor(weight·T).
    *
    * Determinism: available tokens are exact integer sums; T and the
    * plan derive through single double divisions/multiplications on
    * identical operands, so floor lands identically cross-engine.
    *
    * Scale shape: one hash-partitioned aggregation to a DOMAIN-BOUNDED
    * relation, then window math over those few rows — the corpus is
    * touched once, narrowly. */
  def tMixturePlan(spark: SparkSession, dir: String): DataFrame = {
    val weights = map(
      lit("domain_0"), lit(0.4), lit("domain_1"), lit(0.3),
      lit("domain_2"), lit(0.2), lit("domain_3"), lit(0.1))
    val avail = documents(spark, dir)
      .withColumn("domain",
        concat(lit("domain_"),
          (expr("CAST(substring(source, 4, 10) AS INT)") % 4)))
      .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
      .groupBy(col("domain"))
      .agg(sum(col("n_tokens")).as("avail_tokens"))
      .withColumn("weight", element_at(weights, col("domain")))
    // the bottleneck cap over the domain-bounded relation (≤4 rows —
    // the unpartitioned window is deliberate and harmless here)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    avail
      .withColumn("feasible_total",
        min(col("avail_tokens").cast("double") / col("weight")).over(wAll))
      .withColumn("plan_tokens",
        floor(col("weight") * col("feasible_total")).cast("long"))
      .withColumn("sampling_rate",
        col("plan_tokens").cast("double") /
          col("avail_tokens").cast("double"))
      .select(col("domain"), col("avail_tokens"), col("weight"),
        col("plan_tokens"), col("sampling_rate"))
      .orderBy(col("domain"))
  }

  /** Content fingerprints per document: full md5 of the raw text, md5 of
    * the whitespace/case-normalized text (the exact-dedup key), a 64-bit
    * prefix fingerprint, and the distinct 3-token shingle count (the
    * cardinality the near-dup pass operates on). md5 is identical in
    * Spark and DuckDB, so fingerprints are cross-engine comparable —
    * the portable analog of the reference's cityHash64 fingerprints
    * (scripts/cross-validate.sh:103-153, SURVEY V7). */
  def tFingerprint(spark: SparkSession, dir: String): DataFrame = {
    documents(spark, dir)
      .withColumn("t", tokens(col("text")))
      .withColumn("content_hash", md5(col("text")))
      .withColumn("norm_hash", md5(lower(trim(col("text")))))
      .withColumn("fp64", substring(col("content_hash"), 1, 16))
      .withColumn("n_shingles",
        when(size(col("t")) >= 3,
          size(expr("array_distinct(transform(sequence(0, size(t) - 3), " +
            "i -> concat_ws(' ', t[i], t[i+1], t[i+2])))")))
          .otherwise(lit(0)).cast("long"))
      .select(col("doc_id"), col("content_hash"), col("norm_hash"),
        col("fp64"), col("n_shingles"))
      .orderBy(col("doc_id"))
  }

  /** BPE MERGE LEARNING — the tokenizer-training pass of an LLM data
    * pipeline (Sennrich et al. 2016): learn the first `nMerges` merge
    * rules over the corpus by repeatedly merging the highest-weight
    * adjacent symbol pair, trained — as real BPE/WordPiece trainers do
    * — on the (word type, count) vocabulary, not on corpus positions.
    *
    * Symbol sequences ride as space-separated strings padded with one
    * leading/trailing blank; a merge is the CANONICAL non-overlapping
    * left-to-right pass via the double-delimiter rescan
    * ([[bpeMergeCol]] — `a a a a` → `aa aa`, matching what reference
    * trainers produce on symbol runs; r12's single-replace under-merged
    * those). The DuckDB oracle (the same 8 steps unrolled as chained
    * CTEs) replays the identical 3-replace chain bit-for-bit. Argmax
    * tie-break is total: (count DESC, left, right) over binary string
    * order.
    *
    * Scale shape: the corpus is touched ONCE (the word-count shuffle,
    * hash-partitioned with map-side combine); every iteration after
    * runs on the word-TYPE relation — vocabulary-bounded, not
    * corpus-bounded — with one single-row argmax collect per merge
    * (the same bounded-constant discipline as the k-means Lloyd loop).
    * At 100 TB the vocab is ~10⁷ types: per-step pair aggregation
    * stays a small hash shuffle, and `localCheckpoint` per step keeps
    * lineage flat. */
  def tBpeMerges(spark: SparkSession, dir: String,
      nMerges: Int = 8): DataFrame = {
    import spark.implicits._
    val (merges, _) = bpeTrain(spark, dir, nMerges)
    merges
      .toDF("merge_step", "left_sym", "right_sym", "pair_count")
      .orderBy(col("merge_step"))
  }

  /** The shared BPE training loop — returns the learned merge rules AND
    * the final merged word-type vocabulary (the state [[tBpeEncode]]
    * segments against). See [[tBpeMerges]] for semantics and scale
    * notes. */
  /** The char-split initial symbol vocabulary over the corpus word
    * types — the state both the trainer and the stored-merges APPLY
    * path start from. */
  private[graft] def bpeInitVocab(spark: SparkSession,
      dir: String): DataFrame = documents(spark, dir)
    .select(explode(tokens(col("text"))).as("w"))
    .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    .withColumn("syms",
      concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")))
    .select(col("syms"), col("cnt"))

  /** ONE merge-rule application to a delimited symbol string — shared
    * verbatim by the trainer's in-loop rewrite and the stored-model
    * apply ([[bpeApplyMerges]]), so the two folds cannot drift.
    *
    * CANONICAL NON-OVERLAPPING LEFT-TO-RIGHT merge (VERDICT r11 #6 /
    * r12 #5): the naive `replace(' l r ', ' lr ')` consumes the
    * delimiter between matches, so a symbol RUN under-merges
    * (`a a a a` → `aa a a` instead of the canonical `aa aa`). The fix
    * is the double-delimiter rescan: double every space (making each
    * boundary two spaces), replace `' l  r '` with `' lr '` — the
    * single flanking spaces are each HALF of a boundary, so
    * consecutive matches stay visible to the continuing scan — then
    * collapse the surviving double spaces. Plain-text replace-all
    * scans left-to-right and never rescans its own output in BOTH
    * Spark (`UTF8String.replace`) and DuckDB, so this is exactly the
    * greedy non-overlapping pass canonical BPE trainers run, replayed
    * bit-for-bit by the oracle's identical 3-replace chain. */
  private[graft] def bpeMergeCol(syms: Column, l: String,
      r: String): Column =
    replace(
      replace(
        replace(syms, lit(" "), lit("  ")),
        lit(s" $l  $r "), lit(s" $l$r ")),
      lit("  "), lit(" "))

  /** Tokenizer APPLY: fold an ORDERED merge-rule list (the shipped
    * model — [[graft.sink.ModelStore.loadBpe]]) over a symbol
    * vocabulary. No pair counting — the constant-cost path a stored
    * tokenizer runs on any corpus. */
  private[graft] def bpeApplyMerges(vocab: DataFrame,
      merges: Seq[(Long, String, String, Long)]): DataFrame =
    merges.foldLeft(vocab) { case (v, (_, l, r, _)) =>
      v.withColumn("syms", bpeMergeCol(col("syms"), l, r))
    }

  private[graft] def bpeTrain(spark: SparkSession, dir: String,
      nMerges: Int): (Seq[(Long, String, String, Long)], DataFrame) = {
    // LAZY checkpoint chain (r17, guide §1.2: the loop's cost at this
    // scale is per-job driver latency, not work): each step's best-pair
    // collect is the FIRST action over the previous step's rewrite, so
    // ONE job materializes the rewrite's checkpoint AND finds the next
    // merge — the eager form paid a dedicated materialization job per
    // step (2 jobs/merge → 1). A step's PARENT checkpoint stays alive
    // until the step's own collect has materialized the child (a lazy
    // checkpoint rebuilt from an unpersisted parent would lose data —
    // lineage is truncated), then unpersists.
    var vocab = bpeInitVocab(spark, dir).localCheckpoint(eager = false)
    var parent: Option[DataFrame] = None
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var step = 1
    var dry = false
    while (step <= nMerges && !dry) {
      val best = vocab
        .select(col("cnt"), split(trim(col("syms")), " ").as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(s) - 2), " +
            "i -> struct(s[i] AS l, s[i+1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(1).collect()
      // vocab's checkpoint is now materialized — its parent is disposable
      parent.foreach(_.unpersist())
      parent = None
      if (best.isEmpty) dry = true
      else {
        val (l, r, pc) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step.toLong, l, r, pc))
        parent = Some(vocab)
        vocab = vocab.withColumn("syms", bpeMergeCol(col("syms"), l, r))
          .localCheckpoint(eager = false)
        step += 1
      }
    }
    (merges.toSeq, vocab)
  }

  /** BPE ENCODING — apply the trained tokenizer ([[tBpeMerges]]) to the
    * corpus and report each document's token count under the learned
    * vocabulary: the train → apply pair every real tokenizer pipeline
    * ships. Per doc: word count, BPE token count, character mass, and
    * chars-per-token (the compression the 8 merges bought).
    *
    * The segmentation is computed ONCE per word TYPE — the final
    * training vocabulary already holds each word's merged symbol
    * sequence, so encoding is `replace(syms, ' ', '')` to recover the
    * word key plus `size(split(...))` for its token count, then a
    * vocab-bounded hash join from corpus word occurrences. That is the
    * at-scale shape: the corpus-sized side is a narrow explode feeding
    * one join on the token key; the expensive per-word work is
    * vocabulary-bounded. Applying the merge rules per OCCURRENCE would
    * redo identical string folds billions of times.
    *
    * Determinism: counts and character sums are exact integers;
    * `chars_per_token` is one double division of two exact Longs
    * (correctly-rounded identically in both engines). The oracle
    * replays training via the same 8 materialized CTEs as
    * [[tBpeMerges]]'s oracle, then joins the same way. */
  def tBpeEncode(spark: SparkSession, dir: String,
      nMerges: Int = 8): DataFrame = {
    val (_, vocab) = bpeTrain(spark, dir, nMerges)
    bpeEncodeFromVocab(spark, dir, vocab)
  }

  /** The encode half of [[tBpeEncode]] — per-doc token accounting from
    * a SEGMENTED vocabulary, shared with the model-store apply twin
    * ([[graft.llm.StoredModels.tBpeEncodeStored]]). */
  private[graft] def bpeEncodeFromVocab(spark: SparkSession, dir: String,
      vocab: DataFrame): DataFrame = {
    val enc = vocab.select(
      replace(col("syms"), lit(" "), lit("")).as("word"),
      size(split(trim(col("syms")), " ")).cast("long").as("n_sym"))
    documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .join(enc, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_sym")).as("n_bpe_tokens"),
        sum(length(col("word")).cast("long")).as("n_chars"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("n_bpe_tokens").cast("double"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic EPOCH SHUFFLE — the reproducible global permutation
    * + sharding every training run needs: each doc draws a shuffle key
    * `md5('epoch1:' || doc_id)`, lands in shard `first_hex_digit % 8`,
    * and takes its position from the key order WITHIN the shard.
    * Re-running with the same epoch tag reproduces the permutation
    * bit-for-bit on any cluster size; changing the tag reshuffles
    * everything (the rand()-free property [[tSplitAssign]] also
    * leans on).
    *
    * Scale shape: no global row_number — a total order over 100 TB
    * would serialize into one reducer. Sharding IS the hash partition
    * (balanced by md5 uniformity), and position-in-shard is a window
    * partitioned BY shard, so every shard sorts independently; at
    * production scale the shard count is the writer parallelism knob.
    * md5 hex and its string order are engine-identical, so the oracle
    * replays the permutation exactly. */
  def tEpochShuffle(spark: SparkSession, dir: String,
      nShards: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col("doc_id"))
    documents(spark, dir)
      .withColumn("shuffle_key",
        md5(concat(lit("epoch1:"), col("doc_id").cast("string"))))
      .withColumn("shard",
        ((expr("instr('0123456789abcdef', substring(shuffle_key, 1, 1))") -
          1) % nShards).cast("long"))
      .withColumn("pos_in_shard", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shuffle_key"), col("shard"),
        col("pos_in_shard"))
      .orderBy(col("shard"), col("pos_in_shard"))
  }

  /** N-GRAM LM QUALITY SCORING — the CCNet-style filter (Wenzek et al.
    * 2020): train a TRIGRAM language model on the TRAIN split
    * ([[withSplit]]) and score EVERY document by its mean trigram
    * probability under stupid backoff (Brants et al. 2007):
    * P(c|a,b) = c(abc)/c(ab) if the trigram is in-model, else
    * 0.4 · c(bc)/c(b), else 0.4² · c(c)/N. Held-out val/test docs
    * genuinely take the backoff path (~4% of gate-corpus trigram
    * positions are unseen in train; the third level is principled
    * completeness for OOV-bearing corpora — this synthetic vocab is
    * small enough that every bigram is in-model).
    *
    * Bit-exactness across engines: probabilities ride as FLOOR-SCALED
    * INTEGERS — seen: (10⁹·c_abc) div c_ab; bigram backoff:
    * (4·10⁸·c_bc) div c_b; unigram floor: (1.6·10⁸·c_c) div N — so
    * the per-doc sum is exact integer arithmetic, and `lm_score` is
    * ONE double division of two exact Longs (no float accumulation
    * anywhere; the [[tCollocations]] discipline). The 10⁹ scale keeps
    * the products inside int64 through ~10⁹-token training corpora;
    * past that, lift the product into decimal(38,0) exactly as the
    * collocation lift does.
    *
    * Scale shape: two corpus passes (train counts; scoring explode),
    * both hash-partitioned with map-side combine. The model relations
    * are vocab-bounded; scoring is a chain of equi-joins on n-gram
    * keys that AQE broadcasts when the model is small and
    * hash-partitions when it is not — never a per-doc driver loop. */
  def tLmScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = QueryCaches.persistTracked(
      withSplit(documents(spark, dir))
        .select(col("doc_id"), col("split"), tokens(col("text")).as("t")))
    val train = docs.filter(col("split") === "train")
    val uni = lmUnigramCounts(train)
    val nTotal = train.select(explode(col("t")).as("token")).count()
    val big = lmBigramCounts(train)
    val tri = lmTrigramCounts(train)
    lmScoreFromCounts(lmDocTrigrams(docs), uni, big, tri, nTotal)
  }

  /** The three model-count folds and the per-doc trigram fold — each a
    * hash-partitioned aggregation with map-side combine over a
    * tokenized relation (`doc_id`, `t`). Shared verbatim by the batch
    * query and the streaming summing-MV twin so the two models cannot
    * drift. */
  private[graft] def lmUnigramCounts(docs: DataFrame): DataFrame = docs
    .select(explode(col("t")).as("token"))
    .groupBy(col("token")).agg(count(lit(1)).as("cu"))

  private[graft] def lmBigramCounts(docs: DataFrame): DataFrame = docs
    .filter(size(col("t")) >= 2)
    .select(explode(expr(
      "transform(sequence(0, size(t) - 2), " +
        "i -> named_struct('w1', t[i], 'w2', t[i + 1]))")).as("p"))
    .select(col("p.w1"), col("p.w2"))
    .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))

  private[graft] def lmTrigramCounts(docs: DataFrame): DataFrame = docs
    .filter(size(col("t")) >= 3)
    .select(explode(expr(
      "transform(sequence(0, size(t) - 3), " +
        "i -> named_struct('w1', t[i], 'w2', t[i + 1], 'w3', t[i + 2]))"))
      .as("p"))
    .select(col("p.w1"), col("p.w2"), col("p.w3"))
    .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c3"))

  /** Per-doc DISTINCT-trigram occurrence counts (`doc_id`, w1..w3,
    * `n`) — the scoring join runs over the type grain, not the
    * position grain, and weights by `n` (scores are per-position
    * constants, so the weighted sum is exact and the join fan-in
    * shrinks to per-doc distinct trigrams). */
  private[graft] def lmDocTrigrams(docs: DataFrame): DataFrame = docs
    .filter(size(col("t")) >= 3)
    .select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(t) - 3), " +
        "i -> named_struct('w1', t[i], 'w2', t[i + 1], 'w3', t[i + 2]))"))
      .as("p"))
    .select(col("doc_id"), col("p.w1"), col("p.w2"), col("p.w3"))
    .groupBy(col("doc_id"), col("w1"), col("w2"), col("w3"))
    .agg(count(lit(1)).as("n"))

  /** INVERTED INDEX build — the posting table every retrieval-based
    * curation step (dedup lookup, contamination search, BM25 ranking)
    * sits on: one row per (token, document) with the term frequency and
    * first position, each row carrying its term's document frequency
    * and collection frequency. tf/first_pos come from ONE
    * posexplode + hash aggregation at the (token, doc) grain; df/cf
    * from one more token-grain aggregation joined back (vocab-bounded,
    * AQE-owned). That IS the scale shape of index building: postings
    * live as hash-partitioned rows keyed by token — never a
    * collect_list of a hot term's million documents into one value.
    * All-integer output. */
  def tInvertedIndex(spark: SparkSession, dir: String): DataFrame = {
    val postings = QueryCaches.persistTracked(
      documents(spark, dir)
        .select(col("doc_id"), posexplode(tokens(col("text")))
          .as(Seq("pos", "token")))
        .groupBy(col("token"), col("doc_id"))
        .agg(count(lit(1)).as("tf"),
          (min(col("pos")) + 1).cast("long").as("first_pos")))
    val stats = postings.groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    postings.join(stats, Seq("token"))
      .select(col("token"), col("doc_id"), col("tf"), col("first_pos"),
        col("df"), col("cf"))
      .orderBy(col("token"), col("doc_id"))
  }

  /** BM25 PHRASE RANKING — query-relevance retrieval over the corpus
    * (the targeted-curation primitive: "find training docs about X"),
    * Okapi BM25 (k1 = 1.2, b = 0.75) over BIGRAM phrase terms (this
    * corpus's unigram vocabulary is so small that every unigram is
    * near-ubiquitous; bigram df spans 1–9% of docs, so idf genuinely
    * discriminates).
    *
    * Bit-exactness: the ENTIRE score is integer arithmetic — the
    * tf-saturation fraction rides as
    * `(10⁶·22·tf·A) div (10·tf·A + 3·A + 9·dl·D)` (numerator and
    * denominator of tf·2.2/(tf + 0.3 + 0.9·dl·D/A) each multiplied by
    * 10·A, then floor-scaled), and the idf weight as the floor-scaled
    * exact BM25 idf ARGUMENT `(10³·(2(N−df)+1)) div (2df+1)` — the
    * [[tCollocations]] pre-log discipline: monotone in df, so ranking
    * is preserved and no engine ever takes a log. The per-doc score
    * Σ w·s is an exact int64 through ~10⁶-doc corpora (past that,
    * lift the products into decimal(38,0)). Ties break on doc_id.
    *
    * Scale shape: the query set is a bounded literal relation (AQE
    * broadcasts it); doc phrase stats are ONE hash aggregation at the
    * (phrase, doc) grain restricted to query phrases BEFORE any
    * per-term work; df is query-term-bounded; the top-k cut is a
    * per-query window over score-sorted candidates. */
  def tBm25Topk(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import spark.implicits._
    val queries = Seq(
      (1L, "table hash"), (1L, "hash join"),
      (2L, "stream big"), (2L, "data line"),
      (3L, "slow line"), (3L, "batch batch"), (3L, "small big"))
      .toDF("query_id", "phrase")
    // fanout: tokenize is CPU-heavy over a byte-small scan (the house
    // pattern — see Dedup.signatures); the cache then holds 32-way
    // partitions so every downstream stage keeps the parallelism
    val docs = QueryCaches.persistTracked(documents(spark, dir)
      .fanout(col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .withColumn("dl", (size(col("t")) - 1).cast("long")))
    val corpus = docs.agg(count(lit(1)).as("d"), sum(col("dl")).as("a"))
      .collect()(0)
    val (nD, nA) = (corpus.getLong(0), corpus.getLong(1))
    // persisted (r17): both the document-frequency aggregate and the
    // scoring join read this relation — uncached, the bigram explode
    // (the ranker's heavy map) ran twice per query
    val docPhrase = QueryCaches.persistTracked(docs
      .select(col("doc_id"), col("dl"), explode(expr(
        "transform(sequence(0, size(t) - 2), " +
          "i -> concat_ws(' ', t[i], t[i + 1]))")).as("phrase"))
      .join(queries.select(col("phrase")).distinct(), Seq("phrase"))
      .groupBy(col("phrase"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf")))
    val df = docPhrase.groupBy(col("phrase"))
      .agg(count(lit(1)).as("df"))
    val scored = docPhrase
      .join(df, Seq("phrase"))
      .join(queries, Seq("phrase"))
      .withColumn("s_part", expr(
        s"(1000000L * 22L * tf * ${nA}L) div " +
          s"(10L * tf * ${nA}L + 3L * ${nA}L + 9L * dl * ${nD}L)"))
      .withColumn("w_idf", expr(
        s"(1000L * (2L * (${nD}L - df) + 1L)) div (2L * df + 1L)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w_idf") * col("s_part")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** TWO-SAMPLE KS DRIFT — the distribution-shift detector between the
    * train split and the held-out docs (val + test), over the per-doc
    * token-length distribution: the Kolmogorov–Smirnov statistic
    * D = max_v |F_train(v) − F_holdout(v)|, computed EXACTLY — the gap
    * rides as the cross-multiplied integer |c1·n2 − c2·n1| (c_i =
    * cumulative doc counts at value v), so the argmax involves no
    * float comparison, and the reported `ks_stat` is ONE double
    * division of two exact Longs. Deterministic argmax tie-break:
    * (gap DESC, value ASC).
    *
    * Scale shape: one hash aggregation to the (split-group, length)
    * grain, then cumulative windows over the DISTINCT-length grid —
    * value-grid-bounded, never raw docs (the [[tQualityPercentiles]]
    * histogram discipline). */
  def tKsDrift(spark: SparkSession, dir: String): DataFrame = {
    val lens = withSplit(documents(spark, dir))
      .select(
        when(col("split") === "train", lit("train"))
          .otherwise(lit("holdout")).as("grp"),
        size(tokens(col("text"))).cast("long").as("len"))
    val perLen = lens.groupBy(col("len"))
      .agg(
        sum(when(col("grp") === "train", 1L).otherwise(0L)).as("d1"),
        sum(when(col("grp") === "holdout", 1L).otherwise(0L)).as("d2"))
    // cumulative over the distinct-length grid (value-bounded window)
    val wCum = Window.orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    perLen
      .withColumn("c1", sum(col("d1")).over(wCum))
      .withColumn("c2", sum(col("d2")).over(wCum))
      .withColumn("n1", sum(col("d1")).over(wAll))
      .withColumn("n2", sum(col("d2")).over(wAll))
      .withColumn("gap_scaled",
        abs(col("c1") * col("n2") - col("c2") * col("n1")))
      .orderBy(col("gap_scaled").desc, col("len"))
      .limit(1)
      .withColumn("ks_stat",
        col("gap_scaled").cast("double") /
          (col("n1") * col("n2")).cast("double"))
      .select(col("len").as("at_len"), col("c1"), col("c2"),
        col("n1"), col("n2"), col("gap_scaled"), col("ks_stat"))
  }

  /** WEIGHTED PRIORITY SAMPLING — exactly-k-per-language selection with
    * inclusion probability increasing in document weight (here n_chars:
    * longer docs are likelier picks), the weighted counterpart of the
    * rate-based [[tStratifiedSample]]: that op keeps a RANDOM FRACTION
    * per stratum; this one returns an exact-size weight-biased panel —
    * priority sampling (Duffield–Lund–Thorup, JACM 2007; the bottom-k
    * analog of Efraimidis–Spirakis exponential keys). Each doc draws a
    * deterministic uniform u = h60(doc_id) (the portable 60-bit md5
    * fingerprint, [[graft.validate.Validation.h60]]) and is ranked by
    * priority u/w — smaller is better, and halving a doc's weight
    * doubles its expected rank, so P(selected) ∝-ish w for w ≪ the
    * k-th priority threshold. No rand() anywhere: reruns and engines
    * agree bit-for-bit.
    *
    * Cross-engine determinism: the key is ONE IEEE division of two
    * integer-valued doubles (int64→double rounding and division are
    * both exactly specified — the repo's single-division discipline);
    * ties are impossible short of an md5 collision, and (pkey, doc_id)
    * is total anyway.
    *
    * Scale shape: bottom-k per language via the two-phase cut — local
    * bottom-k inside (lang, u60 mod 32) buckets (windows over corpus/32
    * slices, parallel), then the global window runs only over the
    * ≤ 32·k survivors per language — the [[tQualityPercentiles]]
    * never-a-full-corpus-window discipline. */
  def tSamplePriority(spark: SparkSession, dir: String, k: Int = 25,
      buckets: Int = 32): DataFrame =
    samplePriorityFromFacts(
      documents(spark, dir).select(col("doc_id"), col("lang"),
        col("n_chars")), k, buckets)

  /** The priority-sampling computation over any (doc_id, lang, n_chars)
    * facts relation — shared by the batch query and the streaming
    * append-only-facts MV twin ([[graft.streaming.StreamingSample]]):
    * the selection is a pure function of the fact SET, so the streamed
    * PK-FINAL log answers through the identical read. */
  private[graft] def samplePriorityFromFacts(facts: DataFrame, k: Int = 25,
      buckets: Int = 32): DataFrame = {
    import graft.validate.Validation.h60
    val keyed = facts
      .filter(col("n_chars") > 0) // w = 0 is never sampleable; also
      // keeps the division IEEE-finite in both engines
      .withColumn("u60", h60(col("doc_id").cast("string")))
      .withColumn("pkey",
        col("u60").cast("double") / col("n_chars").cast("double"))
    val wLocal = Window
      .partitionBy(col("lang"), pmod(col("u60"), lit(buckets)))
      .orderBy(col("pkey"), col("doc_id"))
    // any global bottom-k row is a fortiori in its bucket's bottom-k,
    // so the local cut is lossless
    val survivors = keyed
      .withColumn("lrn", row_number().over(wLocal))
      .filter(col("lrn") <= k)
    val wGlobal = Window.partitionBy(col("lang"))
      .orderBy(col("pkey"), col("doc_id"))
    survivors
      .withColumn("rn", row_number().over(wGlobal).cast("long"))
      .filter(col("rn") <= k)
      .select(col("lang"), col("rn"), col("doc_id"), col("n_chars"),
        col("pkey"))
      .orderBy(col("lang"), col("rn"))
  }

  /** PARETO-FRONTIER CURATION (skyline) — the non-dominated documents
    * under (maximize n_chars, minimize n_tokens): a doc is on the
    * frontier iff no other doc has ≥ content AND ≤ token cost with one
    * strict — the multi-objective cut a curation pass applies when two
    * quality axes must not be collapsed into one weighted score. Both
    * dimensions are exact integers, so dominance is float-free.
    *
    * Algorithm: sort-by-one-dimension skyline — order by n_chars DESC
    * and keep a row iff its n_tokens (a) strictly beats the running min
    * over all STRICTLY-greater n_chars (a value-range frame, so equal
    * n_chars peers are excluded) and (b) equals the min within its own
    * n_chars class (an equal-cost peer with fewer tokens dominates).
    *
    * Scale shape: the classic two-phase skyline — phase 1 runs the same
    * window INSIDE doc_id-mod buckets (local dominance implies global,
    * so pruning is lossless and each window sees corpus/64); the global
    * pass runs only over local survivors, which real corpora bound at
    * ~the frontier size (worst case — a perfectly anti-correlated
    * corpus — degenerates to the full set, the documented bound; the
    * oracle's NOT EXISTS anti-join is the semantics, never the plan). */
  def tParetoFrontier(spark: SparkSession, dir: String,
      buckets: Int = 64): DataFrame =
    paretoFromPoints(
      documents(spark, dir)
        .select(col("doc_id"), col("n_chars"),
          size(tokens(col("text"))).cast("long").as("n_tokens")),
      buckets)

  /** The two-phase skyline over any (doc_id, n_chars, n_tokens) point
    * relation — exposed for the randomized property suite. */
  private[graft] def paretoFromPoints(d: DataFrame,
      buckets: Int = 64): DataFrame = {
    def skyline(df: DataFrame, part: Seq[Column]): DataFrame = {
      // rangeBetween(…, -1) under DESC = rows with n_chars ≥ cur + 1
      val wGt = Window.partitionBy(part: _*)
        .orderBy(col("n_chars").desc)
        .rangeBetween(Window.unboundedPreceding, -1)
      val wEq = Window.partitionBy((part :+ col("n_chars")): _*)
      df.withColumn("m_gt", min(col("n_tokens")).over(wGt))
        .withColumn("m_eq", min(col("n_tokens")).over(wEq))
        .filter(col("n_tokens") === col("m_eq") &&
          (col("m_gt").isNull || col("m_gt") > col("n_tokens")))
        .drop("m_gt", "m_eq")
    }
    val local = skyline(
      d.withColumn("bkt", pmod(col("doc_id"), lit(buckets))),
      Seq(col("bkt"))).drop("bkt")
    skyline(local, Seq.empty)
      .select(col("doc_id"), col("n_chars"), col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** RECIPROCAL-RANK FUSION — hybrid retrieval: fuse the lexical
    * ([[tBm25Topk]], bigram BM25) and semantic
    * ([[Similarity.sCosineTopk]], embedding cosine) rankings of the
    * same query ids into one list by RRF (Cormack/Clarke/Büttcher,
    * SIGIR 2009): score(d) = Σ_rankers 1/(60 + rank_r(d)). The fusion
    * constant 60 and pool depth 20 are the paper's defaults.
    *
    * Integer-exact: each reciprocal rides as 10¹² div (60 + rank) — a
    * floor-scaled exact rational, so fused scores and their ordering
    * are engine-identical with no float division; a doc missing from
    * one pool contributes exactly 0 (reported rank 0 = absent).
    *
    * Scale shape: both input rankings are (queries × poolK)-bounded
    * relations — the fusion join and final window are query-set-sized
    * whatever the corpus; all heavy lifting happens inside the two
    * rankers, each already scale-shaped. */
  def tRrfFusion(spark: SparkSession, dir: String, k: Int = 10,
      poolK: Int = 20): DataFrame = {
    val lex = tBm25Topk(spark, dir, poolK)
      .select(col("query_id"), col("doc_id"),
        col("rank").as("bm25_rank"))
    // cosine ranker over query ids {1,2,3} (= the BM25 query ids);
    // sCosineTopk ranks vec_id < nQueries, so compute 0..3, drop 0
    val sem = Similarity.sCosineTopk(spark, dir, poolK, nQueries = 4)
      .filter(col("query_id") >= 1)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("cos_rank"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
    lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(expr("1000000000000L div (60L + bm25_rank)"), lit(0L)) +
          coalesce(expr("1000000000000L div (60L + cos_rank)"), lit(0L)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("rrf_score"),
        coalesce(col("bm25_rank"), lit(0L)).as("bm25_rank"),
        coalesce(col("cos_rank"), lit(0L)).as("cos_rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The stupid-backoff scoring join + weighted per-doc fold over
    * (docTri = [[lmDocTrigrams]], uni/big/tri model counts, N).
    * Shared by batch and streaming read. */
  private[graft] def lmScoreFromCounts(docTri: DataFrame, uni: DataFrame,
      big: DataFrame, tri: DataFrame, nTotal: Long): DataFrame = docTri
    .join(tri, Seq("w1", "w2", "w3"), "left")
    .join(big.select(col("w1"), col("w2"), col("cb").as("cab")),
      Seq("w1", "w2"), "left")
    .join(big.select(col("w1").as("w2"), col("w2").as("w3"),
      col("cb").as("cbc")), Seq("w2", "w3"), "left")
    .join(uni.select(col("token").as("w2"), col("cu").as("cu2")),
      Seq("w2"), "left")
    .join(uni.select(col("token").as("w3"), col("cu").as("cu3")),
      Seq("w3"), "left")
    .withColumn("p_scaled",
      when(col("c3").isNotNull, expr("(1000000000L * c3) div cab"))
        .when(col("cbc").isNotNull, expr("(400000000L * cbc) div cu2"))
        .otherwise(expr(
          s"(160000000L * coalesce(cu3, 0L)) div ${nTotal}L")))
    .groupBy(col("doc_id"))
    .agg(sum(col("n")).as("n_trigrams"),
      sum(col("n") * col("p_scaled")).as("sum_scaled"))
    .withColumn("lm_score",
      col("sum_scaled").cast("double") / col("n_trigrams").cast("double"))
    .orderBy(col("doc_id"))
}
