package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.sink.ModelStore

/** Model-store APPLY twins (VERDICT r12 #1): each declared query runs
  * the full producer/consumer contract —
  *
  *   1. TRAIN and [[ModelStore]]-save a deliberately STALE version 1
  *      (seed-only quantizers, a merge-rule prefix, perturbed LM
  *      counts — same PK sets, wrong content);
  *   2. train and save the REAL model as version 2;
  *   3. LOAD latest (the PK-FINAL read — picking v1 would fail the
  *      oracle, so latest-wins is load-bearing in the gate);
  *   4. APPLY through the SAME from-model search/encode/score body as
  *      the train-inline batch query.
  *
  * Result ≡ the batch twin (same oracle by construction): the trainers
  * are bit-deterministic, storage is exact (doubles round-trip parquet
  * bit-for-bit, counts are integers), and the apply bodies are shared
  * verbatim. At 100 TB only step 4 runs per query — training is the
  * rare scheduled producer, exactly the reference's daily-refresh
  * assets shape (README.md:293-310).
  *
  * Versioning contract proved here and worth naming: a save supersedes
  * a prior version per PK, so whole-model replaces must cover (or
  * tombstone) the old version's keys — the ReplacingMergeTree DELETE
  * contract ([[graft.sink.ParquetSink.readFinalWithDeletes]]) handles
  * shrinking key sets; these models only grow or rewrite keys.
  */
object StoredModels {

  private def freshRoot(): String = java.nio.file.Files
    .createTempDirectory("graft_model_store_").toAbsolutePath.toString

  /** Shared checkpointed corpus — [[Similarity.checkpointedCorpus]]
    * (adaptive fan-out when the scan is narrower than the session's
    * parallelism; identity at production split counts). */
  private def normedCorpus(spark: SparkSession, dir: String): DataFrame =
    Similarity.checkpointedCorpus(spark, dir)

  /** `s_ann_kmeans_stored`: IVF search against the STORED coarse
    * quantizer. Same oracle as `s_ann_kmeans`. */
  def sAnnKmeansStored(spark: SparkSession, dir: String, k: Int = 3,
      nQueries: Int = 20, nCells: Int = 8, iters: Int = 2,
      nprobe: Int = 2): DataFrame = {
    graft.Tables.tune(spark)
    val e = normedCorpus(spark, dir)
    val root = freshRoot()
    // v1: seed-only (iters=0) quantizer — stale by construction
    ModelStore.saveKmeans(spark, root, "ivf_coarse", 1L,
      Similarity.kmeansCentroids(e, nCells, 0))
    ModelStore.saveKmeans(spark, root, "ivf_coarse", 2L,
      Similarity.kmeansCentroids(e, nCells, iters))
    val loaded = ModelStore.loadKmeans(spark, root, "ivf_coarse")
    // the centroids are on the driver now — the store files are done
    graft.sink.ParquetSink.delete(new java.io.File(root))
    Similarity.kmeansSearch(e, loaded, k, nQueries, nprobe)
  }

  /** `s_ann_pq_stored`: ADC scan + rerank against the STORED PQ
    * codebooks. Same oracle as `s_ann_pq`. */
  def sAnnPqStored(spark: SparkSession, dir: String, k: Int = 3,
      nQueries: Int = 20, m: Int = 8, dsub: Int = 8, ksub: Int = 8,
      iters: Int = 2, nCand: Int = 64): DataFrame = {
    graft.Tables.tune(spark)
    val e = normedCorpus(spark, dir)
    val root = freshRoot()
    ModelStore.savePq(spark, root, "pq8x8", 1L,
      Similarity.pqCodebooks(e, m, dsub, ksub, 0))
    ModelStore.savePq(spark, root, "pq8x8", 2L,
      Similarity.pqCodebooks(e, m, dsub, ksub, iters))
    val loaded = ModelStore.loadPq(spark, root, "pq8x8")
    graft.sink.ParquetSink.delete(new java.io.File(root))
    Similarity.pqSearch(e, loaded, k, nQueries, m, dsub, ksub, nCand)
  }

  /** `s_ann_ivfpq_stored`: the composed IVFADC index against BOTH
    * stored halves — the coarse quantizer AND the residual PQ books
    * ride the versioned store (the books are only meaningful with the
    * exact centroids they were trained against, so a deployment ships
    * them together; here both load latest-wins past a stale v1).
    * Same oracle as `s_ann_ivfpq`. `assignEps` rides through to the
    * ENCODE step exactly as in the inline twin (books always train on
    * primary residuals; replicas are encode-time rows), so
    * stored == inline holds at any ε. */
  def sAnnIvfPqStored(spark: SparkSession, dir: String, k: Int = 3,
      nQueries: Int = 20, nCells: Int = 0, iters: Int = 2,
      nprobe: Int = 4, m: Int = 8, dsub: Int = 8, ksub: Int = 8,
      pqIters: Int = 2, nCand: Int = 0,
      assignEps: Double = 0.0): DataFrame = {
    graft.Tables.tune(spark)
    val e = normedCorpus(spark, dir)
    // same promoted defaults as the train-inline twin (√n cells,
    // 13·k rerank budget) — resolved identically so the pair stays
    // row-for-row comparable at any knob setting
    val cells = if (nCells > 0) nCells else Similarity.autoCells(e.count())
    val cand = if (nCand > 0) nCand else math.max(32, 13 * k)
    val root = freshRoot()
    // v1: seed-only coarse quantizer + books trained against ITS
    // residuals — a coherent but stale model pair
    val staleCents = Similarity.kmeansCentroids(e, cells, 0)
    ModelStore.saveKmeans(spark, root, "ivfpq_coarse", 1L, staleCents)
    ModelStore.savePq(spark, root, "ivfpq_books", 1L,
      Similarity.pqCodebooks(
        Similarity.residualRel(e, staleCents), m, dsub, ksub, 0))
    // v2: the real pair
    val cents = Similarity.kmeansCentroids(e, cells, iters)
    val resid = graft.QueryCaches.persistTracked(
      Similarity.residualRel(e, cents))
    ModelStore.saveKmeans(spark, root, "ivfpq_coarse", 2L, cents)
    ModelStore.savePq(spark, root, "ivfpq_books", 2L,
      Similarity.pqCodebooks(resid, m, dsub, ksub, pqIters))
    val loadedCents = ModelStore.loadKmeans(spark, root, "ivfpq_coarse")
    val loadedBooks = ModelStore.loadPq(spark, root, "ivfpq_books")
    graft.sink.ParquetSink.delete(new java.io.File(root))
    Similarity.ivfPqSearch(e,
      Similarity.residualRel(e, loadedCents, assignEps),
      loadedCents, loadedBooks, k, nQueries, nprobe, m, dsub, ksub, cand,
      multiAssigned = assignEps > 0)
  }

  /** `t_bpe_encode_stored`: segment the corpus with the STORED merge
    * rules — fold the shipped rule list over the char-split vocabulary
    * (no pair counting), then the shared encode body. Same oracle as
    * `t_bpe_encode`. */
  def tBpeEncodeStored(spark: SparkSession, dir: String,
      nMerges: Int = 8): DataFrame = {
    graft.Tables.tune(spark)
    val root = freshRoot()
    // v1: a merge-rule PREFIX (stale); its PKs are a subset of v2's
    val (all, _) = TextAnalysis.bpeTrain(spark, dir, nMerges)
    ModelStore.saveBpe(spark, root, "bpe8", 1L, all.take(3))
    ModelStore.saveBpe(spark, root, "bpe8", 2L, all)
    val rules = ModelStore.loadBpe(spark, root, "bpe8")
    graft.sink.ParquetSink.delete(new java.io.File(root))
    TextAnalysis.bpeEncodeFromVocab(spark, dir,
      TextAnalysis.bpeApplyMerges(
        TextAnalysis.bpeInitVocab(spark, dir), rules))
  }

  /** `t_lm_score_stored`: stupid-backoff scoring against the STORED
    * trigram LM — the count RELATIONS load as distributed FINAL reads
    * (never collected; at 100 TB the trigram table outgrows any
    * driver). Same oracle as `t_lm_score`. */
  def tLmScoreStored(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.tune(spark)
    val docs = graft.QueryCaches.persistTracked(
      TextAnalysis.withSplit(documents(spark, dir))
        .select(col("doc_id"), col("split"), TextAnalysis.tokens(col("text")).as("t")))
    val train = docs.filter(col("split") === "train")
    val uni = TextAnalysis.lmUnigramCounts(train)
    val big = TextAnalysis.lmBigramCounts(train)
    val tri = TextAnalysis.lmTrigramCounts(train)
    val nTotal = train.select(explode(col("t")).as("token")).count()
    val root = freshRoot()
    // v1: same n-gram keys, PERTURBED counts (+1 / +1000) — asymmetric,
    // so the floor-scaled ratios genuinely differ from the real model
    ModelStore.saveLm(spark, root, "trigram_sb", 1L,
      uni.withColumn("cu", col("cu") + 1L),
      big.withColumn("cb", col("cb") + 1L),
      tri.withColumn("c3", col("c3") + 1L),
      nTotal + 1000L)
    ModelStore.saveLm(spark, root, "trigram_sb", 2L, uni, big, tri, nTotal)
    val (sUni, sBig, sTri, sN) = ModelStore.loadLm(spark, root, "trigram_sb")
    // the loaded relations lazily read the store — delete only after
    // the caller has materialized the result (the cache-contract seam)
    graft.QueryCaches.onRelease(() =>
      graft.sink.ParquetSink.delete(new java.io.File(root)))
    TextAnalysis.lmScoreFromCounts(
      TextAnalysis.lmDocTrigrams(docs), sUni, sBig, sTri, sN)
  }
}
