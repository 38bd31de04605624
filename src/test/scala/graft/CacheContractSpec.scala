package graft

import org.scalatest.funsuite.AnyFunSuite

/** The tracked cache contract (VERDICT r6 #3): every persist a lazy
  * declared query creates is registered with [[QueryCaches]], so a
  * materializer releases EXACTLY those blocks — no blanket
  * `clearCache()` needed, caller-held caches survive.
  *
  * The suite runs every declared query known to persist intermediates,
  * materializes it, calls `releaseAll`, and asserts the session's
  * CacheManager is EMPTY — which fails if any query grows a persist
  * that bypasses the registry. */
class CacheContractSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // the queries whose plans persist (the r6 ADVICE/VERDICT list plus
  // every other registry user); kept here, not discovered, so a NEW
  // leaky query must be added consciously — and a stale name fails fast
  private val persisting = Seq(
    "t_tfidf_topk", "t_decontaminate", "t_quality_percentiles",
    "t_token_budget", "t_seq_pack", "d_shingle_novelty",
    "d_simhash_pairs", "d_minhash_pairs", "d_ngram_pairs",
    "d_embed_dedup", "w_value_deciles", "pipe_corpus_clean",
    "q17_small_qty_revenue", "q11_supplier_share")

  test("materialize + releaseAll leaves zero cached blocks per query") {
    val cm = spark.sharedState.cacheManager
    cm.clearCache()
    persisting.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        fail(s"stale cache-contract list: no declared query '$name'"))
      fn(spark, dir).count()
      assert(QueryCaches.outstanding > 0,
        s"$name no longer persists — drop it from the list so the " +
          "contract stays tight")
      QueryCaches.releaseAll()
      assert(cm.isEmpty,
        s"$name left cached blocks behind after releaseAll — an " +
          "untracked persist snuck in")
      assert(QueryCaches.outstanding === 0)
    }
  }

  test("caller-held caches survive a query's releaseAll") {
    val cm = spark.sharedState.cacheManager
    cm.clearCache()
    QueryCaches.releaseAll() // other suites may share the session
    val mine = Tables.documents(spark, dir).select("doc_id").persist()
    try {
      mine.count()
      SparkEntry.queries("t_tfidf_topk")(spark, dir).count()
      QueryCaches.releaseAll()
      assert(mine.storageLevel !=
        org.apache.spark.storage.StorageLevel.NONE,
        "releaseAll dropped a caller-held cache — the exact failure " +
          "the tracked contract exists to prevent")
    } finally mine.unpersist()
  }
}
