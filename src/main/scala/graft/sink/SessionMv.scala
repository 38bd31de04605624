package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SESSION-SCOPED MATERIALIZED-VIEW registry: build an expensive
  * derived relation ONCE per (session, key) into a crash-safe snapshot
  * directory ([[ParquetSink.replaceSnapshot]] — the S4
  * dimension-refresh discipline) and hand every later consumer a plain
  * parquet read. The generalization of the co-occurrence edge MV
  * (VERDICT r12 #2) to any derived relation several declared queries
  * share — the near-dup pair graph is the second instance (four
  * consumers re-mined it per session before).
  *
  * Contract:
  *  - the KEY must capture every input the build depends on (source
  *    dir + parameters): two keys never alias different content;
  *  - staleness follows the AssetsRefresher precedent — a snapshot is
  *    pinned to the session's view of its inputs; [[refreshAll]] (or a
  *    scheduled rebuild in a long-lived deployment) forces
  *    re-derivation, and the streaming twins are the incremental
  *    maintenance path;
  *  - snapshots live under one temp root deleted by a JVM shutdown
  *    hook; an individual rebuild overwrites via the crash-safe swap.
  */
object SessionMv {

  private val built =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Other session-memoized state that must refresh with the snapshot
    * registry (ADVICE r13 #1: the k-means centroid memo survived
    * [[refreshAll]], so a regenerated corpus would refresh the MVs but
    * keep serving a stale quantizer). Registering is idempotent per
    * name. */
  private val refreshHooks =
    scala.collection.concurrent.TrieMap.empty[String, () => Unit]
  def onRefresh(name: String)(f: () => Unit): Unit =
    refreshHooks.put(name, f): Unit

  private lazy val mvRoot: String = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_session_mv_").toFile
    sys.addShutdownHook {
      ParquetSink.delete(root)
    }
    root.getAbsolutePath
  }

  /** Read the snapshot for `key`, building it first if this session
    * has not yet; `build` must be deterministic in `key`. */
  def snapshot(spark: SparkSession, key: String)
      (build: => DataFrame): DataFrame = {
    val path = built.getOrElse(key, synchronized {
      built.getOrElse(key, {
        val p = s"$mvRoot/${java.util.UUID.randomUUID().toString.take(8)}"
        ParquetSink.replaceSnapshot(build, p)
        built.put(key, p)
        p
      })
    })
    spark.read.parquet(path)
  }

  /** Drop every memoized snapshot — the scheduled-refresh seam and the
    * suite's isolation hook. Files are left for the shutdown hook (a
    * racing reader may still be scanning them). */
  def refreshAll(): Unit = {
    built.clear()
    refreshHooks.values.foreach(_.apply())
  }
}
