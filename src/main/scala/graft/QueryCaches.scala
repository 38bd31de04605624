package graft

import org.apache.spark.sql.Dataset

/** Per-query cache registry — the upgraded CACHE CONTRACT (VERDICT r6 #3).
  *
  * Lazy declared queries persist intermediates that only pay off once the
  * returned frame is materialized, so they cannot unpersist them
  * themselves. Previously callers had to run a session-wide
  * `spark.catalog.clearCache()` between queries — which also drops
  * CALLER-held caches (the ADVICE r5 objection to the blunt contract).
  *
  * New contract: query code routes every such persist through
  * [[QueryCaches.persistTracked]]; a caller that has materialized the
  * returned frame calls [[QueryCaches.releaseAll]] and releases EXACTLY
  * the blocks queries registered — its own caches survive. Verify and
  * Bench do this after every query; loops that materialize internally
  * keep using the `*Tracked` variants (e.g. [[llm.Dedup.dDupGroups]])
  * since they can release mid-flight, before the caller ever sees a
  * frame.
  */
object QueryCaches {
  private val tracked =
    scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]
  private val cleanups =
    scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  /** Persist `ds` and register it for the next [[releaseAll]]. */
  def persistTracked[T](ds: Dataset[T]): Dataset[T] = synchronized {
    ds.persist()
    tracked += ds
    ds
  }

  /** Register an ALREADY-persisted frame (the `*Tracked` helpers persist
    * internally and hand their cache list to the caller). */
  def track(dss: Seq[Dataset[_]]): Unit = synchronized {
    tracked ++= dss
  }

  /** Register a cleanup side effect to run at the next [[releaseAll]] —
    * the same after-materialization seam the cache contract rides on,
    * for NON-cache residue a lazy query cannot remove itself (e.g. the
    * bucketed-join tables: the returned frame scans their files, so the
    * query cannot drop them before the caller materializes; VERDICT r8
    * #2 — the warehouse grew two stale `graft_bkt_*` dirs per run,
    * forever). Cleanup failures are swallowed: releaseAll is a
    * best-effort janitor, never a query-failure path. */
  def onRelease(f: () => Unit): Unit = synchronized {
    cleanups += f
  }

  /** Unpersist every registered frame (non-blocking), run registered
    * cleanups, and clear the registry. Safe to call when empty; safe to
    * call repeatedly. */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(_.unpersist(false))
    tracked.clear()
    cleanups.foreach(f => try f() catch { case _: Throwable => () })
    cleanups.clear()
  }

  /** Registered-but-unreleased count — lets the suite assert the "no
    * declared query leaves untracked persisted blocks behind" invariant. */
  def outstanding: Int = synchronized(tracked.size)
}
