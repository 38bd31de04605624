package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state via `flatMapGroupsWithState`: gap-based
  * sessionization of the event stream (the stateful-operator family the
  * reference lacks but a training-data pipeline needs; batch analytic
  * twin: EventQueries.wEventGaps).
  *
  * The same state function serves both executions:
  *  - batch: each user's full history arrives in one invocation; closed
  *    sessions split on gaps > `gapUs` and the trailing session is
  *    emitted too (batch = end of stream),
  *  - streaming: the open session persists in [[GroupState]] with a
  *    processing-time timeout and is emitted when the group times out
  *    (the TTL-expiry pattern, same as the reference's Redis EX).
  *
  * Scale: state is one small record per active user key, sharded by the
  * stream's groupBy hash — co-located state, no external KV store.
  */
object Sessionize {

  case class Ev(user_id: Long, ts_us: Long, event_id: Long)
  case class SessionState(start_us: Long, last_us: Long, n: Long)
  case class Session(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long)

  def stateFn(gapUs: Long, emitOpen: Boolean)(
      user: Long, events: Iterator[Ev],
      state: GroupState[SessionState]): Iterator[Session] = {
    def close(s: SessionState) = Session(user, s.start_us, s.last_us, s.n)
    if (state.hasTimedOut) {
      val out = state.getOption.map(close).iterator
      state.remove()
      return out
    }
    var closed = List.empty[Session]
    var cur = state.getOption
    events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      cur = cur match {
        case Some(s) if e.ts_us - s.last_us <= gapUs =>
          Some(SessionState(s.start_us, e.ts_us, s.n + 1))
        case Some(s) =>
          closed ::= close(s)
          Some(SessionState(e.ts_us, e.ts_us, 1L))
        case None =>
          Some(SessionState(e.ts_us, e.ts_us, 1L))
      }
    }
    if (emitOpen) {
      // batch execution: no more data will ever arrive for this key
      val out = (cur.map(close).toList reverse_::: closed).reverse
      state.remove()
      out.iterator
    } else {
      cur.foreach { s =>
        state.update(s)
        // µs gap as ms of wall clock, at least 1 ms (must be positive)
        state.setTimeoutDuration(math.max(1L, gapUs / 1000L))
      }
      closed.reverse.iterator
    }
  }

  /** Batch sessionization (also usable on any bounded Dataset) — the
    * real stateful operator driven in batch execution.
    *
    * OPTIMIZATION r17, measured NULL kept honest: a codegen rewrite
    * (lag + running-sum windows + per-session aggregate,
    * [[sessionsBatchWindow]]) was built on the guide-§4 expectation
    * that the typed flatMapGroupsWithState boundary dominates — the
    * in-session A/B ([[graft.tools.AbSessionize]], sf0.1, 5 alternating
    * reps) measured the WINDOW form 25-50% slower (0.46-0.92 s vs
    * 0.37-0.66 s): two WindowExec passes plus the session-grain
    * aggregate cost more than the per-row encoder hop at this group
    * size. The stateFn path stays the default; the window twin is kept
    * (suite-pinned equal) as the spill-safe alternative for a corpus
    * whose single hottest user outgrows task heap — stateFn's
    * `toSeq.sortBy` materializes one user's whole history per task,
    * the one structural hazard the window form does not have. */
  def sessionsBatch(events: Dataset[Ev], gapUs: Long): Dataset[Session] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(stateFn(gapUs, emitOpen = true))
  }

  /** Window-codegen twin of [[sessionsBatch]] (same sessions, pinned by
    * the suite): a session break is exactly `ts − prev_ts > gapUs`
    * because in (ts_us, event_id) order the state's `last_us` IS the
    * previous row's ts; the running break-sum numbers the sessions. */
  private[graft] def sessionsBatchWindow(events: Dataset[Ev],
      gapUs: Long): Dataset[Session] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    events.toDF()
      .withColumn("brk",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) <= gapUs, 0L)
          .otherwise(1L)) // null lag (first row) lands here too
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"))
      .as[Session]
  }

  /** Streaming sessionization: open sessions close on processing-time
    * timeout. */
  def sessionsStream(events: Dataset[Ev], gapUs: Long): Dataset[Session] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(stateFn(gapUs, emitOpen = false))
  }
}
