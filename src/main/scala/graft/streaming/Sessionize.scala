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

  /** Batch sessionization (also usable on any bounded Dataset). */
  def sessionsBatch(events: Dataset[Ev], gapUs: Long): Dataset[Session] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(stateFn(gapUs, emitOpen = true))
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
