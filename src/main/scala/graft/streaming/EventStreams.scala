package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the gated batch event operators — the
  * same answers arriving incrementally:
  *
  *  - [[windowedAgg]]: watermarked tumbling-window aggregation, the
  *    streaming twin of `q_op_events_window` (same window, same
  *    aggregates — a sealed window's row equals the batch row),
  *  - [[sessionize]]: gap-based sessions via
  *    `flatMapGroupsWithState` with event-time timeout, the streaming
  *    twin of `q_op_events_sessionize` (a closed session equals the
  *    batch session: same event count and duration).
  *
  * State is bounded: one open session per active user, dropped at
  * timeout; window state is dropped once the watermark passes.
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** Open-session state (epoch seconds; counts). */
  case class SessionState(start: Long, last: Long, n: Long)

  case class Session(user_id: Long, session_start: Long, n_events: Long,
                     duration_sec: Long)

  def windowedAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 6).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization (`gapSec` inactivity closes a session).
    * Emits a session when a later event of the same user exceeds the gap
    * (split inside a batch) or when event time passes last + gap
    * (timeout). Batch-iterator order is not arrival order, so events are
    * sorted by (ts, event_id) before folding — the batch operator's
    * order.
    */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800,
                 watermark: String = "2 hours"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          def close(s: SessionState): Session =
            Session(user, s.start, s.n, s.last - s.start)
          if (it.isEmpty) { // timeout: the open session is complete
            val out = state.getOption.map(close).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime / 1000
              open match {
                case Some(s) if t - s.last <= gapSec =>
                  open = Some(SessionState(s.start, t, s.n + 1))
                case Some(s) =>
                  closed += close(s)
                  open = Some(SessionState(t, t, 1))
                case None =>
                  open = Some(SessionState(t, t, 1))
              }
            }
            open.foreach { s =>
              val timeoutMs = (s.last + gapSec + 1) * 1000
              // A late-but-accepted event (watermark delay > gap) can put
              // last+gap at or behind the current watermark; GroupState
              // rejects a timeout ≤ watermark with an exception that would
              // kill the query. Clamp forward one ms — the session then
              // closes at the next micro-batch's timeout sweep, which is
              // exactly when the unclamped timeout would already have
              // fired.
              val wm = state.getCurrentWatermarkMs()
              state.update(s)
              state.setTimeoutTimestamp(math.max(timeoutMs, wm + 1))
            }
            closed.result().iterator
          }
      }
  }
}
