package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key state via flatMapGroupsWithState: sessionization with an
  * inactivity gap, emitting a session record when the gap expires — the
  * arbitrary-stateful-processing escape hatch for semantics that
  * session_window can't express (e.g. per-session derived metrics,
  * session caps, custom eviction).
  *
  * Scale notes: state is one SessionState per active key, stored in the
  * state store (RocksDB-backed on a real cluster), bounded by the event-time
  * timeout — not by stream length. The shuffle is the groupByKey hash
  * partitioning on user_id; everything else is per-partition.
  */
object StatefulSessions {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Int, sum_value: Double)

  val GapMs: Long = 10 * 60 * 1000

  /** One group-update step: fold new events into open state; emit the
    * closed session on event-time timeout. */
  def updateState(userId: Long, events: Iterator[Event],
                  state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(SessionOut(userId, new Timestamp(s.start),
        new Timestamp(s.last + GapMs), s.n, s.sum))
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last < GapMs =>
            cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value))
          case Some(s) =>
            closed ::= SessionOut(userId, new Timestamp(s.start),
              new Timestamp(s.last + GapMs), s.n, s.sum)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + GapMs)
      }
      closed.reverseIterator
    }
  }

  /** Wire the stateful op over a (possibly streaming) event Dataset. */
  def sessionize(spark: SparkSession, events: Dataset[Event]): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateState)
  }
}
