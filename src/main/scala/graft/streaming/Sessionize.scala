package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming (SURVEY.md §2.7 / north_star pipelines): gap-based
  * sessionization over a keyed event stream via
  * `flatMapGroupsWithState` — the state-store primitive for semantics the
  * built-in windows can't express. A session closes when its key sees no
  * events for `gap`; the emitted row carries the session bounds and count.
  *
  * Scale shape: state is ONE small record per active key (bounds + count),
  * partitioned by the grouping key across executors, and event-time timeout
  * bounds its lifetime — no unbounded growth, no reprocessing. */
object Sessionize {

  case class Event(key: String, ts: Timestamp)
  case class SessionState(start: Long, end: Long, count: Long)
  case class Session(key: String, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  /** Fold a batch of events into per-key open-session state; emit closed
    * sessions. Used with EventTimeTimeout: the watermark closes idle
    * sessions even when a key never sends another event. */
  private def update(key: String, events: Iterator[Event],
                     state: GroupState[SessionState],
                     gapMs: Long): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(Session(key, new Timestamp(s.start),
        new Timestamp(s.end), s.count))
    }
    val sorted = events.map(_.ts.getTime).toSeq.sorted
    var closed = List.empty[Session]
    // late orphans (older than the open session by more than the gap) are
    // accumulated and gap-split among THEMSELVES: two orphans within gap of
    // each other are one session, not two single-event ones. Sorted order
    // guarantees all orphans precede any event that extends the open
    // session, so a simple adjacent-merge is exact.
    var orphans = List.empty[SessionState]
    var cur = state.getOption
    sorted.foreach { t =>
      cur match {
        // within gap of either bound (late-but-in-watermark events extend
        // the session BACKWARD too — start must be min'd, not only end)
        case Some(s) if t >= s.start - gapMs && t - s.end <= gapMs =>
          cur = Some(SessionState(math.min(s.start, t),
            math.max(s.end, t), s.count + 1))
        case Some(s) if t < s.start - gapMs =>
          orphans = orphans match {
            case o :: rest if t - o.end <= gapMs =>
              SessionState(o.start, math.max(o.end, t), o.count + 1) :: rest
            case _ => SessionState(t, t, 1) :: orphans
          }
        case Some(s) => // gap exceeded inside the batch: close and restart
          closed ::= Session(key, new Timestamp(s.start),
            new Timestamp(s.end), s.count)
          cur = Some(SessionState(t, t, 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.end + gapMs)
    }
    val orphanSessions = orphans.reverse.map(o =>
      Session(key, new Timestamp(o.start), new Timestamp(o.end), o.count))
    (orphanSessions ++ closed.reverse).iterator
  }

  /** Sessionize a stream with columns (key: string, ts: timestamp).
    * `watermark` must be >= `gap` so the event-time timeout can fire. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
               watermark: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(iv.months == 0, s"calendar-month gaps are ambiguous: $gap")
    // CalendarInterval splits days from microseconds — both count
    val gapMs = iv.days * 86400000L + iv.microseconds / 1000L
    events.select(col("key"), col("ts"))
      .withWatermark("ts", watermark)
      .as[Event]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (k: String, it: Iterator[Event], st: GroupState[SessionState]) =>
          update(k, it, st, gapMs))
  }
}
