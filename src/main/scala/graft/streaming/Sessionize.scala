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
  * State per key is the list of OPEN session fragments (bounds + count),
  * not just the newest one: a late-but-in-watermark event may start a
  * fragment older than the current session, and a later event may bridge
  * two fragments into one. A fragment is only emitted once the watermark
  * passes fragment.end + gap — at that point no admissible event (Spark
  * drops rows older than the watermark before they reach the state
  * function) can extend or bridge it, so emissions are exact
  * gap-sessionization. Fragment count per key is bounded by
  * watermark-delay / gap; event-time timeout bounds state lifetime.
  *
  * NOTE: the state schema is Seq[SessionState] (a fragment LIST); a
  * checkpoint written by a pre-fragment-list build cannot be restored —
  * restart such a query from a fresh checkpoint. A decode failure on an
  * old checkpoint is rethrown with that instruction instead of the
  * opaque state-deserialization error. */
object Sessionize {

  case class Event(key: String, ts: Timestamp)
  case class SessionState(start: Long, end: Long, count: Long)
  case class Session(key: String, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  /** Fold a batch of events into the per-key open-fragment list; emit the
    * fragments the watermark has sealed. Also the timeout path (empty
    * event iterator): the watermark alone closes idle sessions. */
  private def update(key: String, events: Iterator[Event],
                     state: GroupState[Seq[SessionState]],
                     gapMs: Long): Iterator[Session] = {
    val wm = state.getCurrentWatermarkMs()
    // best-effort schema-mismatch guard: decoding pre-fragment-list state
    // (single SessionState) as Seq[SessionState] fails here — point the
    // operator at the cause instead of the opaque decode stack. Only
    // encoder-decode failures are rebranded (ExpressionEncoder raises
    // RuntimeException/SparkRuntimeException with a "decod…" message);
    // anything else — a corrupt state store, an unrelated failure — must
    // surface as itself, not as migration advice
    val existing = try state.getOption.getOrElse(Seq.empty) catch {
      case e: RuntimeException if Option(e.getMessage).exists(m =>
          m.toLowerCase.contains("decod") ||
            m.contains("EXPRESSION_DECODING_FAILED")) =>
        throw new IllegalStateException(
          "cannot decode sessionization state — this checkpoint was likely " +
            "written by a build whose state schema predates the fragment " +
            "list (Seq[SessionState]); restart the query from a fresh " +
            "checkpoint", e)
    }
    val incoming = events.map(e => {
      val t = e.ts.getTime; SessionState(t, t, 1)
    }).toSeq
    // sorted gap-merge of fragments + events: one event bridging two
    // fragments collapses them transitively
    val merged = (existing ++ incoming).sortBy(s => (s.start, s.end))
      .foldLeft(List.empty[SessionState]) { (acc, p) =>
        acc match {
          case h :: rest if p.start - h.end <= gapMs =>
            SessionState(h.start, math.max(h.end, p.end),
              h.count + p.count) :: rest
          case _ => p :: acc
        }
      }.reverse
    val (closed, open) = merged.partition(s => s.end + gapMs <= wm)
    if (open.isEmpty) state.remove()
    else {
      state.update(open)
      // earliest seal time; must be strictly beyond the current watermark
      state.setTimeoutTimestamp(
        math.max(open.map(_.end + gapMs).min, wm + 1))
    }
    closed.iterator.map(s =>
      Session(key, new Timestamp(s.start), new Timestamp(s.end), s.count))
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
        (k: String, it: Iterator[Event], st: GroupState[Seq[SessionState]]) =>
          update(k, it, st, gapMs))
  }
}
