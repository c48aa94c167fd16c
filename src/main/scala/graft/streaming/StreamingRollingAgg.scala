package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Analytics.rollingAgg]]: per-event
  * trailing time-range (count, exact-decimal sum) over a keyed stream via
  * `flatMapGroupsWithState` — rate meters and trailing-volume features
  * computed AS the events arrive instead of in a nightly batch.
  *
  * Exactness contract: an event's frame is `[ts - window, ts]` — it only
  * looks BACKWARD, so the event is emittable the moment no admissible
  * event at-or-before its timestamp can still arrive. Spark's late-data
  * filter KEEPS rows with `ts >= watermark` (only strictly-older rows are
  * dropped before the state function), so an equal-timestamp frame peer
  * can still legally arrive while `ts == watermark` — the seal is
  * therefore STRICT: an event emits only once `ts < watermark`. A
  * corollary: an event whose timestamp exactly equals the FINAL watermark
  * never emits (it is unsealed by construction); callers wanting every
  * event emitted should advance the watermark past max(ts), e.g. the
  * q149 pattern of a sub-tick watermark offset. Every emitted row
  * therefore carries exactly the values the batch operator computes on
  * the full data — the streamed result IS the batch result restricted to
  * the rows the final watermark seals (the q135 sessionization
  * discipline), which is what the oracle replays.
  *
  * State per key: the events not yet sealed, plus sealed events still
  * inside some future frame's lookback (`ts > watermark - window`) —
  * bounded by the events a key produces in one watermark-delay + window
  * horizon, the same bound the built-in windowed aggregates carry.
  * Event-time timeout seals events whose key goes quiet and expires
  * lookback context, so state drains to empty on an idle key.
  *
  * The sum mirrors the batch operator's order-independent decimal
  * contract: each value is quantized exactly as Spark's
  * `cast(value as decimal(27,12))` (shortest-repr BigDecimal, HALF_UP)
  * and summed as BigDecimal in timestamp order — bit-stable across
  * batch boundaries and replayable in oracle SQL. */
object StreamingRollingAgg {

  case class Event(key: String, event_id: Long, ts: Timestamp, value: Double)
  case class Buffered(tsMs: Long, eventId: Long, value: Double,
                      emitted: Boolean)
  case class Rolled(key: String, event_id: Long, ts: Timestamp,
                    roll_n: Long, roll_sum: Double)

  /** Spark's double->decimal(27,12) cast: BigDecimal.valueOf (the
    * shortest decimal representation) rescaled HALF_UP. */
  private def quant(v: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(v)
      .setScale(12, java.math.RoundingMode.HALF_UP)

  private def update(key: String, events: Iterator[Event],
                     state: GroupState[Seq[Buffered]],
                     windowMs: Long): Iterator[Rolled] = {
    val wm = state.getCurrentWatermarkMs()
    val existing = state.getOption.getOrElse(Seq.empty)
    val all = existing ++ events.map(e =>
      Buffered(e.ts.getTime, e.event_id, e.value, emitted = false))
    val toEmit = all.filter(b => !b.emitted && b.tsMs < wm)
    val out = toEmit.map { e =>
      // frame peers: everything in [ts - window, ts]; unsealed events all
      // sit at-or-beyond the watermark (>= wm > e.tsMs) so they never
      // leak in
      val frame = all.filter(b =>
        b.tsMs >= e.tsMs - windowMs && b.tsMs <= e.tsMs)
      val sum = frame.sortBy(b => (b.tsMs, b.eventId))
        .foldLeft(java.math.BigDecimal.ZERO)((acc, b) =>
          acc.add(quant(b.value)))
      Rolled(key, e.eventId, new Timestamp(e.tsMs),
        frame.size.toLong, sum.doubleValue())
    }
    // retain: unsealed events (ts >= wm) and sealed lookback context
    // still reachable from a future frame (admissible future events have
    // ts >= wm, so their frame floor is >= wm - window)
    val keep = all.map(b =>
        if (!b.emitted && b.tsMs < wm) b.copy(emitted = true) else b)
      .filter(b => !b.emitted || b.tsMs >= wm - windowMs)
    if (keep.isEmpty) state.remove()
    else {
      state.update(keep)
      // earliest future transition: an unsealed event's seal (wm passes
      // tsMs — event-time timeout fires at wm > timeoutTs, exactly the
      // strict seal) or a context row's expiry (wm passes tsMs + window)
      val next = keep.map(b =>
        if (!b.emitted) b.tsMs else b.tsMs + windowMs).min
      state.setTimeoutTimestamp(math.max(next, wm + 1L))
    }
    out.iterator
  }

  /** Rolling-aggregate a stream with columns (key: string, event_id:
    * long, ts: timestamp, value: double). `watermark` bounds lateness;
    * only watermark-sealed events emit (exact by construction). */
  def rolling(events: DataFrame, windowSeconds: Long,
              watermark: String): Dataset[Rolled] = {
    require(windowSeconds >= 1, s"windowSeconds must be >= 1: $windowSeconds")
    val spark = events.sparkSession
    import spark.implicits._
    val windowMs = windowSeconds * 1000L
    events.select(col("key"), col("event_id"), col("ts"), col("value"))
      .withWatermark("ts", watermark)
      .as[Event]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (k: String, it: Iterator[Event], st: GroupState[Seq[Buffered]]) =>
          update(k, it, st, windowMs))
  }
}
