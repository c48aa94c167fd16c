package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-step funnel — the incremental twin of
  * [[graft.operators.Analytics.funnel]] (greedy-earliest steps, step i+1
  * within `withinMs` of t_i), exact under late data up to the watermark.
  *
  * Why the state is (chain + candidate buffer) and why that is EXACT:
  * the greedy chain's timestamps only ever move EARLIER, and any arrival
  * is >= the watermark (Spark drops older rows before they reach the
  * state function). So a buffered candidate with ts < watermark can never
  * newly qualify — a qualifying window's lower bound is some future t_j,
  * and every future t_j is >= the watermark — which means pruning the
  * buffer at the watermark loses nothing, and per-key state is bounded by
  * the events inside the watermark delay, never the full history.
  *
  * A key's funnel is SEALED (emitted, state dropped) when the watermark
  * passes t_last + withinMs for its last achieved step: any later arrival
  * lands beyond every open window and cannot change the chain, so each
  * key emits exactly one final row: (key, step_ts array, steps_completed,
  * completion timestamps as far as reached). Keys that never perform step
  * 1 emit nothing (their stray later-step candidates age out). */
object StreamingFunnel {

  case class FEvent(key: String, step: Int, ts: Timestamp)
  case class Cand(step: Int, ts: Long)
  case class FState(chain: Seq[Long], cands: Seq[Cand])
  case class FunnelResult(key: String, steps_completed: Long,
                          step_ts: Seq[Timestamp])

  private def recompute(nSteps: Int, withinMs: Long,
                        prevChain: Seq[Long],
                        cands: Seq[Cand]): Seq[Long] = {
    val byStep = cands.groupBy(_.step)
    var chain = Vector.empty[Long]
    var j = 0
    var stop = false
    while (j < nSteps && !stop) {
      val pool = byStep.getOrElse(j, Nil).map(_.ts) ++ prevChain.lift(j)
      val qualified =
        if (j == 0) pool
        else pool.filter(t => t >= chain(j - 1) && t <= chain(j - 1) + withinMs)
      if (qualified.isEmpty) stop = true
      else { chain :+= qualified.min; j += 1 }
    }
    chain
  }

  private def update(nSteps: Int, withinMs: Long)(
      key: String, events: Iterator[FEvent],
      state: GroupState[FState]): Iterator[FunnelResult] = {
    val wm = state.getCurrentWatermarkMs()
    val prev = state.getOption.getOrElse(FState(Nil, Nil))
    val all = prev.cands ++ events.map(e => Cand(e.step, e.ts.getTime))
    val chain = recompute(nSteps, withinMs, prev.chain, all)
    if (chain.nonEmpty && wm > chain.last + withinMs) {
      // sealed: no admissible arrival can extend or lower the chain
      state.remove()
      Iterator.single(FunnelResult(key, chain.length.toLong,
        chain.map(new Timestamp(_))))
    } else {
      // candidates below the watermark can never qualify again (windows
      // open at future chain values, all >= wm)
      val kept = all.filter(_.ts >= wm)
      if (chain.isEmpty && kept.isEmpty) state.remove()
      else {
        state.update(FState(chain, kept))
        val next =
          if (chain.nonEmpty) chain.last + withinMs + 1
          else kept.map(_.ts).min + 1 // stray later-step cands age out
        state.setTimeoutTimestamp(math.max(next, wm + 1))
      }
      Iterator.empty
    }
  }

  /** Run the funnel over a stream with columns (key string, ts timestamp,
    * event_type string). `watermark` bounds admissible lateness AND seals
    * results; steps are matched by `event_type` equality. */
  def funnel(events: DataFrame, steps: Seq[String], withinMs: Long,
             watermark: String = "1 hour"): Dataset[FunnelResult] = {
    require(steps.size >= 2, s"need at least 2 steps: $steps")
    require(steps.distinct.size == steps.size, s"steps repeat: $steps")
    require(withinMs >= 1, s"withinMs must be >= 1: $withinMs")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val idx = stepIdx.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(col("event_type") === s, i).otherwise(acc)
    }
    events.withWatermark("ts", watermark)
      .select(col("key"), idx.as("step"), col("ts"))
      .filter(col("step") >= 0)
      .as[FEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update(steps.size, withinMs))
  }
}
