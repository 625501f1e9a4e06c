package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event analytics
  * (graft.pipeline.Events). The reference has no streaming surface
  * (SURVEY §2.10) — these are part of the training-data-pipeline
  * extensions: the same logical operations, expressed so they run
  * incrementally with watermarks and keyed state.
  */
object EventsStreaming {
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(startSec: Long, lastSec: Long, n: Long)
  case class Session(user_id: Long, start_sec: Long, end_sec: Long, n_events: Long)

  /** Tumbling-window counts/sums per event type with late-data handling:
    * watermark bounds state, windows finalize `allowedLateness` behind the
    * max seen event time. */
  def hourlyStream(events: DataFrame, allowedLateness: String = "2 hours"): DataFrame =
    events.withWatermark("ts", allowedLateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))

  /** Frozen per-type hourly volume profile for streaming anomaly
    * scoring: (mean, sample stddev) of the reference window's hourly
    * counts per event type, collected to the driver (types-sized — a
    * bounded driver decision like the LM/BM25 stats). Types with no
    * variance are excluded, matching the batch op. */
  def anomalyStats(events: DataFrame): Map[String, (Double, Double)] =
    graft.pipeline.Events.hourly(events)
      .groupBy("event_type")
      .agg(avg(col("n")).as("mu"), stddev_samp(col("n")).as("sd"))
      .filter(col("sd") > 0)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap

  /** Score finalized [[hourlyStream]] windows against the frozen profile
    * — a stateless projection over the windowed aggregate, so the only
    * state is the watermarked window store hourlyStream already keeps.
    * Unknown or constant-volume types are dropped (no profile). Output:
    * (event_type, hour_start, n, z) append stream, z rounded to 4 like
    * the batch [[graft.pipeline.Events.anomaly]]. */
  def anomalyScoreStream(hourly: DataFrame, stats: Map[String, (Double, Double)]): DataFrame = {
    val muLit = typedLit(stats.view.mapValues(_._1).toMap)
    val sdLit = typedLit(stats.view.mapValues(_._2).toMap)
    hourly.filter(muLit(col("event_type")).isNotNull)
      .select(col("event_type"), col("hour_start"), col("n"),
        round((col("n") - muLit(col("event_type"))) / sdLit(col("event_type")), 4).as("z"))
  }

  case class FunnelState(stage: Int, anchorMs: Long)
  case class FunnelProgress(user_id: Long, stages_completed: Int)

  /** Streaming funnel progression as keyed state: each user's furthest
    * stage, advanced greedily as events arrive (stage i+1 only strictly
    * after the event that won stage i — the same sequential-earliest rule
    * as the batch [[graft.pipeline.Events.funnel]]). Emits the user's
    * current progress on every micro-batch that touches them (Update
    * output). State is two fields per user, bounded by the user
    * population, not the stream.
    *
    * Exactness: identical to the batch op when each user's events arrive
    * in event-time order (within a batch they are sorted). A LATE arrival
    * for an earlier stage cannot resurrect opportunities that already
    * streamed past, so cross-batch disorder can only under-count — the
    * nightly batch funnel is the exact reconciliation, the same contract
    * as the other streaming twins. */
  def funnelStream(spark: SparkSession, events: Dataset[Event],
                   stages: Seq[String]): Dataset[FunnelProgress] = {
    import spark.implicits._
    require(stages.nonEmpty, "funnel needs at least one stage")
    events.groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelProgress](GroupStateTimeout.NoTimeout()) {
        case (userId, evs, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          for (e <- evs.toSeq.sortBy(_.ts.getTime)) {
            if (st.stage < stages.length && e.event_type == stages(st.stage) &&
                (st.stage == 0 || e.ts.getTime > st.anchorMs))
              st = FunnelState(st.stage + 1, e.ts.getTime)
          }
          state.update(st)
          FunnelProgress(userId, st.stage)
      }
  }

  /** Gap sessionization as keyed state: a session closes when no event
    * arrives for `gapSec` (watermark-driven timeout) — the streaming
    * equivalent of the batch lag-window form. */
  def sessionizeStream(spark: SparkSession, events: Dataset[Event],
                       gapSec: Long = 1800): Dataset[Session] = {
    import spark.implicits._
    events.withWatermark("ts", s"$gapSec seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.startSec, s.lastSec, s.n))
          } else {
            val sorted = evs.map(e => e.ts.getTime / 1000).toSeq.sorted
            var closed = List.empty[Session]
            var st = state.getOption
            for (sec <- sorted) {
              st match {
                case Some(s) if sec - s.lastSec <= gapSec =>
                  // out-of-order (late but within-watermark) events can
                  // extend the session backwards as well as forwards
                  st = Some(s.copy(startSec = math.min(s.startSec, sec),
                    lastSec = math.max(s.lastSec, sec), n = s.n + 1))
                case Some(s) =>
                  closed ::= Session(userId, s.startSec, s.lastSec, s.n)
                  st = Some(SessionState(sec, sec, 1))
                case None =>
                  st = Some(SessionState(sec, sec, 1))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.lastSec + gapSec) * 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
