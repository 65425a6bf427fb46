package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization, in two idiomatic forms:
  *
  *  - [[batch]]: lag + running-sum window functions — one shuffle on user_id, fully
  *    codegen'd, the right shape for backfills over 100 TB of history.
  *  - [[SessionCounter]]: `mapGroupsWithState` for live streams — custom keyed state with
  *    processing-time timeout, the Structured Streaming stateful-operator surface the
  *    reference's hand-rolled consumer loop never reaches (SURVEY.md §2.9 T7).
  */
object Sessionize {

  /** Assign session sequence numbers per user: a new session starts when the gap from the
    * previous event exceeds `gapMinutes`. Deterministic via event_id tie-break.
    */
  def batch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val withGap = events
      .withColumn("__prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_us").isNull ||
          unix_micros(col("ts")) - col("__prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withGap
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }

  /** Session aggregation via Spark's native `session_window` — the engine merges
    * overlapping [ts, ts+gap) windows per key, in batch AND streaming (where a watermark
    * bounds the mergeable-session state, the scalable form for endless streams).
    *
    * Session membership matches [[batch]] exactly, including the boundary: an event at
    * precisely `gapMinutes` after the previous one MERGES (the engine merges windows
    * that touch, pinned in StreamingSpec). Only the reported end differs:
    * `session_end` here is last-event + gap (the merged window's end); [[batch]]
    * reports the last event's own timestamp.
    */
  def sessionWindows(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  final case class SessionEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionSnapshot(user_id: Long, n_events: Long, last_ts: Timestamp)

  /** Streaming per-user session state: counts events per user across micro-batches.
    * Demonstrates the keyed-state operator; used with `OutputMode.Update`.
    *
    * `timeoutMinutes = Some(n)` expires idle state with a processing-time timeout. Note:
    * with a timeout the engine schedules no-data micro-batches to fire expirations, so
    * drive such queries with a real trigger, not `processAllAvailable()` (which can then
    * block indefinitely) — default is no timeout.
    */
  object SessionCounter {
    def apply(events: Dataset[SessionEvent], timeoutMinutes: Option[Int] = None)(
        implicit spark: SparkSession): Dataset[SessionSnapshot] = {
      import spark.implicits._
      val timeoutConf =
        if (timeoutMinutes.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout
      events
        .groupByKey(_.user_id)
        .mapGroupsWithState(timeoutConf) {
          (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionSnapshot]) =>
            val evs = batch.toSeq
            val prior = state.getOption
            if (state.hasTimedOut) {
              // timeout invocations carry NO events — close the session and emit the
              // final snapshot rather than touching the empty iterator
              val closing = prior.getOrElse(
                SessionSnapshot(userId, 0L, new Timestamp(0L)))
              state.remove()
              closing
            } else {
              val base = prior.getOrElse(SessionSnapshot(userId, 0L, new Timestamp(0L)))
              val lastTs = (base.last_ts +: evs.map(_.ts)).maxBy(_.getTime)
              val snapshot = SessionSnapshot(userId, base.n_events + evs.size, lastTs)
              state.update(snapshot)
              timeoutMinutes.foreach(m => state.setTimeoutDuration(s"$m minutes"))
              snapshot
            }
        }
    }
  }

  private[graft] val outputMode: OutputMode = OutputMode.Update()
}
