package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Ordered multi-step conversion funnel over an event stream — the standard product
  * analytics question "how many users did A, then B, then C within a window?"
  * (The reference stops at per-day aggregates over its events; this generalizes the
  * same table to sequence analytics.)
  *
  * Semantics (min-recursion, the cross-engine-checkable definition): per user,
  * `t1 = min ts of step-1 events`; `t_k = min ts of step-k events with
  * ts > t_{k-1} and ts <= t1 + window`. A user's `steps_completed` is the longest
  * prefix with all `t_k` defined. This equals a greedy single scan over the user's
  * ts-sorted events, which is how it executes here.
  *
  * Scale shape: ONE shuffle — filter to the step event types (predicate pushes to the
  * scan), hash-shuffle on user, `collect_list` + `array_sort` + an `aggregate` HOF
  * walk per user. State per user is the (ts, type) pairs of step-typed events only,
  * and the walk is linear. No window function (no global sort), no self-joins
  * (a k-step funnel as chained joins would be k shuffles of the full event table).
  * Timestamps flow as epoch micros so the chain arithmetic stays integer-exact.
  */
object Funnel {

  /** Per-user funnel walk. Output: `user_id`, `steps_completed`, and one nullable
    * `t<k>_us` (epoch micros) per step — the population is every user with at least
    * one event of a step type.
    */
  def userFunnel(events: DataFrame, steps: Seq[String], windowMicros: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.size == steps.size,
      "repeated step types would make t_k > t_{k-1} chains ambiguous to audit")
    require(windowMicros > 0, "windowMicros must be positive")
    val n = steps.size
    val stepsLit = array(steps.map(lit): _*)

    val walked = events
      .filter(col(typeCol).isInCollection(steps))
      .select(col(userCol).as("user_id"),
        struct(unix_micros(col(tsCol)).as("ts"), col(typeCol).as("et")).as("e"))
      .groupBy("user_id")
      .agg(array_sort(collect_list("e")).as("evs"))
      .select(col("user_id"), aggregate(
        col("evs"),
        array().cast("array<long>"),
        (acc, e) => {
          val ts = e.getField("ts")
          val nextStep = element_at(stepsLit, (size(acc) + 1).cast("int"))
          // get() is 0-based and null-safe (vs ANSI element_at, which throws on an
          // empty accumulator); the size guard makes the null comparisons unreachable
          val chainOk = size(acc) === 0 ||
            (ts > get(acc, size(acc) - 1) && ts <= get(acc, lit(0)) + windowMicros)
          when(size(acc) < n && e.getField("et") === nextStep && chainOk,
            concat(acc, array(ts))).otherwise(acc)
        }).as("ts_arr"))

    val stepCols = steps.indices.map(i => get(col("ts_arr"), lit(i)).as(s"t${i + 1}_us"))
    walked.select(col("user_id") +: size(col("ts_arr")).as("steps_completed") +: stepCols: _*)
  }

  final case class FunnelEvent(user_id: Long, ts_us: Long, event_type: String)

  /** A user's live funnel position: `step_ts(k)` is the epoch-micros instant step
    * k+1 chained; `steps_completed = step_ts.size`.
    */
  final case class FunnelProgress(user_id: Long, steps_completed: Int,
      step_ts: Seq[Long])

  /** Live per-user funnel progress over a stream (`mapGroupsWithState`, Update
    * mode): each micro-batch advances the same greedy walk [[userFunnel]] runs in
    * batch, emitting the user's current position.
    *
    * State is O(steps) per user — just the claimed step timestamps, NOT the event
    * history. The walk sorts within each micro-batch, so intra-batch disorder is
    * fine; a CROSS-batch straggler older than an already-claimed step cannot
    * retro-chain (state only advances — the inherent streaming-funnel tradeoff;
    * run the batch operator over landed data for the authoritative backfill).
    */
  def streaming(events: Dataset[FunnelEvent], steps: Seq[String],
      windowMicros: Long)(implicit spark: SparkSession): Dataset[FunnelProgress] = {
    import spark.implicits._
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "steps: nonempty, distinct")
    require(windowMicros > 0, "windowMicros must be positive")
    val n = steps.size
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[FunnelEvent], state: GroupState[FunnelProgress]) =>
          var acc = state.getOption.map(_.step_ts.toVector).getOrElse(Vector.empty)
          batch.toSeq.sortBy(e => (e.ts_us, e.event_type)).foreach { e =>
            val k = acc.size
            if (k < n && e.event_type == steps(k) &&
                (k == 0 || (e.ts_us > acc.last && e.ts_us <= acc.head + windowMicros)))
              acc = acc :+ e.ts_us
          }
          val p = FunnelProgress(uid, acc.size, acc)
          state.update(p)
          p
      }
  }

  /** Funnel summary: one row per step with the users reaching it and the conversion
    * rate vs step 1. The per-user frame reduces to n-steps counts in ONE aggregation
    * (each user contributes to every step row via a small explode); the final
    * whole-frame window runs over exactly n-steps rows, so its single-partition sort
    * is constant-cost.
    */
  def summary(events: DataFrame, steps: Seq[String], windowMicros: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    val perUser = userFunnel(events, steps, windowMicros, userCol, tsCol, typeCol)
    val stepsLit = array(steps.map(lit): _*)
    val entered = max(when(col("step_index") === 1, col("n_users")))
      .over(org.apache.spark.sql.expressions.Window.partitionBy())
    perUser
      .select(explode(sequence(lit(1), lit(steps.size))).as("step_index"),
        col("steps_completed"))
      .groupBy("step_index")
      .agg(count(when(col("steps_completed") >= col("step_index"), 1)).as("n_users"))
      .select(
        col("step_index"),
        element_at(stepsLit, col("step_index")).as("step"),
        col("n_users"),
        round(col("n_users").cast("double") / greatest(entered, lit(1L)), 6)
          .as("conversion_from_first"))
  }
}
