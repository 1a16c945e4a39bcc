package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel / ordered-sequence detection — the canonical
  * `flatMapGroupsWithState` CEP shape, mirroring the batch q122 semantics:
  * earliest-greedy stage chain per key (first stage-0 event, first stage-1
  * event strictly after it, ...), completion bounded by `windowUs` from
  * the first stage's timestamp.
  *
  * State per key is a FIXED array of stage timestamps (one long per
  * stage — bounded regardless of stream length); events inside a trigger
  * are processed in event-time order, so within-batch disorder is free.
  * Cross-batch disorder follows standard watermark semantics: an event
  * older than an already-locked earlier stage cannot retroactively
  * re-open it (same contract as any watermarked streaming agg — the batch
  * query q122 is the replay/backfill path when exact late-data handling
  * matters).
  */
object Funnel {

  final case class Event(user_id: Long, event_type: String, ts: Timestamp)

  /** `times(i)` = micros of the earliest qualifying stage-i event, or
    * [[Unset]] if the stage is not yet reached. (`Long.MinValue`, not -1:
    * pre-epoch timestamps are legal negative micros.)
    */
  final case class State(times: Seq[Long])

  private val Unset: Long = Long.MinValue

  final case class Snapshot(user_id: Long, stage: Long, completed: Boolean)

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Fold a batch of events (any order) into the stage-times state. */
  private[streaming] def fold(stages: Seq[String], times: Array[Long],
      events: Seq[Event]): Unit =
    events.sortBy(e => micros(e.ts)).foreach { e =>
      val i = stages.indexOf(e.event_type)
      if (i >= 0 && times(i) == Unset &&
          (i == 0 || (times(i - 1) != Unset && micros(e.ts) > times(i - 1))))
        times(i) = micros(e.ts)
    }

  /** Per-user funnel snapshots: one row per trigger per user whose state
    * advanced (upsert-by-user semantics at the sink). `stage` counts
    * reached stages; `completed` = final stage within `windowUs` of the
    * first.
    */
  def track(spark: SparkSession, events: Dataset[Event],
      stages: Seq[String], windowUs: Long): Dataset[Snapshot] = {
    import spark.implicits._
    require(stages.size >= 2, "funnel needs at least 2 stages")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[State, Snapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[State]) =>
          val times = state.getOption
            .map(_.times.toArray)
            .getOrElse(Array.fill(stages.size)(Unset))
          val before = times.toSeq
          fold(stages, times, it.toSeq)
          state.update(State(times.toSeq))
          val reached = times.count(_ != Unset)
          if (times.toSeq == before || reached == 0) Iterator.empty
          else Iterator.single(Snapshot(user, reached.toLong,
            times.last != Unset && times.last <= times.head + windowUs))
      }
  }
}
