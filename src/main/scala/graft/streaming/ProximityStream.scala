package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.config.SigmaRules.nearProximityMatches]] —
  * true sliding-proximity near() evaluated continuously: a base event at
  * time t fires iff every positive selection matched within ±`timeframe`
  * of t (same group) and no negative selection did. The window around a
  * base extends into the FUTURE, so a verdict needs t + timeframe of
  * event time to pass: bases park in state and emit when the watermark
  * crosses their horizon — the [[SigmaStream]] emit-once-on-close
  * discipline applied per EVENT instead of per tumbling window.
  *
  * State per group is BOUNDED by data rate, not stream length: a tag
  * buffer of (event-time, mask) pairs pruned on every fold to the oldest
  * window any FUTURE OR STILL-PENDING base can reach —
  * `ts ≥ min(watermark − delay, oldest pending base ts) − timeframe`.
  * A late future base arrives with t ≥ watermark − delay and reaches
  * back to t − timeframe; a base already pending can be as old as
  * watermark − timeframe, so its evidence window reaches back to
  * watermark − 2·timeframe and must be protected until its verdict
  * (pruning at watermark − timeframe − delay alone would drop evidence
  * — or a veto — for a pending base whenever a fold lands inside its
  * open horizon). The buffer is therefore bounded by
  * rate × (2·timeframe + delay); pending bases each live exactly
  * `timeframe` past their own event time. A group with nothing pending
  * and an empty pruned buffer removes its state entirely.
  *
  * Timestamp semantics: proximity here is exact event-time MICROSECONDS
  * (|Δt| ≤ timeframe), while the batch form compares floored SECONDS
  * (the SQL-oracle convention) — identical verdicts whenever events
  * carry whole-second timestamps (the parity gate's fixture class);
  * sub-second events near the exact boundary can differ by design.
  * Late events past the watermark delay are dropped (watermark
  * semantics; the batch path is the replay/backfill authority).
  */
object ProximityStream {

  /** One tagged event: group values (stringified, group-by order), the
    * event id (emitted for bases), tag mask (bit 0 = base, bits 1..p =
    * positive selections, bits above = negatives), event time.
    */
  final case class PxEvent(group: Seq[String], id: Long, mask: Long,
      ts: Timestamp)

  /** Per-group state: the pruned (micros, mask) tag buffer and the
    * pending (micros, id) base events awaiting their +timeframe horizon.
    */
  final case class PxState(buf: Seq[(Long, Long)], pending: Seq[(Long, Long)])

  final case class PxMatch(group: Seq[String], id: Long, ts: Timestamp)

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Verdict for a base at `t` against the buffer: every positive bit
    * seen within ±tf, no negative bit within ±tf. An event matching both
    * the base and a positive self-correlates at distance 0 — the batch
    * form's convention.
    */
  private[streaming] def verdict(buf: Seq[(Long, Long)], t: Long, tf: Long,
      nPos: Int, nNeg: Int): Boolean = {
    var posSeen = 0L
    var negSeen = false
    buf.foreach { case (ts, mask) =>
      if (math.abs(ts - t) <= tf) {
        posSeen |= (mask >>> 1) & ((1L << nPos) - 1)
        if (nNeg > 0 && ((mask >>> (1 + nPos)) & ((1L << nNeg) - 1)) != 0L)
          negSeen = true
      }
    }
    posSeen == (1L << nPos) - 1 && !negSeen
  }

  /** Evaluate sliding-proximity near() continuously. Emits one row per
    * passing base event — (<group cols as strings>, id, ts) — when the
    * watermark passes the base's +timeframe horizon. `delay` is the
    * watermark delay on `tsCol`.
    */
  def nearProximityStream(events: DataFrame, base: Column,
      positives: Seq[Column], negatives: Seq[Column],
      timeframeSeconds: Long, groupBy: Seq[String], idCol: String,
      tsCol: String = "ts", delay: String = "0 seconds"): DataFrame = {
    require(1 + positives.size + negatives.size <= 64,
      "tag mask holds at most 64 predicates")
    val spark = events.sparkSession
    import spark.implicits._
    val preds = base +: (positives ++ negatives)
    val mask: Column = preds.zipWithIndex
      .map { case (p, i) => when(p, lit(1L << i)).otherwise(lit(0L)) }
      .reduce(_.bitwiseOR(_))
    val ts = col(tsCol)
    val tagged = events
      .withWatermark(tsCol, delay)
      .withColumn("__mask", mask)
      // the vacuous isNull disjunct keeps this filter ABOVE the
      // watermark node (the SigmaStream trick): any event advances the
      // clock, so horizons close even when matches stop
      .filter(col("__mask") =!= 0L || col(tsCol).isNull)
      .select(
        array(groupBy.map(c => col(c).cast("string")): _*).as("group"),
        col(idCol).cast("long").as("id"),
        col("__mask").as("mask"),
        ts.as("ts"))
      .as[PxEvent]
    val tfUs = timeframeSeconds * 1000000L
    val delayUs = {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(
          org.apache.spark.unsafe.types.UTF8String.fromString(delay))
      // watermark delays are day/time-scale; months are not meaningful
      iv.days * 86400000000L + iv.microseconds
    }
    val nPos = positives.size
    val nNeg = negatives.size
    val matches = tagged
      .groupByKey(_.group)
      .flatMapGroupsWithState[PxState, PxMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (group, it, state) =>
          val st0 = state.getOption.getOrElse(PxState(Nil, Nil))
          val incoming = if (state.hasTimedOut) Seq.empty else it.toSeq
          val buf0 = st0.buf ++ incoming.map(e => (micros(e.ts), e.mask))
          val pending0 = st0.pending ++ incoming
            .filter(e => (e.mask & 1L) != 0L)
            .map(e => (micros(e.ts), e.id))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // a base's window closes when the watermark passes t + tf
          val (due, pending) = pending0.partition(_._1 + tfUs < wmUs)
          val out = due.sortBy(p => (p._1, p._2)).collect {
            case (t, id) if verdict(buf0, t, tfUs, nPos, nNeg) =>
              PxMatch(group, id, new Timestamp(t / 1000L))
          }
          // prune to the oldest window still reachable: a future base
          // arrives with t ≥ wm − delay; a still-pending base can be as
          // old as wm − tf and its window (incl. vetoes) reaches t − tf
          val protectUs =
            if (pending.nonEmpty) math.min(wmUs - delayUs, pending.map(_._1).min)
            else wmUs - delayUs
          val floor = protectUs - tfUs
          val buf = buf0.filter(_._1 >= floor)
          if (pending.isEmpty && buf.isEmpty) state.remove()
          else {
            state.update(PxState(buf, pending))
            // wake at the earliest pending horizon, or (buffer only) at
            // the point the whole buffer becomes prunable
            val nextUs =
              if (pending.nonEmpty) pending.map(_._1).min + tfUs
              else buf.map(_._1).max + tfUs + delayUs
            state.setTimeoutTimestamp(nextUs / 1000L + 1L)
          }
          out.iterator
      }
    val groupCols = groupBy.zipWithIndex.map { case (c, i) =>
      element_at(col("group"), i + 1).as(c)
    }
    matches.toDF().select(groupCols :+ col("id") :+ col("ts"): _*)
  }
}
