package graft.streaming

import java.sql.Timestamp

import graft.config.SigmaRules.{CorrelationSpec, SigmaRule}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming Sigma correlations — the continuous-detection twin of
  * [[graft.config.SigmaRules.correlationMatches]] (the reference runs its
  * correlation sweep on the continuous detection path,
  * `detection/common.py:137-191`; here the same semantics fold per
  * micro-batch instead of re-scanning history).
  *
  * Semantics are IDENTICAL to the batch form — tumbling `timeframe`
  * windows keyed by the correlation's group-by — so a replay of the same
  * events through this stream emits exactly the batch result
  * (StreamingSpec gates parity on ts-ordered batches, the q137/q96
  * batch-cut-independence pattern). A window's verdict needs its FINAL
  * tallies (a `lt`/`eq` condition can be true mid-window and false at
  * close, and `n` must be the closed-window value), so emission rides the
  * event-time clock: state holds the window's running tallies, and the
  * window emits ONCE when the watermark passes its end.
  *
  * State per (group, window) is bounded: one long for event_count, a
  * ≤64-bit tag mask for temporal, a fixed stage-time array for
  * temporal_ordered (the [[Funnel]] contract), and for value_count a
  * distinct-HASH set HARD-CAPPED at `valueCap` entries — past the cap the
  * set degrades to HLL registers (the in-repo sketch family; p=12 → 4 KB,
  * exact in the linear-counting small range where SIEM thresholds live)
  * and the window's emitted row carries `estimated = true`, loudly: a
  * `gt`/`gte` threshold this large is near-certainly still right, but an
  * `lt`/`lte`/`eq` verdict read off an estimate is the consumer's call to
  * trust. Under the cap (the universal case — thresholds sit at tens)
  * value_count stays EXACT and `estimated = false`; distinct-ness is
  * tracked over 64-bit xxhash64 values rather than the strings themselves
  * (collision odds 2⁻⁶⁴, the [[graft.operators.Hll]] null-sentinel
  * argument, and the same hash the batch sketch family uses — a degraded
  * stream estimate equals the batch [[graft.operators.Hll.approxDistinct]]
  * of the same values bit for bit).
  *
  * Cross-batch disorder follows the same contract as [[Funnel]]: with
  * ts-ordered batch cuts the fold is EXACT (tallies are order-free; the
  * ordered chain is prefix-stable — a locked earlier stage is the global
  * earliest because later batches carry later timestamps). Arbitrarily
  * late events follow watermark semantics: a row older than the watermark
  * is dropped, and the batch path is the replay/backfill authority.
  *
  * Group-key values render as strings in the emitted rows (the state
  * encoder carries them; callers needing native types join back on the
  * batch side — the parity gate casts the batch result).
  *
  * STATE-SCHEMA VERSION NOTE: the value_count cap (round 16) was a
  * BREAKING change to both the state encoder ([[CorrState]] gained
  * `regs`; [[CorrEvent]] carries `vhash` in place of the raw value) and
  * the output frame (`estimated` column added). A correlationStream
  * checkpoint written before that change cannot restore against the new
  * encoder — discard such checkpoints and replay from the lake (the
  * batch path is the replay authority, so no data is lost). Future
  * state-shape changes follow the same contract: checkpoint continuity
  * is NOT guaranteed across versions of this object; version the state
  * case classes if a deployment ever needs in-place upgrade.
  */
object SigmaStream {

  /** One matched event after rule tagging: group values (stringified, in
    * group-by order), tumbling window start (epoch seconds), the bitmask
    * of referenced rules it matched, the xxhash64 of the value_count
    * field ([[graft.operators.Hll.NullSentinel]] for null/absent — never
    * counted), event-time micros.
    */
  final case class CorrEvent(group: Seq[String], win: Long, mask: Long,
      vhash: Long, ts: Timestamp)

  /** Running tallies of one (group, window). `times` is the
    * temporal_ordered stage chain ([[Funnel]]'s Unset convention);
    * `values` holds value_count's distinct hashes EXACTLY until the cap,
    * after which `regs` (HLL registers) replaces it — `regs != null` IS
    * the degraded marker.
    */
  final case class CorrState(count: Long, values: Set[Long], tags: Long,
      times: Seq[Long], regs: Array[Byte])

  final case class CorrMatch(rule_name: String, group: Seq[String],
      window_start: Timestamp, n: Long, estimated: Boolean)

  /** The serializable slice of a [[CorrelationSpec]] the state function
    * needs — the full spec carries Catalyst `Column`s (near()'s
    * pre-resolved predicates), which must not enter the task closure.
    */
  private[graft] final case class CorrEval(corrType: String,
      op: String, n: Long, valueCap: Int = 4096, hllP: Int = 12)

  private val Unset: Long = Long.MinValue

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  private def cmp(v: Long, op: String, n: Long): Boolean = op match {
    case "gt" => v > n
    case "gte" => v >= n
    case "lt" => v < n
    case "lte" => v <= n
    case "eq" => v == n
    case other => sys.error(s"unsupported correlation op '$other'")
  }

  /** Fold one micro-batch's events into the window state. Order-free for
    * the counting/temporal forms; the ordered chain folds in event-time
    * order (within-batch disorder is free, the cross-batch contract is
    * ts-ordered cuts — see the object doc).
    */
  private[graft] def fold(corr: CorrEval, nRules: Int,
      st: CorrState, events: Seq[CorrEvent]): CorrState = corr.corrType match {
    case "event_count" => st.copy(count = st.count + events.size)
    case "value_count" =>
      import graft.operators.Hll
      // countDistinct skips NULLs in the batch form — mirror that (the
      // sentinel marks a null value; RegistersAgg.reduce also skips it)
      val hs = events.iterator.map(_.vhash)
        .filter(_ != Hll.NullSentinel).toSeq
      if (st.regs != null) {
        // already degraded: fold straight into the registers (clone —
        // the state object must not be mutated in place)
        val agg = Hll.RegistersAgg(corr.hllP)
        val regs = st.regs.clone()
        hs.foreach(agg.reduce(regs, _))
        st.copy(regs = regs)
      } else {
        val vals = st.values ++ hs
        if (vals.size > corr.valueCap) {
          // cap crossed: exact hash set → HLL registers, once, forever —
          // state drops from O(distinct) to 2^p bytes and the window's
          // eventual row says estimated = true
          val agg = Hll.RegistersAgg(corr.hllP)
          val regs = agg.zero
          vals.foreach(agg.reduce(regs, _))
          st.copy(values = Set.empty, regs = regs)
        } else st.copy(values = vals)
      }
    case "temporal" =>
      st.copy(tags = events.foldLeft(st.tags)(_ | _.mask))
    case "temporal_ordered" =>
      val times = st.times.toArray
      events.sortBy(e => micros(e.ts)).foreach { e =>
        val us = micros(e.ts)
        var i = 0
        while (i < nRules) {
          if ((e.mask & (1L << i)) != 0 && times(i) == Unset &&
              (i == 0 || (times(i - 1) != Unset && us > times(i - 1))))
            times(i) = us
          i += 1
        }
      }
      st.copy(times = times.toSeq)
    case other => sys.error(s"unsupported correlation type '$other'")
  }

  /** The closed-window verdict: Some(n) when the condition holds. */
  private[graft] def verdict(corr: CorrEval, nRules: Int,
      st: CorrState): Option[Long] = corr.corrType match {
    case "event_count" => Some(st.count).filter(cmp(_, corr.op, corr.n))
    case "value_count" =>
      val n =
        if (st.regs != null)
          math.rint(graft.operators.Hll.estimateScala(st.regs, corr.hllP)).toLong
        else st.values.size.toLong
      Some(n).filter(cmp(_, corr.op, corr.n))
    case "temporal" =>
      // tags past nRules are near()'s negated selections: the window
      // passes only with every positive tag and zero negative ones
      val posMask = if (nRules == 64) -1L else (1L << nRules) - 1L
      Some(java.lang.Long.bitCount(st.tags & posMask).toLong)
        .filter(_ == nRules.toLong && (st.tags & ~posMask) == 0L)
    case "temporal_ordered" =>
      Some(nRules.toLong).filter(_ => st.times.forall(_ != Unset))
    case other => sys.error(s"unsupported correlation type '$other'")
  }

  /** Evaluate a correlation continuously over a streaming event frame.
    * Emits one row per (group, window) whose FINAL tallies satisfy the
    * correlation condition, when the watermark passes the window end —
    * columns (rule_name, <group cols as strings>, window_start, n),
    * matching the batch [[SigmaRules.correlationMatches]] layout.
    *
    * `delay` is the watermark delay on `tsCol` (how much cross-batch
    * disorder to absorb before closing windows). `valueCap`/`hllP` bound
    * value_count state (see the object doc); the emitted `estimated`
    * column is true only for windows whose distinct set crossed the cap.
    */
  def correlationStream(events: DataFrame, rules: Seq[SigmaRule],
      corr: CorrelationSpec, tsCol: String = "ts",
      delay: String = "0 seconds", valueCap: Int = 4096,
      hllP: Int = 12): DataFrame = {
    val posPreds: Seq[Column] =
      if (corr.resolved.nonEmpty) corr.resolved.map(_._2)
      else {
        val referenced = corr.ruleNames.flatMap(n => rules.find(_.title == n))
        require(referenced.size == corr.ruleNames.size,
          s"correlation '${corr.title}' references unloaded rules " +
            s"(wanted ${corr.ruleNames.mkString(", ")})")
        referenced.map(_.detect)
      }
    // near()'s negated selections take the tag bits past the positives
    val allPreds = posPreds ++ corr.negResolved.map(_._2)
    require(allPreds.size <= 64, "tag mask holds at most 64 rules")
    val nRules = posPreds.size
    val spark = events.sparkSession
    import spark.implicits._
    // the watermark rides the RAW stream, before the rule filter: any
    // event advances the clock, so windows close even when matches stop
    val mask: Column = allPreds.zipWithIndex
      .map { case (pred, i) => when(pred, lit(1L << i)).otherwise(lit(0L)) }
      .reduce(_.bitwiseOR(_))
    val ts = col(tsCol)
    val tagged = events
      .withWatermark(tsCol, delay)
      .withColumn("__mask", mask)
      // the isNull disjunct is vacuous (an event-time value is never
      // null) but it makes the predicate REFERENCE the watermark column,
      // which stops the optimizer pushing this filter below the
      // EventTimeWatermark node — pushed below, only rule-MATCHED events
      // would advance the clock and a stream whose matches stop would
      // never close its trailing windows
      .filter(col("__mask") =!= 0L || col(tsCol).isNull)
      .select(
        array(corr.groupBy.map(c => col(c).cast("string")): _*).as("group"),
        ((unix_seconds(ts) / corr.timeframeSeconds).cast("long") *
          corr.timeframeSeconds).as("win"),
        col("__mask").as("mask"),
        // 64-bit hash, codegen'd here — the state tracks hashes, never
        // strings; the sentinel marks null (the Hll family's convention)
        (corr.field.map(f => when(col(f).isNotNull, xxhash64(col(f)))
            .otherwise(lit(graft.operators.Hll.NullSentinel)))
          .getOrElse(lit(graft.operators.Hll.NullSentinel))).as("vhash"),
        // the RAW event-time column rides into the typed frame: the
        // streaming checker requires the watermarked attribute to be
        // present in the FlatMapGroupsWithState input for event-time
        // timeouts (a derived micros long would strip its metadata)
        ts.as("ts"))
      .as[CorrEvent]
    val title = corr.title
    val timeframe = corr.timeframeSeconds
    val eval = CorrEval(corr.corrType, corr.op, corr.n, valueCap, hllP)
    val matches = tagged
      .groupByKey(e => (e.group, e.win))
      .flatMapGroupsWithState[CorrState, CorrMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((group, win), it, state) =>
          if (state.hasTimedOut) {
            // window closed: final tallies → verdict → emit once
            val st = state.get
            val out = verdict(eval, nRules, st).map(n =>
              CorrMatch(title, group, new Timestamp(win * 1000L), n,
                estimated = st.regs != null))
            state.remove()
            out.iterator
          } else {
            val st0 = state.getOption.getOrElse(
              CorrState(0L, Set.empty, 0L, Seq.fill(nRules)(Unset), null))
            state.update(fold(eval, nRules, st0, it.toSeq))
            // fire when the event-time watermark passes the window END
            state.setTimeoutTimestamp((win + timeframe) * 1000L)
            Iterator.empty
          }
      }
    val groupCols = corr.groupBy.zipWithIndex.map { case (c, i) =>
      element_at(col("group"), i + 1).as(c)
    }
    matches.toDF().select(
      (col("rule_name") +: groupCols) :+ col("window_start") :+ col("n") :+
        col("estimated"): _*)
  }
}
