package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Alert dedup/threshold aggregation — the reference's A1 operator
  * (lib/rust/lake_writer/src/matano_alerts.rs:92-360).
  *
  * Semantics: rule matches group by (rule_name, dedupe); a match joins the
  * group's current alert iff its time is within `windowSeconds` of the
  * alert's `first_matched_at`, else it starts a new alert. An alert
  * activates when its match count reaches `threshold`; `created_at` is the
  * time of the match that crossed it (retroactively covering earlier
  * matches — the reference's retro-activation flips rows already written).
  *
  * The anchored-window grouping is inherently sequential per key (each
  * boundary depends on the previous anchor), so it cannot be a plain window
  * function; it is a per-key fold behind a hash shuffle on
  * (rule_name, dedupe) — the same distribution the reference's hash
  * aggregation uses. Per-key data is bounded by rule match rate × window,
  * so groups stay small at any corpus scale; the shuffle moves only match
  * keys and timestamps, not event payloads.
  *
  * Alert ids are deterministic (md5 of key + anchor) rather than random
  * UUIDs: idempotent re-runs produce identical ids, which is what makes
  * exactly-once sink commits retryable.
  */
object Alerts {

  final case class AlertConfig(threshold: Int = 1, windowSeconds: Long = 3600)

  final case class MatchRow(rule_name: String, dedupe: String, match_id: Long, ts: Timestamp)

  final case class AlertRow(
      rule_name: String, dedupe: String, alert_id: String,
      first_matched_at: Timestamp, last_matched_at: Timestamp,
      match_count: Long, activated: Boolean, created_at: Option[Timestamp])

  /** java.sql.Timestamp ↔ epoch microseconds (exact — Timestamp carries
    * sub-ms in its nanos field; window arithmetic runs in µs so batch and
    * streaming agree to the timestamp's full precision).
    */
  def tsToUs(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
  def usToTs(us: Long): Timestamp = {
    val t = new Timestamp((us / 1000000L) * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Fold sorted matches of one (rule, dedupe) key into alerts. */
  def foldKey(rule: String, dedupe: String, sorted: Seq[MatchRow],
      cfg: AlertConfig): Seq[AlertRow] = {
    val windowUs = cfg.windowSeconds * 1000000L
    val out = scala.collection.mutable.ArrayBuffer.empty[AlertRow]
    var firstUs = Long.MinValue
    var lastUs = 0L
    var n = 0L
    var created: Option[Long] = None
    def close(): Unit = if (firstUs != Long.MinValue) {
      out += AlertRow(rule, dedupe, alertId(rule, dedupe, usToTs(firstUs)),
        usToTs(firstUs), usToTs(lastUs), n, n >= cfg.threshold, created.map(usToTs))
    }
    for (m <- sorted) {
      val us = tsToUs(m.ts)
      if (firstUs == Long.MinValue || us >= firstUs + windowUs) {
        close(); firstUs = us; lastUs = us; n = 1
        created = if (n >= cfg.threshold) Some(us) else None
      } else {
        n += 1; lastUs = math.max(lastUs, us)
        if (created.isEmpty && n >= cfg.threshold) created = Some(us)
      }
    }
    close()
    out.toSeq
  }

  def alertId(rule: String, dedupe: String, first: Timestamp): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$rule|$dedupe|${first.getTime}".getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  /** Batch aggregation: matches (rule_name, dedupe, match_id, ts) → alerts.
    * One shuffle on (rule_name, dedupe); per-key sequential fold.
    */
  def aggregate(spark: SparkSession, matches: DataFrame, cfg: AlertConfig): Dataset[AlertRow] = {
    import spark.implicits._
    matches.select(col("rule_name"), col("dedupe"), col("match_id"), col("ts"))
      .as[MatchRow]
      .groupByKey(m => (m.rule_name, m.dedupe))
      .flatMapGroups { (key: (String, String), it: Iterator[MatchRow]) =>
        foldKey(key._1, key._2, it.toSeq.sortBy(m => tsToUs(m.ts)), cfg).iterator
      }
  }

  /** Retro-activation (reference matano_alerts.rs:309-444): when a late
    * match pushes an alert over its threshold, rows already committed for
    * that alert must flip `activated`/`created_at`. With an Iceberg catalog
    * this is `MERGE INTO ... WHEN MATCHED UPDATE`; here it rewrites only
    * the hour partitions containing touched alert ids — read back the
    * affected partitions, overwrite the flagged columns from the fresh
    * aggregate, dynamic-partition-overwrite them. Partitions not touched
    * by any updated alert are never rewritten.
    */
  def applyRetroActivation(spark: SparkSession, lakePath: String,
      updated: DataFrame): Unit = {
    import graft.lake.Lake
    val fresh = updated.select(
      col("alert_id").as("__id"), col("activated").as("__activated"),
      col("created_at").as("__created_at"), col("match_count").as("__match_count"))
    val lake = Lake.read(spark, lakePath)
    val touchedHours = lake.join(broadcast(fresh), col("alert_id") === col("__id"))
      .select(col(Lake.PartitionCol)).distinct()
    val affected = lake.join(broadcast(touchedHours), Seq(Lake.PartitionCol))
    val rewritten = affected.join(broadcast(fresh),
        col("alert_id") === col("__id"), "left")
      .withColumn("activated", coalesce(col("__activated"), col("activated")))
      .withColumn("created_at", coalesce(col("__created_at"), col("created_at")))
      .withColumn("match_count", coalesce(col("__match_count"), col("match_count")))
      .drop("__id", "__activated", "__created_at", "__match_count", Lake.PartitionCol)
    Lake.overwritePartitions(rewritten, lakePath)
  }
}
