package graft.streaming

import graft.lake.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental PACK-MANIFEST fold — [[graft.operators.Curation
  * .packManifest]]'s rule over a GROWING corpus (the q171/q176/q186
  * lake-fold family applied to the packing stage): each arriving batch
  * extends every language's pack stream WITHOUT rescanning history,
  * because under id-monotone arrival a document's pack is a pure
  * function of its language's RUNNING token total — pack_id =
  * ⌊exclusive-prefix / budget⌋ — and the only cross-batch state packing
  * needs is, per language:
  *
  *  - the prior total (where the next batch's prefix resumes),
  *  - the last pack's id and its global START offset (so a pack that
  *    STRADDLES the batch boundary continues its in-pack offsets
  *    correctly rather than restarting at zero).
  *
  * Registry row (pk = group#batchId): (group, batch_mass, max_doc,
  * last_pack_id, last_pack_start, ts) — keyed per batch because sums are
  * not idempotent (the q186 lesson): a replayed batch re-upserts the
  * same keyed rows, a no-op.
  *
  * Emissions are per-batch CONTRIBUTIONS keyed (group, pack_id, batch):
  * never merged in place — a straddled pack simply has one contribution
  * row per touching batch, and the final manifest aggregates
  * contributions (counts sum; boundary CSVs concatenate in batch order,
  * which is doc order under monotone arrival). Replays re-write the same
  * keyed contribution rows. [[manifest]] performs that aggregation,
  * returning exactly [[graft.operators.Curation.packManifest]]'s shape —
  * which is what the q191 gate checks against q182's one-shot oracle
  * VERBATIM, knowing nothing about the cuts.
  *
  * Scale shape: per batch, slim (group, doc, tokens) tuples ride one
  * per-group running-sum window (the packByBudget plan); the registry
  * read is groups × batches rows; the contribution write is
  * batch-pack-sized. Bodies never move; history is never rescanned.
  */
object PackFold {

  private val FoldTs = "2024-01-01 00:00:00"

  /** Fold one batch into the pack stream: emits this batch's
    * contribution rows to `contribTable` and updates `registryTable`.
    * Returns the batch's contributions (materialized).
    */
  def packBatch(spark: SparkSession, registryTable: String,
      contribTable: String, batch: DataFrame, batchId: String,
      idCol: String, groupCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    val slim = batch
      .select(col(groupCol).cast("string").as(groupCol), col(idCol),
        col(tokensCol).cast("long").as("__t"))
      .localCheckpoint(true)
    // prior per-group state, with the replaying batch's own rows dropped
    // up front (the spanDedupBatch replay posture)
    val indexed = Snapshots.currentVersion(registryTable).isDefined
    val prior =
      if (!indexed)
        spark.createDataFrame(
          Seq.empty[(String, Long, Long, Long)]).toDF(
          groupCol, "__prior_tot", "__last_pack", "__last_start")
      else {
        val reg = Snapshots.read(spark, registryTable)
          .filter(col("batch") =!= batchId)
        val tot = reg.groupBy(col(groupCol))
          .agg(sum(col("batch_mass")).as("__prior_tot"))
        // the most recent batch's pack head carries the straddle state
        val head = reg
          .withColumn("__rn", row_number().over(
            Window.partitionBy(col(groupCol))
              .orderBy(col("max_doc").desc)))
          .filter(col("__rn") === 1)
          .select(col(groupCol), col("last_pack_id").as("__last_pack"),
            col("last_pack_start").as("__last_start"))
        tot.join(head, Seq(groupCol))
      }
    val wExcl = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val assigned = slim
      .join(broadcast(prior), Seq(groupCol), "left")
      .withColumn("__pt", coalesce(col("__prior_tot"), lit(0L)))
      .withColumn("__excl",
        col("__pt") + coalesce(sum(col("__t")).over(wExcl), lit(0L)))
      .withColumn("pack_id", expr(s"__excl div ${budget}L"))
      // in-pack offsets: a straddled pack (this batch continues the
      // prior head pack) resumes at (prior_tot - pack start); packs
      // born in this batch start at 0
      .withColumn("__carry",
        when(col("__last_pack").isNotNull &&
          col("pack_id") === col("__last_pack"),
          col("__pt") - col("__last_start")).otherwise(lit(0L)))
      .withColumn("__off",
        col("__carry") + sum(col("__t")).over(
          Window.partitionBy(col(groupCol), col("pack_id"))
            .orderBy(col(idCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint(true)
    val contrib = assigned
      .groupBy(col(groupCol), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__t")).as("total_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(idCol), col("__off")))),
            x => x("__off").cast("string")),
          ",").as("boundaries_csv"),
        min(col(idCol)).as("first_doc"))
      .withColumn("batch", lit(batchId))
      .withColumn("pk",
        concat(col(groupCol), lit("#"), col("pack_id"), lit("#"),
          lit(batchId)))
      .withColumn("ts", lit(FoldTs).cast("timestamp"))
      .localCheckpoint(true)
    // registry state for the NEXT batch: the batch's last pack and that
    // pack's global start (carried from the prior head when this whole
    // batch sits inside the straddled pack)
    val state = assigned
      .groupBy(col(groupCol))
      .agg(
        sum(col("__t")).as("batch_mass"),
        max(col(idCol)).as("max_doc"),
        max(col("pack_id")).as("last_pack_id"))
    // start of the last pack: min global-exclusive prefix among the
    // batch's docs in that pack — unless the pack is the carried prior
    // head, whose start predates this batch
    val lastStart = assigned
      .groupBy(col(groupCol), col("pack_id"))
      .agg(min(col("__excl")).as("__pack_start"))
    val stamped = state
      .join(lastStart,
        state(groupCol) === lastStart(groupCol) &&
          col("last_pack_id") === lastStart("pack_id"))
      .select(state(groupCol), col("batch_mass"), col("max_doc"),
        col("last_pack_id"), col("__pack_start"))
      .join(broadcast(prior), Seq(groupCol), "left")
      .withColumn("last_pack_start",
        when(col("__last_pack").isNotNull &&
          col("last_pack_id") === col("__last_pack"), col("__last_start"))
          .otherwise(col("__pack_start")))
      .withColumn("batch", lit(batchId))
      .withColumn("pk", concat(col(groupCol), lit("#"), lit(batchId)))
      .withColumn("ts", lit(FoldTs).cast("timestamp"))
      .select(col("pk"), col(groupCol), col("batch"), col("batch_mass"),
        col("max_doc"), col("last_pack_id"), col("last_pack_start"),
        col("ts"))
    // REGISTRY commits FIRST: the two commits are not one atomic commit,
    // and the failure modes are asymmetric — registry-without-contrib
    // (crash between them, batch never replayed) leaves the manifest
    // missing one batch's rows but keeps every SUBSEQUENT batch's packing
    // correct, while contrib-without-registry would shift every later
    // pack id/offset permanently. Under the foreachBatch replay contract
    // both upserts are keyed no-ops and the window heals entirely.
    if (indexed) Snapshots.mergeUpsert(spark, registryTable, stamped, "pk")
    else Snapshots.append(stamped, registryTable)
    if (Snapshots.currentVersion(contribTable).isDefined)
      Snapshots.mergeUpsert(spark, contribTable, contrib, "pk")
    else Snapshots.append(contrib, contribTable)
    contrib
  }

  /** Aggregate the contribution table into the one-shot manifest shape
    * ([[graft.operators.Curation.packManifest]]'s columns): counts sum,
    * boundary CSVs concatenate in first-doc order (= batch order under
    * monotone arrival).
    */
  def manifest(spark: SparkSession, contribTable: String,
      groupCol: String): DataFrame =
    Snapshots.read(spark, contribTable)
      .groupBy(col(groupCol), col("pack_id"))
      .agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("total_tokens")).as("total_tokens"),
        array_join(
          transform(
            array_sort(collect_list(
              struct(col("first_doc"), col("boundaries_csv")))),
            x => x("boundaries_csv")),
          ",").as("boundaries_csv"))
}
