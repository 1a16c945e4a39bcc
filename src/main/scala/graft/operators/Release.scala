package graft.operators

import graft.lake.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed corpus-RELEASE pipeline — the artifact chain a training
  * run actually consumes, wired end to end from the release primitives
  * that are gated solo as q172/q178/q181/q182/q184:
  *
  *  1. **Subset** ([[Curation.nestedSubsets]]' membership rule): an
  *     edition's corpus is a structural hash-threshold tier — monotone
  *     cuts make editions nest, so a bigger release strictly extends a
  *     smaller one and scaling comparisons never confound composition
  *     with quantity (the FineWeb sample-ladder convention).
  *  2. **Budget** ([[Sampling.unimaxAllocate]] + [[Sampling.unimaxTake]]):
  *     the edition's training budget waterfills across languages under
  *     an epoch cap, and each language takes its allocation in
  *     deterministic hash order — exact int64 arithmetic end to end.
  *  3. **Pack** ([[Curation.packManifest]]): the selection packs into
  *     budget-sized sequences per language with document-boundary
  *     offsets — the attention-mask segment artifact.
  *  4. **Diff** ([[Curation.datasetDiff]] on the manifest): two editions'
  *     pack manifests full-outer-diff on the pack key, classifying every
  *     pack as added / removed / changed — the ledger that tells a
  *     training pipeline exactly which packed sequences to re-process
  *     between releases.
  *
  * Stage boundaries ROUND-TRIP the snapshot lake (the q95 composition
  * discipline): selections and manifests commit as tables and the next
  * stage reads them back, so the gate exercises the artifacts a real
  * release would ship, not in-memory frames.
  *
  * Scale shape: every stage is the solo operator's plan — bodies never
  * move past stage 1's filter (the pipeline is (lang, doc_id, weight)
  * tuples from there on), windows partition by language, manifests
  * reduce to pack-domain size before the diff, and the diff ships
  * (pack_key, xxhash64) pairs only.
  */
object Release {

  private val EditionTs = "2024-01-01 00:00:00"

  /** Release artifacts are IMMUTABLE: re-running a build against a table
    * that already has a committed snapshot would append a second copy of
    * every row and silently corrupt the manifests and the release diff
    * (the [[graft.streaming.DedupIndex]] legacy-layout posture — fail
    * loudly with the migration path, never corrupt quietly).
    */
  private def requireFresh(table: String): Unit =
    require(Snapshots.currentVersion(table).isEmpty,
      s"release table $table already has a committed snapshot — editions " +
        "and manifests are immutable artifacts; write to a fresh table " +
        "(or delete the old table's directory) instead of re-building " +
        "in place")

  /** Build one edition: subset `docs` to the hash tier below `cutBp`
    * basis points, waterfill `budgetNum/budgetDen` of its mass across
    * `groupCol` under `epochCap`, take per-group allocations in hash
    * order, and commit the selection to `table`. Returns the committed
    * version.
    */
  def buildEdition(spark: SparkSession, docs: DataFrame, idCol: String,
      groupCol: String, weightCol: String, cutBp: Long,
      budgetNum: Long, budgetDen: Long, epochCap: Long,
      table: String): Int = {
    requireFresh(table) // editions are immutable releases, never appended-to
    val corpus = docs.filter(Curation.hashBucket(col(idCol), 10000) < cutBp)
    val alloc = Sampling.unimaxAllocate(corpus, groupCol, weightCol,
      budgetNum, budgetDen, epochCap)
    val sel = Sampling.unimaxTake(corpus, idCol, groupCol, weightCol, alloc)
      .withColumn("ts", lit(EditionTs).cast("timestamp"))
    Snapshots.append(sel, table)
  }

  /** Pack a committed edition into per-group manifests (budget-sized
    * packs, document-boundary offsets) and commit them to `outTable`.
    * The pack key `group#pack_id` is the manifest's primary key for the
    * release diff. Returns the committed version.
    */
  def packEdition(spark: SparkSession, editionTable: String, idCol: String,
      groupCol: String, weightCol: String, packBudget: Long,
      outTable: String): Int = {
    requireFresh(outTable)
    val sel = Snapshots.read(spark, editionTable)
    val manifest = Curation.packManifest(sel, idCol, weightCol,
        packBudget, groupCol, idCol)
      .select(
        concat(col(groupCol), lit("#"), col("pack_id")).as("pack_key"),
        col("n_docs"), col("total_tokens"), col("boundaries_csv"))
      .withColumn("ts", lit(EditionTs).cast("timestamp"))
    Snapshots.append(manifest, outTable)
  }

  /** Diff two committed manifest tables: one (pack_key, status) row per
    * non-identical pack — added / removed / changed ([[Curation
    * .datasetDiff]] semantics; identical packs never reach the ledger).
    * An edition that committed an EMPTY manifest (an empty tier) diffs
    * as pure adds/removes.
    */
  def manifestDiff(spark: SparkSession, tableA: String,
      tableB: String): DataFrame =
    Curation.datasetDiff(
      Snapshots.read(spark, tableA),
      Snapshots.read(spark, tableB),
      "pack_key", Seq("n_docs", "total_tokens", "boundaries_csv"))

  /** The full four-stage pipeline between two edition cuts, lake
    * round-trips included; returns the release diff ledger ordered by
    * pack key. `baseDir` holds the four intermediate tables.
    */
  def releaseDiffPipeline(spark: SparkSession, docs: DataFrame,
      idCol: String, groupCol: String, weightCol: String,
      cutA: Long, cutB: Long, budgetNum: Long, budgetDen: Long,
      epochCap: Long, packBudget: Long, baseDir: String): DataFrame = {
    buildEdition(spark, docs, idCol, groupCol, weightCol, cutA,
      budgetNum, budgetDen, epochCap, s"$baseDir/editionA")
    buildEdition(spark, docs, idCol, groupCol, weightCol, cutB,
      budgetNum, budgetDen, epochCap, s"$baseDir/editionB")
    packEdition(spark, s"$baseDir/editionA", idCol, groupCol, weightCol,
      packBudget, s"$baseDir/manifestA")
    packEdition(spark, s"$baseDir/editionB", idCol, groupCol, weightCol,
      packBudget, s"$baseDir/manifestB")
    manifestDiff(spark, s"$baseDir/manifestA", s"$baseDir/manifestB")
      .orderBy(col("pack_key"))
  }
}
