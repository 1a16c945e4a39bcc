package graft.operators

import graft.lake.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The FULL published web-curation pipeline composed end to end — the
  * FineWeb / RefinedWeb / C4 / CCNet recipe as ONE artifact chain, every
  * stage being an operator that is oracle-gated solo:
  *
  *  1. URL/domain filtering ([[TextAnalysis.urlDomainFilter]] — RefinedWeb
  *     §3.1's blocklists) — KILLS documents;
  *  2. HTML/boilerplate hygiene ([[TextAnalysis.stripHtmlKeepLines]]) —
  *     rewrites, preserving the line structure later stages consume;
  *  3. language ID ([[TextAnalysis.languageIdMulti]], keep predicted en —
  *     the FineWeb monolingual cut) — KILLS;
  *  4. Gopher quality rules ([[Curation.gopherRules]]) — KILLS;
  *  5. Gopher repetition battery ([[Curation.gopherRepetition]]) — KILLS;
  *  6. C4 page/line rules ([[Curation.c4Rules]] — line rules REWRITE to
  *     the kept lines, page rules KILL);
  *  7. CCNet paragraph dedup ([[Curation.corpusParagraphDedup]] at line
  *     granularity — the WET-file paragraph unit) — rewrites;
  *  8. C4 three-sentence-span dedup ([[Curation.c4SpanDedup]]) — rewrites;
  *  9. MinHash-LSH near-dup detection + connected components + canonical
  *     emission ([[Dedup]] — the q32/q67/q84 chain) — KILLS;
  * 10. PII redaction ([[Privacy.redactPii]]) — rewrites.
  *
  * Stage boundaries ROUND-TRIP the snapshot lake (the q185 composition
  * discipline): every stage commits its surviving corpus as a table and
  * the next stage reads it back, so the gate exercises the artifacts a
  * real pipeline ships — composition is where stage-boundary bugs live.
  *
  * The LEDGER is the pipeline's data card: one row per stage with the
  * doc/token/char attrition and an order-independent corpus fingerprint
  * (bit_xor of per-doc md5 prefixes), so any drift in any stage's
  * rewrite — not just its kill set — moves a ledger value.
  *
  * Scale shape: every stage keeps its solo operator's plan (map-only
  * gates, slim-tuple dedup shuffles, broadcast lexicons, the blocked LSH
  * pairing schedule); bodies ride one commit write + one scan per stage
  * boundary, which is exactly the materialization a restartable 100 TB
  * pipeline pays anyway (and what lets each stage re-run independently).
  */
object WebCuration {

  private val StageTs = "2024-01-01 00:00:00"

  /** Stage tables in pipeline order, as committed under `baseDir`. */
  val stageNames: Seq[String] = Seq("raw", "url_filter", "html_clean",
    "langid", "gopher_quality", "gopher_repetition", "c4_rules",
    "paragraph_dedup", "span_dedup", "near_dup", "pii_redact")

  private def commitStage(df: DataFrame, baseDir: String, k: Int): Unit =
    Snapshots.append(
      df.withColumn("ts", lit(StageTs).cast("timestamp")),
      s"$baseDir/s$k")

  private def readStage(spark: SparkSession, baseDir: String,
      k: Int): DataFrame =
    Snapshots.read(spark, s"$baseDir/s$k")
      .select(col("doc_id"), col("lang"), col("text"))

  /** Run the ten stages over `docs` (doc_id, lang, text), committing each
    * stage's surviving corpus to `baseDir/s0 .. s10`.
    */
  def run(spark: SparkSession, docs: DataFrame, baseDir: String,
      suffixes: Seq[String], blockedDomains: Seq[String],
      blockedSubstrings: Seq[String]): Unit = {
    commitStage(docs.select(col("doc_id"), col("lang"), col("text")),
      baseDir, 0)

    // 1. URL/domain filter — map-only ledger, slim keep-flag join back
    val s0 = readStage(spark, baseDir, 0)
    val urlKeep = TextAnalysis.urlDomainFilter(s0, "doc_id", "text",
        suffixes, blockedDomains, blockedSubstrings)
      .filter(col("keep")).select(col("doc_id"))
    commitStage(s0.join(urlKeep, Seq("doc_id"), "left_semi"), baseDir, 1)

    // 2. HTML hygiene, line-preserving — pure map
    val s1 = readStage(spark, baseDir, 1)
    commitStage(s1.select(col("doc_id"), col("lang"),
      TextAnalysis.stripHtmlKeepLines(col("text")).as("text")), baseDir, 2)

    // 3. language ID — keep predicted en (broadcast lexicons, zero shuffle)
    val s2 = readStage(spark, baseDir, 2)
    commitStage(TextAnalysis.languageIdMulti(s2, "text")
      .filter(col("lang_pred") === "en")
      .select(col("doc_id"), col("lang"), col("text")), baseDir, 3)

    // 4. Gopher quality rules — map-only battery, keep-flag semi join
    val s3 = readStage(spark, baseDir, 3)
    val gqKeep = Curation.gopherRules(s3, "doc_id", "text")
      .filter(col("keep")).select(col("doc_id"))
    commitStage(s3.join(gqKeep, Seq("doc_id"), "left_semi"), baseDir, 4)

    // 5. Gopher repetition battery — level-cascaded n-gram scan
    val s4 = readStage(spark, baseDir, 4)
    val grKeep = Curation.gopherRepetition(
        s4.repartition(spark.sparkContext.defaultParallelism,
          col("doc_id")), "doc_id", "text")
      .filter(col("keep")).select(col("doc_id"))
    commitStage(s4.join(grKeep, Seq("doc_id"), "left_semi"), baseDir, 5)

    // 6. C4 rules — page rules kill, line rules rewrite to kept lines
    val s5 = readStage(spark, baseDir, 5)
    commitStage(Curation.c4Rules(s5, "doc_id", "text")
      .filter(col("keep"))
      .select(col("doc_id"), col("text_clean").as("text"))
      .join(s5.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("text")), baseDir, 6)

    // 7. CCNet paragraph dedup at LINE granularity (c4Rules rejoined
    //    kept lines with single newlines — and a WET "paragraph" IS a
    //    line per Wenzek et al. 2020)
    val s6 = readStage(spark, baseDir, 6)
    commitStage(Curation.corpusParagraphDedup(
        s6.repartition(spark.sparkContext.defaultParallelism,
          col("doc_id")), "doc_id", "text", sep = "\n")
      .select(col("doc_id"), col("text_clean").as("text"))
      .join(s6.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("text")), baseDir, 7)

    // 8. C4 span dedup — slim int64 span keys, bodies shuffle once
    val s7 = readStage(spark, baseDir, 7)
    commitStage(Curation.c4SpanDedup(
        s7.repartition(spark.sparkContext.defaultParallelism,
          col("doc_id")), "doc_id", "text")
      .select(col("doc_id"), col("text_clean").as("text"))
      .join(s7.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("text")), baseDir, 8)

    // 9. MinHash-LSH + exact Jaccard + connected components, canonical
    //    survivor per cluster (the q67/q84 emission chain, blocked
    //    pairing schedule — bounded tasks, complete pair set)
    val s8raw = readStage(spark, baseDir, 8)
    val s8 = s8raw.repartition(spark.sparkContext.defaultParallelism,
      col("doc_id"))
    val sets = Dedup.shingleFrame(s8, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pair only docs WITH shingles: a doc the upstream rewrites emptied
    // carries no similarity evidence and survives as its own cluster —
    // the oracle agrees structurally (an empty set's band signature is
    // NULL there and never joins; Spark's concat_ws gives empties a ""
    // sentinel sig that would bucket them together, q199's 10× lesson)
    val pairable = sets.filter(col("n_sh") > 0)
    val cands = Dedup.blockedCandidatePairs(
      Dedup.lshKeyedBucketsWithSigs(pairable, bands = 2, rowsPerBand = 3),
      "doc", Seq("band", "sig"), blockSize = 256, crossBandDedup = Some(2))
    val pairs = Dedup.jaccardVerify(sets, cands, minJaccard = 0.2)
      .select(col("id1"), col("id2"))
      .localCheckpoint(true)
    sets.unpersist(false)
    val clusters = Dedup.duplicateClusters(
        s8.select(col("doc_id").as("id")), pairs)
      .localCheckpoint(true)
    commitStage(Dedup.keepCanonical(s8raw, "doc_id", clusters), baseDir, 9)

    // 10. PII redaction — pure map rewrite
    val s9 = readStage(spark, baseDir, 9)
    commitStage(Privacy.redactPii(s9, "text")
      .select(col("doc_id"), col("lang"),
        col("redacted").as("text")), baseDir, 10)
  }

  /** ONE micro-batch of the pipeline — the INCREMENTAL twin of [[run]]
    * for continuously-arriving data (the q171/q176/q153 lake-fold family
    * applied to the WHOLE composition): stages 1–6 are per-doc gates and
    * rewrites (batch-local by construction); stages 7–9 fold through the
    * growing lake registries ([[graft.streaming.DedupIndex]] — history
    * text never rescanned, probe-pruned registry reads); survivors land
    * in `baseDir/kept` via keyed mergeUpsert (replays are no-ops).
    *
    * Near-dup semantics: the fold uses [[graft.streaming.DedupIndex
    * .lshDedupBatch]]'s ARRIVAL-HISTORY rule — suppress a doc iff a
    * lower-id verified near-dup exists (over index + earlier in-batch
    * rows) — which under id-monotone arrival equals the one-shot
    * PAIRWISE rule on the union. That rule differs from [[run]]'s
    * CC-canonical emission exactly on transitive components whose
    * middle member has no DIRECT lower-id pair (CC keeps only the
    * component min; pairwise also keeps such members) — the honest
    * price of incrementality: component structure is a global property,
    * pairwise suppression is arrival-local. The q202 gate's oracle uses
    * the pairwise rule for this reason.
    *
    * Under id-monotone batches the WHOLE fold is batching-independent:
    * per-doc stages commute with batching trivially, and each registry
    * stage's fold ≡ its one-shot rule on the union (their solo gates'
    * argument), so each stage's per-doc OUTPUT text equals the one-shot
    * stage output — inductively the final kept table equals the one-shot
    * pipeline with pairwise dedup, for ANY batch cuts.
    */
  def runBatch(spark: SparkSession, batchDocs: DataFrame, baseDir: String,
      suffixes: Seq[String], blockedDomains: Seq[String],
      blockedSubstrings: Seq[String]): Unit = {
    val b0 = batchDocs.select(col("doc_id"), col("lang"), col("text"))
      .localCheckpoint(true)
    val urlKeep = TextAnalysis.urlDomainFilter(b0, "doc_id", "text",
        suffixes, blockedDomains, blockedSubstrings)
      .filter(col("keep")).select(col("doc_id"))
    val b2 = b0.join(urlKeep, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.stripHtmlKeepLines(col("text")).as("text"))
    val b3 = TextAnalysis.languageIdMulti(b2, "text")
      .filter(col("lang_pred") === "en")
      .select(col("doc_id"), col("lang"), col("text"))
    val gqKeep = Curation.gopherRules(b3, "doc_id", "text")
      .filter(col("keep")).select(col("doc_id"))
    val b4 = b3.join(gqKeep, Seq("doc_id"), "left_semi")
    val grKeep = Curation.gopherRepetition(
        b4.repartition(spark.sparkContext.defaultParallelism,
          col("doc_id")), "doc_id", "text")
      .filter(col("keep")).select(col("doc_id"))
    val b5 = b4.join(grKeep, Seq("doc_id"), "left_semi")
    val b6 = Curation.c4Rules(b5, "doc_id", "text")
      .filter(col("keep"))
      .select(col("doc_id"), col("text_clean").as("text"))
      .join(b5.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("text"))
      .localCheckpoint(true)
    val b7 = graft.streaming.DedupIndex.paragraphDedupBatch(spark,
        s"$baseDir/paraReg", b6, sep = "\n")
      .select(col("doc_id"), col("text_clean").as("text"))
      .join(b6.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("text"))
      .localCheckpoint(true)
    val b8 = graft.streaming.DedupIndex.spanDedupBatch(spark,
        s"$baseDir/spanReg", b7)
      .select(col("doc_id"), col("text_clean").as("text"))
      .join(b7.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("text"))
      .localCheckpoint(true)
    val survivors = graft.streaming.DedupIndex.lshDedupBatch(spark,
      s"$baseDir/lshIdx", b8)
    val b10 = Privacy.redactPii(
        b8.join(survivors, Seq("doc_id"), "left_semi"), "text")
      .select(col("doc_id"), col("lang"), col("redacted").as("text"))
      .withColumn("ts", lit(StageTs).cast("timestamp"))
      .localCheckpoint(true) // materialize before the kept-table commit
    if (Snapshots.currentVersion(s"$baseDir/kept").isDefined)
      Snapshots.mergeUpsert(spark, s"$baseDir/kept", b10, "doc_id")
    else Snapshots.append(b10, s"$baseDir/kept")
  }

  /** The attrition LEDGER over the committed stage tables: per stage,
    * docs in/kept, token and char mass kept, and the order-independent
    * corpus fingerprint. ONE aggregation job over the union of the
    * eleven slim stage scans (r22): the per-stage `.head` form paid
    * eleven sequential driver round-trips of pure job dispatch — the
    * whole q199 steady window was this ledger; a stage missing from the
    * grouped result (an empty stage table) reads as all-zero, exactly
    * what the per-stage aggregation's coalesce produced.
    */
  def ledger(spark: SparkSession, baseDir: String): DataFrame = {
    val byStage = stageNames.indices.map { k =>
      readStage(spark, baseDir, k).select(lit(k).as("__k"), col("text"))
    }.reduce(_ unionAll _)
      .groupBy(col("__k"))
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long")), lit(0L)).as("tok"),
        coalesce(sum(length(col("text")).cast("long")), lit(0L)).as("ch"),
        coalesce(expr(
          "bit_xor(cast(conv(substr(md5(text), 1, 15), 16, 10) as bigint))"),
          lit(0L)).as("fp"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val stats = stageNames.indices.map { k =>
      val (n, tok, ch, fp) = byStage.getOrElse(k, (0L, 0L, 0L, 0L))
      (k.toLong, stageNames(k), n, tok, ch, fp)
    }
    val ledgerRows = stats.zipWithIndex.map { case (s, i) =>
      val nIn = if (i == 0) s._3 else stats(i - 1)._3
      (s._1, s._2, nIn, s._3, s._4, s._5, s._6)
    }
    import spark.implicits._
    ledgerRows.toDF("stage_id", "stage", "n_in", "n_kept", "tokens_kept",
      "chars_kept", "text_fp")
  }
}
