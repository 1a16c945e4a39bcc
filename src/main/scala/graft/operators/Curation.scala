package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation operators for training-data pipelines: deterministic
  * train/val/test splitting, test-set decontamination (n-gram overlap
  * against a training corpus), and sequence packing by token budget.
  *
  * All assignment is hash- or prefix-sum-derived — never `rand()` — so a
  * split or pack is reproducible across runs, engines, and retries
  * (Spark task retries re-evaluate expressions; a nondeterministic split
  * would tear a dataset apart between attempts).
  */
object Curation {

  /** Stable bucket in [0, buckets) from the md5 of the id rendered as a
    * string: first 8 hex chars → integer → mod. Any engine reproduces the
    * exact assignment (the DuckDB oracle does), and adding rows never
    * reshuffles existing ones — the property that makes hash splits the
    * standard for corpus versioning.
    */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    conv(substring(md5(id.cast(StringType)), 1, 8), 16, 10)
      .cast(LongType) % buckets

  /** Deterministic split assignment. `splits` are (name, percent) in
    * order; percents must sum to 100. A row's bucket (md5-derived) picks
    * the first range it falls in. Pure per-row projection: no shuffle, no
    * state — safe at any scale and under AQE retries.
    */
  def deterministicSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5))
      : DataFrame = {
    require(splits.map(_._2).sum == 100, s"split percents must sum to 100: $splits")
    val bucket = hashBucket(col(idCol))
    val bounds = splits.scanLeft(0)(_ + _._2).tail
    val assign = splits.zip(bounds).foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), rest) => when(bucket < hi, name).otherwise(rest)
    }
    df.withColumn("bucket", bucket).withColumn("split", assign)
  }

  /** Deterministic stratified downsampling: keep a row iff its id's
    * md5 bucket (out of 10000, for basis-point precision) falls below the
    * stratum's sampling rate. Like [[deterministicSplit]] this is a pure
    * per-row projection — no shuffle, no rand(), retry- and
    * engine-reproducible — which is what lets a 100 TB corpus be
    * re-sampled to the same rows on every run.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 1.0): DataFrame = {
    val bucket = hashBucket(col(idCol), 10000)
    val thresh = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit((defaultFraction * 10000).toLong): Column) {
        case (rest, (k, f)) =>
          when(col(strataCol) === k, lit((f * 10000).toLong)).otherwise(rest)
      }
    df.filter(bucket < thresh)
  }

  /** Test-set decontamination: for each test document, how many of its
    * distinct word n-grams appear anywhere in the training corpus.
    * Returns (id, n_shingles, n_contaminated, contamination_ratio).
    *
    * Scale shape: both sides reduce to distinct-shingle frames
    * ([[Dedup.shingleFrame]] — one tokenize pass each); the training side
    * collapses to its GLOBAL distinct shingle set before the join, so the
    * join's build side is vocabulary-sized, not corpus-sized, and each
    * test shingle matches at most one training row (no fan-out). One
    * shuffle on the shingle key; bodies never move.
    */
  /** @param bloomFpp when set, a Bloom filter of the TEST gram vocabulary
    *   prefilters TRAIN grams before their corpus-wide `distinct()` — the
    *   100 TB ergonomics lever. The direction matters: train is the big
    *   side, and its distinct-vocabulary shuffle is the only corpus-scale
    *   shuffle in this plan. Bloom filters have no false negatives, so a
    *   dropped train gram provably matches no test gram and the output is
    *   IDENTICAL with the option on or off; false positives (rate `fpp`)
    *   merely ride the shuffle and fail the exact join. Building the
    *   filter costs one map-side pass over the (small) test gram set —
    *   sketches merge, rows never move. Lower fpp buys fewer stray train
    *   grams for more filter bits (monotone — see CurationSpec).
    * @param bloomExpectedItems sizing for the filter (distinct test grams;
    *   overestimating costs bits, underestimating costs fpp).
    */
  def decontaminate(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3, bloomFpp: Option[Double] = None,
      bloomExpectedItems: Long = 4L << 20): DataFrame = {
    // explode_outer + isNotNull instead of plain explode — deliberately.
    // On a non-outer Generate, Spark's InferFiltersFromGenerate adds
    // `size(sh) > 0` under the explode, and predicate pushdown then clones
    // the ENTIRE tokenize+shingle expression into the parquet scan's
    // DataFilters — where the token-staging projection of
    // [[Dedup.shingleFrame]] does not exist, so split() re-evaluates per
    // gram reference and the tokenize pass goes quadratic in document
    // length (measured 54× vs compute floor at sf0.1). The rule matches
    // only `outer = false` generates; explode_outer emits one null-gram
    // row for an empty shingle set, and the isNotNull filter on the
    // GENERATED attribute (which no rule can push below the Generate)
    // restores plain-explode semantics exactly. Net: identical rows, zero
    // materialization, and the scan keeps its staged linear plan.
    val testGrams = Dedup.shingleFrame(test, idCol, textCol, shingleN)
      .select(col("doc"), col("n_sh"), explode_outer(col("sh")).as("gram"))
      .filter(col("gram").isNotNull)
    val trainGramsRaw = Dedup.shingleFrame(train, idCol, textCol, shingleN)
      .select(explode_outer(col("sh")).as("gram"))
      .filter(col("gram").isNotNull)
    val trainGrams = bloomFpp match {
      case Some(fpp) =>
        val bloom = testGrams.stat.bloomFilter("gram", bloomExpectedItems, fpp)
        trainGramsRaw
          .filter(graft.plans.BloomMightContain(bloom, col("gram")))
          .distinct()
      case None => trainGramsRaw.distinct()
    }
    testGrams
      .join(trainGrams.withColumn("__hit", lit(1L)), Seq("gram"), "left")
      .groupBy(col("doc").as(idCol))
      .agg(max(col("n_sh")).cast(LongType).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
      .withColumn("contamination_ratio",
        col("n_contaminated").cast(DoubleType) / col("n_shingles"))
  }

  /** LSH fuzzy decontamination — the SCALE path past [[decontaminate]]'s
    * exact n-gram overlap: a training document is flagged when it is a
    * NEAR-DUPLICATE of any eval document (paraphrase, whitespace and
    * punctuation variants slip an exact-gram gate; published recipes
    * dedup train-vs-eval with MinHash for exactly this reason).
    *
    * Candidates come from a banded-MinHash BUCKET JOIN between the two
    * corpora — never an all-pairs pass: train buckets join eval buckets
    * on (band, signature), so the cost is bucket-collision-sized. The
    * eval side of a decontamination run is benchmark-suite-sized — it
    * BROADCASTS, and the train corpus is never shuffled (the 100 TB
    * posture: map-side bucket join + slim candidate pairs + two id hash
    * joins for verification). Candidates verify by exact shingle
    * Jaccard ≥ `minJaccard` (one integer-exact division per pair, the
    * q32 convention).
    *
    * Returns ONE row per train document: `n_matches` (verified eval
    * near-dups), `best_eval_id` / `best_jaccard` (highest-Jaccard match,
    * ties to the lowest eval id — total-ordered, engine-portable; null
    * for clean docs) and `contaminated`.
    */
  def fuzzyDecontaminate(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, minJaccard: Double = 0.2, shingleN: Int = 2,
      bands: Int = 2, rowsPerBand: Int = 3): DataFrame = {
    // The eval side is benchmark-suite-sized: its shingle sets are
    // checkpointed whole (consumed by both the bucket pass and the
    // verify join; the checkpoint truncates lineage so inferred
    // isnotnull(size(sh)) join filters land on the LogicalRDD instead
    // of re-deriving the tokenize+shingle chain inside the parquet
    // scan's data filters — the PlanShapeSpec generator-pushdown trap).
    val teSets = Dedup.shingleFrame(test, idCol, textCol, shingleN)
      .localCheckpoint(true)
    val teKeys = Dedup.lshKeyedBuckets(teSets, bands, rowsPerBand)
      .select(col("band"), col("sig"), col("doc").as("__eid"))
    // The TRAIN side is the corpus: only its SLIM bucket keys
    // (band, sig, id — a few dozen bytes/doc) are ever materialized,
    // never its shingle sets. The checkpoint here serves the same
    // lineage-truncation purpose for the bucket join's inferred
    // filters while keeping executor storage O(corpus keys), not
    // O(corpus shingles).
    val trKeys = Dedup.lshKeyedBuckets(
        Dedup.shingleFrame(train, idCol, textCol, shingleN),
        bands, rowsPerBand)
      .select(col("band"), col("sig"), col("doc").as("__tid"))
      .localCheckpoint(true)
    // Candidate pairs are bucket-collision-sized — checkpoint the slim
    // pair frame once; it feeds both the verify join and the pruning
    // semi join below.
    val cands = trKeys.join(broadcast(teKeys), Seq("band", "sig"))
      .select(col("__tid"), col("__eid")).distinct()
      .localCheckpoint(true)
    // Verify sets are derived ONLY for candidate train docs (the
    // lshDedupBatch `touched` shape, DedupIndex.scala): the corpus is
    // semi-join-pruned on the id BEFORE the tokenize+shingle chain
    // runs, so the verify join's build/probe — and the checkpointed
    // storage — track the CANDIDATE count, not the corpus. Candidate
    // docs pay the shingle derivation twice (once in the bucket pass,
    // once here); that map-side recompute is the price of never
    // materializing corpus-sized shingle sets.
    val candTrain = train.join(
      cands.select(col("__tid").as(idCol)).distinct(), Seq(idCol), "left_semi")
    val trSetsPruned = Dedup.shingleFrame(candTrain, idCol, textCol, shingleN)
      .localCheckpoint(true)
    val verified = cands
      .join(trSetsPruned.select(col("doc").as("__tid"), col("sh").as("__sh1"),
        col("n_sh").as("__n1")), "__tid")
      .join(broadcast(teSets.select(col("doc").as("__eid"),
        col("sh").as("__sh2"), col("n_sh").as("__n2"))), "__eid")
      .withColumn("__common",
        graft.plans.CommonCount(col("__sh1"), col("__sh2")).cast(LongType))
      .withColumn("__jaccard", col("__common").cast(DoubleType) /
        (col("__n1") + col("__n2") - col("__common")))
      .filter(col("__jaccard") >= minJaccard)
    // Best match: maximum Jaccard, ties to the LOWEST eval id — ONE
    // min_by over the ordering struct (−jaccard asc, id asc). Only the
    // internally-computed Double is negated; the USER's id column never
    // is (negating a non-numeric id casts to double → NULL and the
    // "total-ordered" promise silently breaks).
    val perTrain = verified.groupBy(col("__tid"))
      .agg(count(lit(1)).as("n_matches"),
        min_by(col("__eid"), struct(-col("__jaccard"), col("__eid")))
          .as("best_eval_id"),
        max(col("__jaccard")).as("best_jaccard"))
      .withColumnRenamed("__tid", idCol)
    train.select(col(idCol))
      .join(perTrain, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("best_eval_id"), col("best_jaccard"))
      .withColumn("contaminated", col("n_matches") > 0L)
  }

  /** Sequence packing by token budget: within each `partitionCol` stratum,
    * walk documents in `orderCol` order and assign
    * `pack_id = floor(exclusive_prefix_tokens / budget)` — the
    * deterministic streaming-pack rule (a document opens a new pack when
    * the tokens before it have crossed a budget boundary; packs can
    * overfill by at most one document, never underfill by more than a
    * straggler).
    *
    * Scale shape: ONE window per stratum — packing parallelizes across
    * strata (language, source, shard key), which is how a 100 TB corpus
    * is packed in practice. A global (unpartitioned) pack would serialize
    * into a single task; callers wanting one global stream should
    * pre-shard ids into strata and offset pack ids per stratum.
    */
  def packByBudget(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, partitionCol: String, orderCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partitionCol)).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // exact integer floor division (not floor of a double quotient): the
    // incremental fold (streaming.PackFold) assigns packs with int64
    // `div`, and a group's cumulative token total past 2⁵³ would round
    // the double path onto a different pack at the boundary — both sides
    // must share the exact arithmetic for fold ≡ one-shot to hold at any
    // scale (equal below 2⁵³ either way, so the DuckDB oracles agree)
    df.withColumn("__pack_excl",
        coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"__pack_excl div ${budget}L"))
      .drop("__pack_excl")
  }

  /** Pack MANIFESTS with document-boundary offsets — the artifact packed
    * training actually consumes ([[packByBudget]] assigns docs to packs;
    * this emits, per pack, the cumulative token offsets where each doc
    * ENDS — exactly the segment boundaries an attention mask needs to
    * stop cross-document contamination inside a packed sequence, the
    * failure mode Krell et al. 2021 ("Efficient Sequence Packing without
    * Cross-contamination") quantify). Offsets render as a CSV string
    * (the q61 code-list convention — exact integers, engine-portable).
    *
    * Returns per (partition, pack): `n_docs`, `total_tokens` (may
    * overshoot the budget by part of one document — packs hold whole
    * docs; the mask, not the packer, handles the tail), and
    * `boundaries_csv`.
    *
    * Scale shape: the [[packByBudget]] running-sum window plus one more
    * over the same partitioning (no extra sort), then a (partition,
    * pack)-keyed aggregation of slim (order, offset) pairs — per-pack
    * state is one pack's docs, bounded by budget/min-doc-length.
    */
  def packManifest(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, partitionCol: String, orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val packed = packByBudget(df, idCol, tokensCol, budget,
      partitionCol, orderCol)
    val wIn = Window.partitionBy(col(partitionCol), col("pack_id"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packed
      .withColumn("__off", sum(col(tokensCol)).over(wIn))
      .groupBy(col(partitionCol), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("total_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(orderCol), col("__off")))),
            x => x("__off").cast(StringType)),
          ",").as("boundaries_csv"))
  }

  /** Curriculum / annealing PHASE assignment — the data-ORDERING knob of
    * a training run (curriculum learning per Bengio et al. 2009; the
    * modern anneal recipe trains highest-quality data LAST — the
    * mid-training/annealing phase of the published open recipes): docs
    * split into `nPhases` equal-count phases by ascending score, phase =
    * ⌊nPhases·(rank−1)/N⌋ over the exact global rank — integer
    * arithmetic, so the split reproduces bit-for-bit in any engine and
    * adding one doc shifts at most one doc per boundary. Consumers train
    * phases in order and shuffle WITHIN a phase by hash (the q177
    * i.i.d.-within-bucket caveat: score-sorted order inside a phase
    * would add curriculum bias at a granularity the recipe doesn't ask
    * for).
    *
    * Scale shape: one slim (id, score) scan + [[Ranking.globalRank]]'s
    * range-sorted zipWithIndex (the q145 rank discipline — no
    * corpus-sized window task) + one count action. Bodies never move.
    */
  def curriculumPhases(df: DataFrame, idCol: String, scoreCol: String,
      nPhases: Int): DataFrame = {
    require(nPhases >= 1, s"nPhases must be >= 1: $nPhases")
    // pinned (multi-consumer convention): the slim frame feeds BOTH the
    // count and the rank — without the pin an expensive upstream
    // derivation re-runs per action, and a non-deterministic input could
    // make n disagree with the ranked frame, skewing phase boundaries
    val slim = df.select(col(idCol),
        col(scoreCol).cast(LongType).as(scoreCol))
      .localCheckpoint(true)
    val n = math.max(1L, slim.count())
    Ranking.globalRank(slim, Seq(col(scoreCol), col(idCol)), "__rk")
      .withColumn("phase", expr(s"(${nPhases}L * (__rk - 1)) div ${n}L"))
      .drop("__rk")
  }

  /** Curriculum × packing — the annealing schedule as a CONSUMABLE batch
    * plan: [[curriculumPhases]] assigns each doc its phase, then packs
    * build PER PHASE ([[packManifest]] partitioned on the phase, docs in
    * id order within it), so a phase boundary can never split a pack —
    * the trainer walks phases in order and reads each phase's packs as
    * ordinary q182 manifests. Returns per (phase, pack): `n_docs`,
    * `total_tokens`, `boundaries_csv`.
    *
    * Scale shape: the phase assignment is [[curriculumPhases]]'s slim
    * rank pass; packing adds one per-phase running-sum window over slim
    * (id, tokens, phase) tuples. Bodies never move (manifests, not
    * payloads — the q182→q190 split). nPhases is small, so per-phase
    * windows inherit the [[packByBudget]] single-stratum-task ceiling;
    * a corpus whose single phase outgrows a task pre-shards phases into
    * (phase, shard) strata exactly as packByBudget documents.
    */
  def curriculumPackPlan(df: DataFrame, idCol: String, scoreCol: String,
      tokensCol: String, nPhases: Int, packBudget: Long): DataFrame = {
    val phased = curriculumPhases(
      df.select(col(idCol), col(scoreCol)), idCol, scoreCol, nPhases)
    val joined = df.select(col(idCol), col(tokensCol))
      .join(phased.select(col(idCol), col("phase")), Seq(idCol))
    packManifest(joined, idCol, tokensCol, packBudget,
      partitionCol = "phase", orderCol = idCol)
  }

  /** Pack PAYLOAD materialization — the emission half of packing
    * ([[packManifest]] ships the boundary ledger; this ships the packed
    * SEQUENCES a trainer reads): per (partition, pack), the member
    * documents' texts concatenated in pack order with a newline
    * separator, next to the manifest's counts. The q84 emission posture:
    * this is the one pack-family operator whose output carries bodies,
    * so it exists separately from the manifest — ledgers stay slim,
    * payloads materialize only when a run actually exports shards.
    *
    * Scale shape: one [[packByBudget]] running-sum window, then bodies
    * ride EXACTLY ONE shuffle (to their (partition, pack) group — the
    * same move a shard writer pays); per-pack state is one pack's docs,
    * bounded by budget/min-doc-length.
    */
  def packPayloads(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, partitionCol: String, orderCol: String,
      textCol: String): DataFrame = {
    val packed = packByBudget(df, idCol, tokensCol, budget,
      partitionCol, orderCol)
    packed
      .groupBy(col(partitionCol), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("total_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(orderCol), col(textCol)))),
            x => x(textCol)),
          "\n").as("payload"))
  }

  /** Sliding-window document chunking — [[packByBudget]]'s complement:
    * where packing joins short documents up to a token budget, chunking
    * splits long documents into overlapping `maxTokens`-token windows at
    * `stride`-token steps (overlap = maxTokens − stride, the context-
    * carryover a training pipeline wants at sequence boundaries).
    *
    * Chunk starts are 0, stride, 2·stride, … while < n_tokens, so every
    * token lands in ≥ 1 chunk and the rule is pure integer arithmetic —
    * any engine reproduces the exact chunking (ids, bounds, and text).
    * One codegen'd pass: tokens staged once, starts exploded
    * (explode_outer + isNotNull keeps the derivation out of scan filters
    * — the generator-pushdown trap), window sliced per row. Zero-token
    * documents produce no chunks. Pure map — no shuffle at any corpus
    * size.
    */
  /** Corpus-frequency boilerplate removal (the "line-level" dedup step of
    * published web-curation recipes — C4 drops lines repeated across the
    * corpus; this corpus has no line structure, so the unit is an ALIGNED
    * non-overlapping `segTokens`-token segment): any segment whose
    * document frequency reaches `minDocs` is boilerplate, and every
    * occurrence is removed from every document. Returns one row per input
    * document: (id, n_segments, n_boilerplate, clean_text) with surviving
    * segments rejoined in position order.
    *
    * Scale shape — the plan mirrors how a 100 TB C4-style pass runs:
    *   1. one tokenize pass stages segments as an array on the doc row
    *      (pure map);
    *   2. the document-frequency aggregation ships (segment, doc) pairs
    *      once and partial-aggregates map-side;
    *   3. the boilerplate set is, by construction, heavy hitters only
    *      (|set| ≤ corpus_segments / minDocs, and in practice tiny) → it
    *      BROADCASTS, so marking is a map-side left join, bodies never
    *      move for it;
    *   4. one reassembly shuffle on the doc id restores position order
    *      via sort_array(collect_list(struct(pos, seg))) — per-doc state
    *      is one document's segments, so no skew at any corpus size.
    * Segment membership is exact string equality — reproducible in any
    * engine; no floats anywhere.
    */
  def removeBoilerplateSegments(df: DataFrame, idCol: String,
      textCol: String, segTokens: Int = 3, minDocs: Int = 5): DataFrame = {
    require(segTokens >= 1 && minDocs >= 2,
      s"need segTokens >= 1, minDocs >= 2; got $segTokens, $minDocs")
    val nSeg = ceil(col("__n").cast(DoubleType) / segTokens).cast(LongType)
    val segArr = when(col("__n") > 0,
      transform(sequence(lit(0L), nSeg - 1), i =>
        array_join(slice(col("__tk"), (i * segTokens + 1).cast(IntegerType),
          lit(segTokens)), " ")))
      .otherwise(array().cast(ArrayType(StringType)))
    val staged = df
      .select(col(idCol), tokens(col(textCol)).as("__tk"))
      .select(col(idCol), col("__tk"), size(col("__tk")).as("__n"))
      .select(col(idCol), segArr.as("__segs"))
    // explode_outer + isNotNull: keeps empty docs in the output AND keeps
    // InferFiltersFromGenerate from pushing the tokenize forest into the
    // scan (the generator-pushdown trap — see decontaminate above).
    // Checkpointed: the frequency agg AND the mark join both consume this
    // frame, and the tokenize pass is the operator's map cost — one pass,
    // not two (the q67/q104 shared-frame convention; rows are slim
    // (id, pos, segment) triples; measured 1.5 s vs 1.9 s re-derived at
    // sf0.1).
    val seg = staged.select(col(idCol),
        posexplode_outer(col("__segs")).as(Seq("pos", "seg")))
      .localCheckpoint(true)
    val boiler = seg.filter(col("seg").isNotNull)
      .groupBy(col("seg"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(col("seg"), lit(1L).as("__bp"))
    seg.join(broadcast(boiler), Seq("seg"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("seg")).cast(LongType).as("n_segments"),
        coalesce(sum(col("__bp")), lit(0L)).as("n_boilerplate"),
        // collect_list drops nulls, so boilerplate (and the empty-doc
        // outer row) never enters the reassembly array
        array_join(transform(
          sort_array(collect_list(
            when(col("__bp").isNull && col("seg").isNotNull,
              struct(col("pos"), col("seg"))))),
          s => s.getField("seg")), " ").as("clean_text"))
  }

  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && stride <= maxTokens,
      s"stride must be in [1, maxTokens]; got stride=$stride maxTokens=$maxTokens")
    val staged = df.select(col(idCol), tokens(col(textCol)).as("__tk"))
      .select(col(idCol), col("__tk"), size(col("__tk")).as("__n"))
    val lastChunk = ((col("__n") - 1).cast(DoubleType) / stride).cast(LongType)
    // zero-token docs get an EMPTY starts array (→ explode_outer null →
    // dropped on the generated attribute) rather than a `__n > 0` filter:
    // a pre-explode filter pushes `size(tokens(text)) > 0` into the scan's
    // data filters, re-deriving the tokenization per row (the
    // generator-pushdown trap PlanShapeSpec guards against)
    val starts = when(col("__n") > 0,
      transform(sequence(lit(0L), lastChunk), k => k * stride))
      .otherwise(array().cast(ArrayType(LongType)))
    val chunk = slice(col("__tk"), (col("chunk_start") + 1).cast(IntegerType),
      lit(maxTokens))
    staged
      .select(col(idCol), col("__tk"), explode_outer(starts).as("chunk_start"))
      .filter(col("chunk_start").isNotNull)
      .select(col(idCol),
        (col("chunk_start") / stride).cast(LongType).as("chunk_id"),
        col("chunk_start").cast(LongType).as("chunk_start"),
        size(chunk).cast(LongType).as("n_chunk_tokens"),
        array_join(chunk, " ").as("chunk_text"))
  }

  /** Per-group exact quality floor: drop the lowest `dropFrac` fraction
    * of each group — the per-domain calibrated filter real curation
    * pipelines run instead of one global threshold (a cutoff that is
    * right for web text guts a code or CJK domain). The cut is
    * rank-based and total-ordered (score asc, id asc; exactly
    * floor(dropFrac·n) rows drop per group), so it reproduces bit for
    * bit cross-engine — no quantile interpolation, no float thresholds.
    *
    * Returns the slim survivor frame (id, group, score, rank_in_group);
    * callers semi-join bodies back by id — only the slim projection is
    * ever sorted. Scale shape: one shuffle on the group key + a
    * per-group sort of slim rows; at 100 TB the same contract holds
    * (bodies never move), and a deployment wanting to avoid the full
    * sort swaps the exact rank for a KLL threshold (q114) at the cost
    * of the bit-exact gate.
    */
  def qualityFloor(df: DataFrame, idCol: String, groupCol: String,
      scoreCol: String, dropFrac: Double): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac < 1.0,
      s"dropFrac must be in [0, 1); got $dropFrac")
    import org.apache.spark.sql.expressions.Window
    val rk = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol), col(idCol))
    val grp = Window.partitionBy(col(groupCol))
    df.select(col(idCol), col(groupCol), col(scoreCol))
      .withColumn("__rk", row_number().over(rk))
      .withColumn("__n", count(lit(1)).over(grp))
      .filter(col("__rk") > floor(lit(dropFrac) * col("__n")))
      .select(col(idCol), col(groupCol), col(scoreCol),
        col("__rk").cast(LongType).as("rank_in_group"))
  }

  /** Greedy per-group token-budget selection: order each group by
    * (score desc, id asc), keep the prefix whose running token sum stays
    * within `budget` — the "best N tokens per domain" mixing step that
    * turns corpus + mixture weights into an actual training set. The
    * prefix rule (a doc that overshoots ends its group's intake) is
    * deterministic and engine-portable; running sums are exact BIGINTs.
    *
    * Returns (id, group, tokens, cum_tokens) for the selected prefix;
    * same slim-frame contract and scale shape as [[qualityFloor]].
    */
  def tokenBudgetSelect(df: DataFrame, idCol: String, groupCol: String,
      scoreCol: String, tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive; got $budget")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(groupCol), col(scoreCol), col(tokensCol))
      .withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col(groupCol), col(tokensCol), col("cum_tokens"))
  }

  /** The published Gopher/C4 quality-rule battery (Rae et al. 2021,
    * Appendix A "MassiveWeb" filters; Raffel et al. 2020 §2.2) as ONE
    * map-only scan — every rule an INTEGER/exact predicate (fractions
    * compare by cross-multiplication, never float division), each
    * rule's pass/fail surfaced per doc next to its counters:
    *
    *  - `r_word_count`:    minWords ≤ n_words ≤ maxWords   (Gopher 50…100k)
    *  - `r_mean_word_len`: 3·n_words ≤ Σ word chars ≤ 10·n_words
    *  - `r_symbol_ratio`:  10·(#'#' + #'...' + #'…') ≤ n_words  (≤ 0.1)
    *  - `r_bullet_lines`:  10·bullet-start lines ≤ 9·n_lines    (≤ 90%)
    *  - `r_ellipsis_lines`: 10·ellipsis-end lines ≤ 3·n_lines   (≤ 30%)
    *  - `r_alpha_words`:   5·words-with-a-letter ≥ 4·n_words    (≥ 80%)
    *  - `r_stopwords`:     ≥ 2 distinct of Gopher's 8 stop words
    *  - `r_dup_lines`:     10·(n_lines − distinct lines) ≤ 3·n_lines
    *
    * `keep` is their conjunction. Deviations from the papers, documented:
    * words are the whitespace-lowered [[graft.functions.TextFunctions.tokens]]
    * (punctuation stays attached — both engines agree exactly, where the
    * papers' detached-punct words would need a tokenizer the oracle
    * can't bit-match); bullets are `-`/`*`/`•` after left-trim; the
    * duplicate-line fraction counts every repeat occurrence beyond the
    * first, all lines included. Zero shuffle: one codegen'd projection.
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L,
      stopwords: Seq[String] = Seq("the", "be", "to", "of", "and", "that",
        "have", "with")): DataFrame = {
    val text = col(textCol)
    val tk = tokens(text)
    val lines = split(text, "\n")
    val counted = df.select(
      col(idCol),
      size(tk).cast(LongType).as("n_words"),
      aggregate(tk, lit(0L), (a, x) => a + length(x)).as("n_word_chars"),
      (regexp_count(text, lit("#")) + regexp_count(text, lit("\\.\\.\\.")) +
        regexp_count(text, lit("…"))).cast(LongType).as("n_symbols"),
      size(lines).cast(LongType).as("n_lines"),
      size(filter(lines, l =>
        substring(ltrim(l), 1, 1).isin("-", "*", "•")))
        .cast(LongType).as("n_bullet_lines"),
      size(filter(lines, l =>
        rtrim(l).endsWith("...") || rtrim(l).endsWith("…")))
        .cast(LongType).as("n_ellipsis_lines"),
      (size(lines) - size(array_distinct(lines)))
        .cast(LongType).as("n_dup_lines"),
      size(filter(tk, x => x.rlike("[a-z]")))
        .cast(LongType).as("n_alpha_words"),
      size(array_intersect(tk, typedLit(stopwords)))
        .cast(LongType).as("n_stopwords"))
    counted.select(
      (counted.columns.map(col) ++ Seq(
        col("n_words").between(minWords, maxWords).as("r_word_count"),
        (lit(3L) * col("n_words") <= col("n_word_chars") &&
          col("n_word_chars") <= lit(10L) * col("n_words"))
          .as("r_mean_word_len"),
        (lit(10L) * col("n_symbols") <= col("n_words")).as("r_symbol_ratio"),
        (lit(10L) * col("n_bullet_lines") <= lit(9L) * col("n_lines"))
          .as("r_bullet_lines"),
        (lit(10L) * col("n_ellipsis_lines") <= lit(3L) * col("n_lines"))
          .as("r_ellipsis_lines"),
        (lit(5L) * col("n_alpha_words") >= lit(4L) * col("n_words"))
          .as("r_alpha_words"),
        (col("n_stopwords") >= 2L).as("r_stopwords"),
        (lit(10L) * col("n_dup_lines") <= lit(3L) * col("n_lines"))
          .as("r_dup_lines"))): _*)
      .withColumn("keep",
        col("r_word_count") && col("r_mean_word_len") &&
          col("r_symbol_ratio") && col("r_bullet_lines") &&
          col("r_ellipsis_lines") && col("r_alpha_words") &&
          col("r_stopwords") && col("r_dup_lines"))
  }

  /** The published Gopher REPETITION filters (Rae et al. 2021, Table A1
    * — the half [[gopherRules]] doesn't cover), every threshold an exact
    * integer cross-multiplication:
    *
    *  - `r_dup_paras`:       duplicate-paragraph fraction ≤ 30%
    *  - `r_dup_para_chars`:  duplicate-paragraph CHARACTER fraction ≤ 20%
    *  - `r_dup_line_chars`:  duplicate-line CHARACTER fraction ≤ 20%
    *  - `r_top{2,3,4}gram`:  characters in the MOST FREQUENT word
    *                         n-gram ≤ 20% / 18% / 16% of word chars
    *  - `r_dup{5..10}gram`:  characters covered by ANY duplicated word
    *                         n-gram ≤ 15/14/13/12/11/10% of word chars
    *
    * Exact-arithmetic definitions (documented deviations from the
    * paper's prose, identical in both engines): words are the
    * whitespace-lowered tokens and char totals are WORD chars
    * (separators excluded); paragraphs split on a literal blank line
    * (`\n\n`); duplicate line/paragraph characters count occurrences
    * BEYOND THE FIRST of each repeated value (the redundant bytes); the
    * top-n-gram rule scores `count · gramWordChars` even when the top
    * count is 1 (the paper's wording — no duplication requirement); the
    * duplicate-n-gram coverage is the UNION of covered word positions
    * (overlapping duplicated windows never double-count a word — the
    * published reference implementations' `taken[]` semantics, here as
    * a distinct-positions join, engine-portable).
    *
    * Scale shape (r21 rewrite): every repetition rule is a function of
    * ONE document, so the whole battery evaluates as per-doc array
    * folds inside a single projection — zero shuffles beyond the
    * width-pinning id-hash repartition (the old form exploded the
    * n-gram windows into corpus × 9-windows frames and resolved the
    * argmax/duplicate questions with 8 exchanges + 2 window sorts; at
    * any scale those shuffles moved data that never needed to leave
    * its document). The 2..4-gram argmax keeps the gram STRING (the
    * published tie-break is lexicographic); the 5..10-gram coverage
    * works on int64 xxhash64 keys (collision ≈ windows²/2⁶⁵ per doc,
    * the q105 posture; the string-keyed oracle would catch a merge).
    * Both resolve per doc: sort the doc's window array, fold adjacent
    * runs. A document's work stays O(W log W) in its own word count —
    * the old form gathered each doc's windows onto one task at the
    * (id, n) window step anyway, so the worst-case single-doc bound is
    * unchanged while the all-doc shuffles are gone.
    *
    * Codegen (r22): the folds run as native compiled expressions
    * ([[graft.plans.GopherRepStats]]/[[graft.plans.DupValueStats]] —
    * one static call per row inside whole-stage codegen). The r21 form
    * expressed the same folds as `aggregate`/`transform` higher-order
    * functions, which are CodegenFallback: every doc paid the
    * interpreted expression evaluator (plus an O(dups²) accumulator in
    * the coverage fold) — at scale the per-row interpreter was the new
    * ceiling once the shuffles were gone. Results are identical
    * (GopherFoldsSpec checks cell-for-cell against an independent
    * reference; the oracle re-gates q168/q199/q202), with one
    * strictly-tighter detail: duplicate 5..10-gram detection compares
    * windows EXACTLY instead of by variadic xxhash64 of token hashes —
    * identical output modulo 64-bit collisions, which only the exact
    * form cannot suffer.
    */
  def gopherRepetition(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val text = col(textCol)
    // RANGE repartition + local sort on the RAW input: (a) pins the
    // per-doc folds at full width (single-row-group protection — the
    // corpus parquets scan as one partition), and (b) pre-establishes
    // the (idCol) global ordering the gate queries ask for, so their
    // final orderBy is already satisfied and plans with NO exchange —
    // a range exchange ABOVE the fold would run the fold TWICE (range
    // boundary sampling evaluates the child an extra time; measured as
    // a full duplicate 25 s-task-time stage at sf0.1). The three fold
    // structs are extracted in a SEPARATE projection (CollapseProject
    // leaves multi-reference non-trivial aliases alone).
    val joined = df
      .repartitionByRange(df.sparkSession.sparkContext.defaultParallelism,
        col(idCol))
      .sortWithinPartitions(col(idCol))
      .select(
        col(idCol),
        graft.plans.GopherRepStats(tokens(text)).as("__o"),
        graft.plans.DupValueStats(split(text, "\n\n")).as("__p"),
        graft.plans.DupValueStats(split(text, "\n")).as("__l"))
      .select(
        col(idCol),
        col("__o")("n_word_chars").as("n_word_chars"),
        col("__p")("n").as("n_paras"),
        col("__p")("n_dup").as("n_dup_paras"),
        col("__p")("dup_chars").as("dup_para_chars"),
        col("__p")("tot_chars").as("n_para_chars"),
        col("__l")("dup_chars").as("dup_line_chars"),
        col("__l")("tot_chars").as("n_line_chars"),
        col("__o")("top2_chars").as("top2_chars"),
        col("__o")("top3_chars").as("top3_chars"),
        col("__o")("top4_chars").as("top4_chars"),
        col("__o")("dup5_chars").as("dup5_chars"),
        col("__o")("dup6_chars").as("dup6_chars"),
        col("__o")("dup7_chars").as("dup7_chars"),
        col("__o")("dup8_chars").as("dup8_chars"),
        col("__o")("dup9_chars").as("dup9_chars"),
        col("__o")("dup10_chars").as("dup10_chars"))
    // thresholds ×100: chars·100 ≤ t·total (exact at the boundary)
    def frac(chars: String, t: Int, tot: String): Column =
      lit(100L) * col(chars) <= lit(t.toLong) * col(tot)
    joined.select(joined.columns.map(col) ++ Seq(
        (lit(10L) * col("n_dup_paras") <= lit(3L) * col("n_paras"))
          .as("r_dup_paras"),
        frac("dup_para_chars", 20, "n_para_chars").as("r_dup_para_chars"),
        frac("dup_line_chars", 20, "n_line_chars").as("r_dup_line_chars"),
        frac("top2_chars", 20, "n_word_chars").as("r_top2gram"),
        frac("top3_chars", 18, "n_word_chars").as("r_top3gram"),
        frac("top4_chars", 16, "n_word_chars").as("r_top4gram"),
        frac("dup5_chars", 15, "n_word_chars").as("r_dup5gram"),
        frac("dup6_chars", 14, "n_word_chars").as("r_dup6gram"),
        frac("dup7_chars", 13, "n_word_chars").as("r_dup7gram"),
        frac("dup8_chars", 12, "n_word_chars").as("r_dup8gram"),
        frac("dup9_chars", 11, "n_word_chars").as("r_dup9gram"),
        frac("dup10_chars", 10, "n_word_chars").as("r_dup10gram")): _*)
      .withColumn("keep",
        col("r_dup_paras") && col("r_dup_para_chars") &&
          col("r_dup_line_chars") && col("r_top2gram") &&
          col("r_top3gram") && col("r_top4gram") && col("r_dup5gram") &&
          col("r_dup6gram") && col("r_dup7gram") && col("r_dup8gram") &&
          col("r_dup9gram") && col("r_dup10gram"))
  }

  /** CORPUS-WIDE paragraph dedup — the CCNet recipe (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    * Data", §3 dedup stage), the cross-document complement of the
    * WITHIN-doc duplicate-line rules ([[gopherRules]]/[[gopherRepetition]]
    * gate a doc; this REWRITES the corpus): every doc splits into
    * paragraphs on a blank line, each paragraph keys on its NORMALIZED
    * form — lowercased, every digit run replaced by the `0` placeholder,
    * so boilerplate differing only by counters/dates/ids dedups — and of
    * all occurrences corpus-wide only the FIRST survives, first = least
    * (doc, position) in deterministic total order. Documented deviation
    * from the paper: the Unicode-punctuation/accent strip is omitted
    * (engine-portable Unicode character classes are not — the q167
    * tokenizer precedent); digit-placeholder + lowercase is the
    * load-bearing part of the normalization.
    *
    * Returns per doc: `n_paras`, `n_kept`, and `text_clean` (surviving
    * paragraphs re-joined in original order with the blank-line
    * separator; empty when every paragraph first appeared elsewhere).
    *
    * Scale shape: paragraphs ship ONCE into a (key → min (doc, pos))
    * aggregation whose output is distinct-paragraph-sized (map-side
    * combined); the winner frame joins back SLIM on the int64 key —
    * paragraph bodies never ride the second shuffle — and reconstruction
    * is one per-doc array fold. Keys are xxhash64 of the normalized
    * paragraph (the q105 int64-key posture: collision ≈ n²/2⁶⁵; the
    * string-keyed oracle would catch a merge).
    */
  /** @param sep the paragraph separator (regex). The default `\n\n` is
    *   the plain-text convention; pipelines running AFTER a line-rejoin
    *   stage (e.g. [[c4Rules]], whose `text_clean` joins kept lines with
    *   a single newline) pass `\n` — which is also CCNet's actual unit:
    *   in WET extractions a "paragraph" IS a line (Wenzek et al. 2020).
    */
  def corpusParagraphDedup(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n\n"): DataFrame = {
    val paras = df
      .select(col(idCol),
        posexplode(split(col(textCol), sep)).as(Seq("pos", "para")))
      .withColumn("__h", xxhash64(
        regexp_replace(lower(col("para")), "[0-9]+", "0")))
    // first occurrence corpus-wide: min (doc, pos) per normalized key —
    // slim (key, winner) frame, never the bodies
    val winners = paras
      .groupBy(col("__h"))
      .agg(min(struct(col(idCol).as("d"), col("pos").as("p"))).as("w"))
      .select(col("__h"), col("w.d").as("__wdoc"), col("w.p").as("__wpos"))
    paras.join(winners, Seq("__h"))
      .withColumn("__keep",
        col(idCol) === col("__wdoc") && col("pos") === col("__wpos"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("__keep"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__keep"), struct(col("pos"), col("para"))))),
            x => x("para")),
          sep).as("text_clean"))
  }

  /** Dataset release DIFF ledger — the versioning primitive a corpus
    * release pipeline needs between two editions (what the lake's MVCC
    * time travel exposes as versions, this compares as DATA): a full
    * outer join on the primary key classifies every row as `added`
    * (new key), `removed` (key gone), `changed` (key present in both,
    * any content column differs — compared via xxhash64 over the
    * canonical struct, so wide rows diff without shipping both copies
    * through the join twice), or `unchanged`. Training pipelines diff
    * releases to re-process exactly the delta (and to audit that a
    * "minor" release didn't silently rewrite half the corpus).
    *
    * Returns the NON-unchanged rows: (pk, status) — the delta ledger;
    * count the statuses downstream for the audit summary. Hash compare
    * means a 2⁻⁶⁴ collision reads as unchanged (the q105 posture —
    * callers wanting certainty re-verify the `changed` set by value).
    *
    * Scale shape: each side reduces to (pk, hash) before the join — one
    * slim shuffle per side, bodies never move; the join is pk-keyed
    * (co-partitioned when both editions share the lake's clustering).
    */
  def datasetDiff(a: DataFrame, b: DataFrame, pkCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "datasetDiff needs content columns")
    // Spark's hash expressions SKIP null struct fields without perturbing
    // the running seed, so ('x', null) and (null, 'x') would hash equal —
    // a deterministic false "unchanged", not the documented 2⁻⁶⁴
    // collision. Interleaving each column's isNull flag (never null
    // itself) restores positional sensitivity: a value moving between
    // adjacent nullable columns now changes the hash.
    def slim(df: DataFrame, side: String): DataFrame =
      df.select(col(pkCol),
        xxhash64(struct(
          contentCols.flatMap(c => Seq(col(c).isNull, col(c))): _*))
          .as(s"__h$side"))
    slim(a, "A").join(slim(b, "B"), Seq(pkCol), "full_outer")
      .withColumn("status",
        when(col("__hA").isNull, "added")
          .when(col("__hB").isNull, "removed")
          .when(col("__hA") =!= col("__hB"), "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .select(col(pkCol), col("status"))
  }

  /** Nested subset manifests — the hash-threshold sampling that makes a
    * corpus release SHIP ITS OWN ABLATION LADDER (the FineWeb release
    * convention: sample-10BT ⊂ sample-100BT ⊂ sample-350BT; every
    * scaling-law suite needs subsets where the smaller corpus is a
    * strict subset of the larger, so a scale comparison never confounds
    * data composition with data quantity): a doc belongs to subset `c`
    * iff its [[hashBucket]] (md5-derived, basis points of 10000) falls
    * below c's cut — cuts are monotone, so nesting is STRUCTURAL, not
    * sampled; adding docs never reshuffles existing membership
    * (extension-stable, the hash-split property).
    *
    * Returns one ledger row per subset level: (level, cut_bp,
    * n_docs, weight_mass) with CUMULATIVE counts — level k's numbers
    * include every smaller level, which is the nesting made visible.
    *
    * Scale shape: one scan bins each doc to its smallest containing
    * tier (pure projection), one tiny groupBy, cumulative sums over the
    * tier-domain-sized frame. Bodies never move.
    */
  def nestedSubsets(df: DataFrame, idCol: String, weightCol: String,
      cuts: Seq[(String, Long)]): DataFrame = {
    require(cuts.nonEmpty && cuts.map(_._2) == cuts.map(_._2).sorted &&
      cuts.map(_._2).distinct.size == cuts.size,
      s"cuts must be strictly increasing basis points: $cuts")
    require(cuts.last._2 <= 10000L, s"cuts are basis points of 10000: $cuts")
    import org.apache.spark.sql.expressions.Window
    val bucket = hashBucket(col(idCol), 10000)
    // smallest tier containing the doc; docs past the last cut fall out
    // of every subset (a partial ladder is legal)
    val tier = cuts.zipWithIndex.foldRight(lit(-1): Column) {
      case (((_, bp), i), rest) => when(bucket < bp, i).otherwise(rest)
    }
    val perTier = df
      .select(tier.as("__tier"), col(weightCol).cast(LongType).as("__w"))
      .filter(col("__tier") >= 0)
      .groupBy(col("__tier"))
      .agg(count(lit(1)).as("__n"), sum(col("__w")).as("__m"))
    val wCum = Window.orderBy(col("__tier"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val labels = cuts.zipWithIndex
      .map { case ((name, bp), i) => (i, name, bp) }
    val labelDf = df.sparkSession.createDataFrame(labels)
      .toDF("__tier", "level", "cut_bp")
    // the frame is tier-domain-sized — the unpartitioned window is fine
    labelDf.join(perTier, Seq("__tier"), "left")
      .withColumn("n_docs",
        sum(coalesce(col("__n"), lit(0L))).over(wCum))
      .withColumn("weight_mass",
        sum(coalesce(col("__m"), lit(0L))).over(wCum))
      .select(col("level"), col("cut_bp"), col("n_docs"), col("weight_mass"))
  }

  /** Length-bucketed batch planning — the padding-minimization step of
    * sequence batching (the `bucket_by_sequence_length` recipe of the
    * seq2seq stacks; padding-waste analysis per Krell et al. 2021,
    * "Efficient Sequence Packing without Cross-contamination"): sequences
    * batch with SAME-magnitude lengths so the per-batch pad-to-max waste
    * stays bounded, vs. random batching where one long row pads the
    * whole batch.
    *
    *  - bucket  = the length's binary magnitude (⌊log₂ n⌋ + 1 — computed
    *    as `length(bin(n))`, exact in any engine; bucket b ≥ 1 holds
    *    lengths [2^(b−1), 2^b), so max/min length ratio within a batch
    *    is < 2 and padding waste is provably < 50% before measurement;
    *    zero-length rows get their own bucket 0 with efficiency 1.0 —
    *    nothing to pad);
    *  - batch   = consecutive `batchRows` rows within the bucket in
    *    deterministic (md5(id), id) order (hash order, not length order
    *    — batches stay i.i.d. within the bucket, the published caveat
    *    about curriculum bias from globally length-sorted batches);
    *  - ledger  = per batch: rows, min/max/sum lengths, `n_pad_tokens` =
    *    rows·max − sum (the waste materialized padding would cost), and
    *    `efficiency` = sum / (rows·max) — exact integers, ONE IEEE
    *    division (q116 convention). A ragged final batch pads to its own
    *    max over its own rows.
    *
    * Scale shape: only (id, length) tuples move, and the within-bucket
    * rank deliberately does NOT use a bucket-partitioned row_number
    * window — ~60 buckets exist for any realistic length domain, so one
    * bucket would be a single window task holding a corpus-sized slice.
    * Instead the rank is [[Ranking.globalRank]]'s range-sorted
    * zipWithIndex over (bucket, hash, id) — a bucket's rows occupy
    * CONTIGUOUS global ranks, so within-bucket rank = global rank minus
    * the bucket's exclusive prefix count (a ≤63-row broadcast) — the
    * q145 rank discipline. The (bucket, batch) ledger aggregation
    * map-side combines. Bodies never shuffle.
    */
  def lengthBucketBatches(df: DataFrame, idCol: String, tokensCol: String,
      batchRows: Long): DataFrame = {
    require(batchRows >= 1, s"batchRows must be >= 1: $batchRows")
    import org.apache.spark.sql.expressions.Window
    val slim = df
      .select(col(idCol), col(tokensCol).cast(LongType).as("__n"))
      // zero-length rows get their OWN bucket 0 rather than polluting
      // bucket 1 (bin(0) = "0" has length 1, which would break the
      // [2^(b−1), 2^b) invariant next to genuine length-1 rows). A
      // filter would be cleaner but a predicate over a derived
      // collection expression pushes into the FileScan's data filters
      // and re-evaluates the tokenize per row — the PlanShapeSpec trap.
      .withColumn("bucket",
        when(col("__n") <= 0L, lit(0L))
          .otherwise(length(bin(col("__n"))).cast(LongType)))
      .withColumn("__hk", md5(col(idCol).cast(StringType)))
    val ranked = Ranking.globalRank(slim,
      Seq(col("bucket"), col("__hk"), col(idCol)), "__gr")
    // exclusive prefix counts per bucket: the frame is bucket-domain-
    // sized (≤ 63 rows), so the unpartitioned window is a non-issue
    val offs = slim.groupBy(col("bucket"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off",
        coalesce(sum(col("__c")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("__off"))
    ranked.join(broadcast(offs), Seq("bucket"))
      .withColumn("__rn", col("__gr") - col("__off"))
      .withColumn("batch_id", expr(s"(__rn - 1) div ${batchRows}L"))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("__n")).as("min_tokens"),
        max(col("__n")).as("max_tokens"),
        sum(col("__n")).as("sum_tokens"))
      .withColumn("n_pad_tokens",
        col("n_rows") * col("max_tokens") - col("sum_tokens"))
      // bucket 0 (all-zero-length batches) has nothing to pad: its
      // efficiency is 1.0 by definition, not 0/0
      .withColumn("efficiency",
        when(col("max_tokens") > 0L,
          col("sum_tokens").cast(DoubleType) /
            (col("n_rows") * col("max_tokens")))
          .otherwise(lit(1.0d)))
  }

  /** The C4 PAGE-CLEANING rule battery (Raffel et al. 2020, "Exploring
    * the Limits of Transfer Learning with a Unified Text-to-Text
    * Transformer", §2.2) — the half of the published C4 recipe that
    * [[gopherRules]] (Gopher quality) and [[c4SpanDedup]] (the
    * cross-document span dedup) do not cover. Line-level rules (a failing
    * line is REMOVED, the page survives):
    *
    *  - `terminal punctuation`: only lines whose last non-whitespace
    *    char is `.` `!` `?` or `"` are retained;
    *  - `min words`: only lines with ≥ `minLineWords` whitespace words;
    *  - `javascript`: any line containing the word "javascript" is
    *    removed (case-insensitive).
    *
    * Page-level rules (a failing page is DROPPED — `keep = false`):
    *
    *  - `lorem ipsum`: the page contains the phrase anywhere;
    *  - `curly brace`: the page contains `{` (code, not prose);
    *  - `bad words`: any lowered whitespace token of the page is on the
    *    `badWords` list;
    *  - `min sentences`: the RETAINED text has ≥ `minSentences`
    *    sentences.
    *
    * Documented deviations (identical in both engines, the q167
    * precedent): "word" is a lowered whitespace token (the paper's
    * langdetect/nltk tokenization is not engine-portable); the
    * javascript/lorem-ipsum tests are substring matches on the lowered
    * line/page; sentences are counted as terminal-punctuation marks
    * (`[.!?]`) in the retained text rather than nltk sentence spans; the
    * published bad-words list is replaced by a caller-supplied
    * placeholder (the list itself is a config, not an algorithm).
    *
    * Returns per doc: the line/sentence counters, one flag per rule
    * (`f_*` page rules, counter columns for line rules), `keep`, and
    * `text_clean` (the retained lines re-joined; pages that fail a
    * page-level rule keep their cleaned text for audit, `keep` is the
    * verdict). Pure per-doc projection — zero shuffle, the
    * [[gopherRules]] scale shape.
    */
  def c4Rules(df: DataFrame, idCol: String, textCol: String,
      minLineWords: Long = 5L, minSentences: Long = 3L,
      badWords: Seq[String] = Seq("badword1", "badword2")): DataFrame = {
    val text = col(textCol)
    val lines = split(text, "\n")
    def lineWords(l: Column): Column =
      size(filter(split(lower(trim(l)), "\\s+"), t => t =!= ""))
    def endsTerminal(l: Column): Column = {
      val t = rtrim(l)
      t.endsWith(".") || t.endsWith("!") || t.endsWith("?") ||
        t.endsWith("\"")
    }
    def hasJs(l: Column): Column = lower(l).contains("javascript")
    def keptLine(l: Column): Column =
      lineWords(l) >= minLineWords && endsTerminal(l) && !hasJs(l)
    val counted = df.select(
      col(idCol),
      size(lines).cast(LongType).as("n_lines"),
      size(filter(lines, l => keptLine(l))).cast(LongType).as("n_kept_lines"),
      size(filter(lines, l => lineWords(l) < minLineWords))
        .cast(LongType).as("n_short_lines"),
      size(filter(lines, l => !endsTerminal(l)))
        .cast(LongType).as("n_unpunct_lines"),
      size(filter(lines, l => hasJs(l))).cast(LongType).as("n_js_lines"),
      lower(text).contains("lorem ipsum").as("f_lorem"),
      text.contains("{").as("f_brace"),
      // the tokens are lowered, so the list must be too — a mixed-case
      // blocklist entry would otherwise never match and silently disable
      // the rule
      (size(array_intersect(tokens(text),
        typedLit(badWords.map(_.toLowerCase)))) > 0)
        .as("f_bad_words"),
      array_join(filter(lines, l => keptLine(l)), "\n").as("text_clean"))
    counted
      .withColumn("n_sentences",
        regexp_count(col("text_clean"), lit("[.!?]")).cast(LongType))
      .withColumn("r_min_sentences", col("n_sentences") >= minSentences)
      .withColumn("keep",
        !col("f_lorem") && !col("f_brace") && !col("f_bad_words") &&
          col("r_min_sentences"))
  }

  /** The C4 THREE-SENTENCE-SPAN corpus dedup (Raffel et al. 2020 §2.2:
    * "we discarded all but one of any three-sentence span occurring more
    * than once in the data set") — the cross-document rewrite half of the
    * C4 recipe, at sentence granularity what [[corpusParagraphDedup]] is
    * at paragraph granularity, with the OVERLAP subtlety of
    * [[gopherRepetition]]'s coverage rules: spans overlap (every sentence
    * starts one), so removal is the UNION of sentence positions covered
    * by any duplicated NON-WINNER span occurrence — the winner (least
    * (doc, position) corpus-wide) keeps its sentences unless an
    * overlapping non-winner span in the same doc also covers them.
    *
    * Documented deviations (identical in both engines): sentences are
    * maximal runs ending at a terminal mark — `regexp_extract_all(text,
    * '[^.!?]*[.!?]')`, trimmed — so a trailing fragment with no terminal
    * punctuation is not a sentence (the q167 tokenizer precedent vs the
    * paper's nltk spans); span keys normalize by lowercase only (the
    * corpus-side match C4 describes is exact).
    *
    * Returns per doc: `n_sents`, `n_cut`, and `text_clean` (surviving
    * sentences re-joined with a single space, original order).
    *
    * Scale shape (r21 array form, shared with the incremental fold):
    * the corpus tokenizes ONCE into a per-doc sentence array (eager
    * checkpoint); span keys derive per doc via posexplode + element_at
    * and ride as slim (doc, pos, int64 xxhash64 key) tuples — never the
    * three-sentence strings (the q105/q168 posture; the string-keyed
    * oracle would catch a collision merge); the winner aggregation is
    * distinct-span-sized with map-side combine; cut positions explode
    * ×3 from flagged spans and fold to one per-doc set BEFORE the join
    * back; the rebuild is a map-side indexed array filter — sentence
    * bodies never enter a shuffle at all.
    */
  /** The C4 span rules' sentence extraction: maximal `[^.!?]*[.!?]` runs,
    * trimmed. ONE definition shared by [[c4SpanDedup]] and the
    * incremental fold ([[graft.streaming.DedupIndex.spanDedupBatch]]) —
    * the fold's batching-independence proof requires both to segment
    * identically, so the regex must not be editable in one place only.
    */
  private[graft] def c4SentenceArr(text: Column): Column =
    transform(regexp_extract_all(text, lit("[^.!?]*[.!?]"), lit(0)),
      s => trim(s))

  /** The C4 span KEY: xxhash64 of the LOWERED space-joined 3-sentence
    * window. The ONE definition shared by the one-shot rule and the
    * incremental fold ([[graft.streaming.DedupIndex.spanDedupBatch]]) —
    * a normalization edit in one copy would quietly invalidate the q176
    * gate's one-shot-equivalence argument.
    */
  private[graft] def c4SpanKey(s0: Column, s1: Column, s2: Column): Column =
    xxhash64(lower(concat_ws(" ", s0, s1, s2)))

  def c4SpanDedup(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // ONE row per doc carrying its sentence ARRAY — span keys derive
    // per doc from the array (element_at over 0..n−3), so the lead
    // window and its doc-keyed exchange disappear entirely, and the
    // final rebuild is a map-side array filter instead of a
    // sentence-row join + collect_list re-aggregation. Docs with zero
    // sentences drop here, as the old posexplode (and the oracle's
    // unnest) dropped them. The eager checkpoint materializes the
    // regex tokenize ONCE for the two consumers (span branch +
    // rebuild); unlike the r18/r19-neutral lead-frame checkpoint this
    // frame is doc-sized, not sentence-row-sized. (r21 rewrite: the
    // lead form ran 5 shuffle exchanges + 2 windows and re-derived the
    // lead frame per branch; this form runs 3 slim exchanges and
    // shuffles sentence bodies zero times.)
    // NOTE no zero-sentence filter here: size(__arr) > 0 referenced
    // before the checkpoint pushes the whole tokenize below the
    // caller's repartition exchange, serializing it on the
    // single-row-group scan task (measured: one 3.1 s task owning the
    // query); the drop applies on the final projection instead, where
    // the checkpointed RDD is a pushdown barrier.
    val docsArr = df
      .select(col(idCol), c4SentenceArr(col(textCol)).as("__arr"))
      .localCheckpoint(true)
    // spans: one per position 0..n−3 as slim (doc, pos, int64 key)
    // rows — posexplode + element_at keeps the key computation in
    // whole-stage codegen (a transform() HOF here is CodegenFallback
    // and evaluated interpreted, measured +0.6 s); sentence bodies
    // never enter a shuffle
    val spans = docsArr
      .select(col(idCol), col("__arr"),
        posexplode(col("__arr")).as(Seq("pos", "sent")))
      .filter(col("pos") <= size(col("__arr")) - 3)
      .select(col(idCol), col("pos"),
        c4SpanKey(col("sent"),
          element_at(col("__arr"), col("pos") + 2),
          element_at(col("__arr"), col("pos") + 3)).as("__h"))
    // duplicated spans only: winner = min (doc, pos); count > 1 filters
    // the frame to actual duplicates before anything joins back
    val winners = spans
      .groupBy(col("__h"))
      .agg(min(struct(col(idCol).as("d"), col("pos").as("p"))).as("w"),
        count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .select(col("__h"), col("w.d").as("__wdoc"), col("w.p").as("__wpos"))
    // union coverage: every position under a duplicated NON-winner span,
    // folded to ONE row per doc (collect_set ≡ the old distinct — the
    // rebuild below reads membership only)
    val cuts = spans.join(winners, Seq("__h"))
      .filter(!(col(idCol) === col("__wdoc") && col("pos") === col("__wpos")))
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + 2)).as("pos"))
      .groupBy(col(idCol))
      .agg(collect_set(col("pos")).as("__cuts"))
    docsArr.filter(size(col("__arr")) > 0)
      .join(cuts, Seq(idCol), "left")
      .withColumn("__cuts",
        coalesce(col("__cuts"), array().cast("array<int>")))
      .select(col(idCol),
        size(col("__arr")).cast(LongType).as("n_sents"),
        size(col("__cuts")).cast(LongType).as("n_cut"),
        array_join(
          filter(col("__arr"),
            (s, i) => !array_contains(col("__cuts"), i)),
          " ").as("text_clean"))
  }
}
