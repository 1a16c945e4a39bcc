package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Scale design: the corpus is the big side and never shuffles for scoring —
  * queries (and centroids) broadcast. Brute force is the exactness baseline;
  * IVF cuts scored candidates by the bucket fraction: the corpus is
  * partitioned once by nearest centroid (a broadcast argmin, no shuffle of
  * vectors beyond the bucket write), and a query scores only its probe
  * bucket(s). On a cluster the bucketed corpus would be written bucketed/
  * sorted by `bucket` so probe joins are co-partitioned scans.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector (brute force).
    * `queries`/`corpus`: (id, vec: array<double>). Output: qid, rank (1..k),
    * neighbor, cos.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("qid"), col("vec").as("qv"))
    val c = corpus.select(col("id").as("cid"), col("vec").as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid").as("neighbor"), col("cos"))
  }

  /** Assign each vector to its nearest centroid (exact L2, ties → lowest
    * centroid id). `centroids`: (cid, cvec). Adds a `bucket` column.
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    // id-hash repartition BEFORE the centroid cross: the argmin window
    // below demands hashpartitioning(id) anyway, so moving the exchange
    // under the scoring (a) ships 1x raw vectors instead of the
    // x|centroids| scored blowup and (b) runs the L2 forest at full
    // width instead of on the corpus parquet's single scan partition
    // (measured: a 0.83 s one-task stage owning q63's critical path).
    // The window then needs only a local sort — the exchange COUNT is
    // unchanged.
    // Width is EXPLICIT deliberately (r22 re-audit): an AQE-coalescible
    // repartition(col("id")) was measured and reverted — AQE coalesces
    // the ~MB-scale bench corpus to one partition and every DOWNSTREAM
    // consumer inherits that width (broadcast probe joins are narrow),
    // so q63's int8 quantize+scoring serialized (isolated steady 1.33
    // -> 2.1 s) while the floor-class callers gained only 0.1-0.2 s of
    // dispatch. At production scale the two forms plan identically
    // (corpus-sized input -> full width either way).
    val scored = vectors
      .repartition(vectors.sparkSession.sparkContext.defaultParallelism,
        col("id"))
      .crossJoin(broadcast(centroids.select(col("cid"), col("cvec"))))
      .withColumn("dist", l2sq(col("vec"), col("cvec")))
    val w = Window.partitionBy(col("id")).orderBy(col("dist"), col("cid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "dist", "cvec")
      .withColumnRenamed("cid", "bucket")
  }

  /** Probe-bucket assignment for queries: each query's `nprobe` nearest
    * centroids (exact L2, ties → lowest cid) → (qid, qv, bucket) rows.
    */
  private def probeBuckets(queries: DataFrame, centroids: DataFrame,
      nprobe: Int): DataFrame = {
    val scoredQ = queries.crossJoin(broadcast(
        centroids.select(col("cid"), col("cvec"))))
      .withColumn("dist", l2sq(col("vec"), col("cvec")))
    val wq = Window.partitionBy(col("id")).orderBy(col("dist"), col("cid"))
    scoredQ.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select(col("id").as("qid"), col("vec").as("qv"), col("cid").as("bucket"))
  }

  /** Public probe surface for index-on-lake callers (q143): each query's
    * `nprobe` nearest centroid buckets as (qid, qv, bucket) — collect the
    * distinct buckets to plan a partition-pruned read of a bucket-
    * partitioned index table.
    */
  def probeAssignments(queries: DataFrame, centroids: DataFrame,
      nprobe: Int): DataFrame = probeBuckets(queries, centroids, nprobe)

  /** IVF top-k: score only corpus vectors in the query's `nprobe` nearest
    * centroid buckets. `assigned` must carry (id, vec, bucket) for the
    * corpus; queries get their probe buckets from the same centroids and
    * join by bucket — recall grows with nprobe while scored candidates
    * stay ~nprobe/buckets of the corpus.
    */
  def ivfTopK(assigned: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int = 1): DataFrame = {
    val qAssigned = probeBuckets(queries, centroids, nprobe)
    val c = assigned.select(col("id").as("cid"), col("vec").as("cv"), col("bucket"))
    val scored = c.join(broadcast(qAssigned), Seq("bucket"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid").as("neighbor"), col("cos"))
  }

  /** IVF top-k scored ENTIRELY in the int8 code domain — the memory-cut
    * search path: the corpus side reduces to 1-byte codes
    * ([[graft.functions.VectorFunctions.quantizeInt8Bytes]]) before the
    * probe join, so what an executor holds (and what a prebuilt index
    * would store) is 4x smaller than fp32, 8x smaller than the double
    * working form. Per-vector symmetric scales cancel in cosine, so no
    * scale column travels either — scoring inputs are codes alone, and
    * quantized scores are exact int64/IEEE arithmetic any engine
    * reproduces bit-for-bit.
    *
    * Probing stays fp (centroids are tiny and broadcast); only bucket
    * scoring — the corpus-sized work — is quantized, which is how IVF-PQ
    * style systems split precision too. Output contract matches
    * [[ivfTopK]] with `cos_q` (quantized cosine) as the score; ranks
    * displace from fp ranks only where quantization rounding reorders
    * near-ties.
    */
  def ivfTopKInt8(assigned: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int = 1): DataFrame = {
    val qAssigned = probeBuckets(queries, centroids, nprobe)
      .withColumn("qcode", quantizeInt8Bytes(col("qv"), int8Scale(col("qv"))))
      .drop("qv")
    val c = assigned.select(col("id").as("cid"),
      quantizeInt8Bytes(col("vec"), int8Scale(col("vec"))).as("ccode"), col("bucket"))
    val scored = c.join(broadcast(qAssigned), Seq("bucket"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("cos_q", cosineInt8(col("qcode"), col("ccode")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_q").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid").as("neighbor"), col("cos_q"))
  }

  /** Embedding near-duplicate pairs: same-bucket pairs above a cosine
    * threshold (IVF bucket as the blocking key).
    *
    * Skew guard, ON BY DEFAULT: clustered embeddings make centroid buckets
    * hot, and a hot bucket's within-bucket self-join is quadratic — one
    * never-finishing task at corpus scale. Buckets wider than
    * `maxBucketSize` are dropped (they need a finer centroid set, not
    * all-pairs); callers that want exhaustive pairs pass None.
    */
  def embeddingNearDup(assigned: DataFrame, threshold: Double,
      maxBucketSize: Option[Int] = Some(1000)): DataFrame = {
    // window count, not groupBy+join: one exchange, and the frame stays
    // partitioned on the bucket key the pair self-join needs
    val bounded = maxBucketSize match {
      case Some(cap) =>
        val w = Window.partitionBy(col("bucket"))
        assigned.withColumn("__bucket_n", count(lit(1)).over(w))
          .filter(col("__bucket_n") <= cap).drop("__bucket_n")
      case None => assigned
    }
    val a = bounded.select(col("bucket"), col("id").as("id1"), col("vec").as("v1"))
    val b = bounded.select(col("bucket"), col("id").as("id2"), col("vec").as("v2"))
    a.join(b, Seq("bucket")).filter(col("id1") < col("id2"))
      .withColumn("cos", cosine(col("v1"), col("v2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }

  /** SemDeDup-style semantic deduplication: within each centroid cluster
    * a document is SUPPRESSED iff a lower-id member of the same cluster
    * sits at or above the cosine threshold — the arrival-monotone
    * suppression rule the streaming dedup index uses, applied in
    * embedding space. Returns the surviving (id, bucket) rows: detection
    * becomes deletion, as in [[Dedup.keepCanonical]]. The cluster is the
    * blocking key (the published SemDeDup recipe: k-means partitions the
    * embedding space, near-dups are only searched within a cell), and
    * scoring runs in the int8 code domain — `assigned.vec` holds codes —
    * so the working set is 4x smaller than fp32 and the cosine
    * reproduces bit-for-bit in any engine.
    *
    * Skew guard, ON BY DEFAULT and FAIL-OPEN: a cluster wider than
    * `maxBucketSize` skips suppression entirely (every member survives)
    * instead of being dropped. Unlike [[embeddingNearDup]] — a pair
    * DETECTOR, where dropping an oversized bucket just omits candidates —
    * this operator EMITS the corpus, so the cap must bound work without
    * losing documents; an oversized cell needs a larger k, not all-pairs.
    *
    * Scale shape: one window count + one same-bucket self-join, both on
    * the bucket partitioning; the anti-join is on ids only. Materialize
    * `assigned` before calling (it is referenced three times).
    */
  def semanticDedup(assigned: DataFrame, threshold: Double,
      maxBucketSize: Option[Int] = Some(1000)): DataFrame = {
    val inCap = maxBucketSize match {
      case Some(cap) =>
        val w = Window.partitionBy(col("bucket"))
        assigned.withColumn("__bucket_n", count(lit(1)).over(w))
          .filter(col("__bucket_n") <= cap).drop("__bucket_n")
      case None => assigned
    }
    val hi = inCap.select(col("bucket"), col("id"), col("vec").as("__c1"))
    val lo = inCap.select(col("bucket"), col("id").as("__lo"), col("vec").as("__c2"))
    val dup = hi.join(lo, Seq("bucket"))
      .filter(col("__lo") < col("id"))
      .filter(cosineInt8(col("__c1"), col("__c2")) >= threshold)
      .select(col("id")).distinct()
    assigned.join(dup, Seq("id"), "left_anti").select(col("id"), col("bucket"))
  }

  // ---- sign-random-projection (hyperplane) LSH ------------------------------

  /** One sign bit per hyperplane: bit_j = [dot(vec, plane_j) >= 0]. Planes
    * are deterministic Rademacher (±1-component) projections — a seeded
    * formula instead of stored plane vectors, so executors need no
    * broadcast side data and any engine can re-derive the sketch (the
    * DuckDB oracle does). Sequential double fold keeps the dot
    * bit-identical cross-engine.
    */
  def hyperplaneBits(vec: Column, planes: Int): Column =
    // derived from hyperplaneDots so the seeded plane formula lives in
    // exactly one place — a seed edit can never desynchronize the corpus
    // index bits from multiProbeLshTopK's query projections
    transform(hyperplaneDots(vec, planes),
      d => when(d >= 0, lit(1L)).otherwise(lit(0L)))

  /** The per-band (band, bucket) key frame every hyperplane-LSH consumer
    * indexes on — ONE definition of the bucket layout (bit r weights
    * 2^r within its band), shared by [[hyperplaneNearDup]] and
    * [[multiProbeLshTopK]] so the two entry points can never drift onto
    * different index layouts.
    */
  private def hyperplaneBandKeys(vectors: DataFrame, bands: Int,
      rowsPerBand: Int): DataFrame =
    vectors
      .withColumn("__bits", hyperplaneBits(col("vec"), bands * rowsPerBand))
      .select(col("id"), explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          (0 until rowsPerBand).map(r =>
            col("__bits")(b * rowsPerBand + r) * lit(1L << r)).reduce(_ + _)
            .as("bucket"))
      }: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))

  /** Cosine near-duplicate pairs via banded hyperplane LSH — the
    * cosine-space analogue of MinHash banding ([[graft.operators.Dedup]]):
    * `bands` bands of `rowsPerBand` sign bits each; vectors agreeing on ALL
    * bits of at least one band become candidates; exact cosine verifies.
    * P[same band] = (1 - θ/π)^rowsPerBand for angle θ, so more rows per
    * band sharpen precision, more bands recover recall.
    *
    * Scale shape: |corpus| x bands exploded rows, ONE shuffle on
    * (band, bucket); candidate dedup + two id-joins to re-attach vectors
    * for verification. All-pairs never forms outside a bucket, and
    * [[maxBucketSize]] (ON by default) drops degenerate buckets — e.g. the
    * all-zeros bucket that near-origin vectors share — which would
    * otherwise go quadratic in one task.
    */
  def hyperplaneNearDup(vectors: DataFrame, bands: Int, rowsPerBand: Int,
      threshold: Double, maxBucketSize: Option[Int] = Some(1000)): DataFrame = {
    val banded = hyperplaneBandKeys(vectors, bands, rowsPerBand)
    val cand = Dedup.bandedCandidatePairs(banded, "id", Seq("band", "bucket"),
      maxBucketSize)
    cand
      .join(vectors.select(col("id").as("id1"), col("vec").as("v1")), Seq("id1"))
      .join(vectors.select(col("id").as("id2"), col("vec").as("v2")), Seq("id2"))
      .withColumn("cos", cosine(col("v1"), col("v2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }

  /** Per-plane signed projections (the values whose signs
    * [[hyperplaneBits]] takes) — multi-probe needs the MAGNITUDES: a
    * small |dot| means the vector sits close to that hyperplane, so the
    * bucket on the other side of it is the most promising extra probe.
    * Same seeded Rademacher formula and sequential double fold, so any
    * engine re-derives the values bit-for-bit.
    */
  def hyperplaneDots(vec: Column, planes: Int): Column =
    array((0 until planes).map { j =>
      aggregate(
        transform(vec, (x, i) =>
          x * when(pmod(i * lit(19349663L) + lit(j * 73856093L), lit(97L)) < 48,
            lit(1.0d)).otherwise(lit(-1.0d))),
        lit(0.0d), (acc, v) => acc + v)
    }: _*)

  /** Multi-probe sign-LSH top-k search (Lv et al. 2007's multi-probe
    * principle applied to sign-random-projection tables — the FALCONN
    * recipe): each query probes its primary bucket per band PLUS the
    * `probes` buckets obtained by flipping the lowest-|projection| bits,
    * in increasing |projection| order (ties to the lower bit index,
    * deterministic in any engine). Near-boundary vectors land one bit
    * apart from their neighbors; probing across the closest hyperplanes
    * recovers exactly those misses, buying IVF-class recall from the
    * same table WITHOUT more bands (more bands = more index memory;
    * more probes = more query work — the published trade).
    *
    * Candidates from all probed buckets verify by exact cosine; output
    * is top-`k` per query by (cos desc, id) with a 1-based `rank`.
    *
    * Scale shape: the corpus is touched ONCE to build (band, bucket)
    * keys (the q55 sketch); the query probe frame is
    * queries × bands × (probes+1) rows — it BROADCASTS, so candidate
    * generation is a map-side join against the corpus keys, and only
    * the candidate set (bucket-collision-sized) reaches the exact-score
    * join. At lake scale the (band, bucket) keys are the stored index
    * (the q143 layout argument), and probing more buckets reads more
    * bucket files — never the corpus.
    */
  /** Per-query probe buckets with their probe ORDINAL: 0 = the primary
    * band bucket, p ≥ 1 = the bucket with the p-th closest hyperplane
    * bit flipped. (qid, band, ordinal, bucket) — the shared derivation
    * of [[multiProbeLshTopK]] and [[multiProbeLshCandidates]].
    */
  private def multiProbeBuckets(queries: DataFrame, bands: Int,
      rowsPerBand: Int, probes: Int): DataFrame = {
    require(probes >= 0 && probes <= rowsPerBand,
      s"probes must be in [0, rowsPerBand=$rowsPerBand]: $probes")
    require(rowsPerBand <= 52, "2^r must stay exact in the double domain")
    val planes = bands * rowsPerBand
    queries
      .withColumn("__dots", hyperplaneDots(col("vec"), planes))
      .select(col("id").as("qid"), explode(array((0 until bands).map { b =>
        val dts = (0 until rowsPerBand).map(r =>
          element_at(col("__dots"), b * rowsPerBand + r + 1))
        val prim = (0 until rowsPerBand).map(r =>
          when(dts(r) >= 0, lit(1L << r)).otherwise(lit(0L))).reduce(_ + _)
        // bit indices by (|projection|, r) — array_sort on the struct
        // orders by fields left to right
        val order = array_sort(array((0 until rowsPerBand).map(r =>
          struct(abs(dts(r)).as("m"), lit(r).as("r"))): _*))
        // probe p flips the p-th closest plane: prim − 2^r when the bit
        // is set, prim + 2^r when clear (≡ XOR, in arithmetic both
        // engines share; 2^r exact — r ≤ 52 by the require above)
        val flips = (1 to probes).map { p =>
          val o = element_at(order, p)
          val dotAt = element_at(array(dts: _*), o("r") + 1)
          val pow2 = pow(lit(2.0d), o("r")).cast("long")
          prim + when(dotAt >= 0, -pow2).otherwise(pow2)
        }
        struct(lit(b).as("band"), array((prim +: flips): _*).as("bks"))
      }: _*)).as("pb"))
      .select(col("qid"), col("pb.band").as("band"),
        posexplode(col("pb.bks")))
      .select(col("qid"), col("band"), col("pos").as("ordinal"),
        col("col").as("bucket"))
  }

  /** Candidate (qid, id) pairs of the multi-probe bucket join, with the
    * MINIMUM probe ordinal that reaches each pair (`min_probe` = 0 when
    * a primary bucket matches, else the smallest flip ordinal). A
    * probes=p run's candidate set is exactly `min_probe <= p`, so a
    * recall SWEEP over probe levels derives band keys, runs the bucket
    * join, and dedups ONCE instead of once per level — the per-level
    * plans in a union re-execute the whole chain per branch (no
    * cross-branch subtree sharing), which at any scale re-scans the
    * corpus per level.
    */
  def multiProbeLshCandidates(corpus: DataFrame, queries: DataFrame,
      bands: Int, rowsPerBand: Int, probes: Int): DataFrame = {
    val cb = hyperplaneBandKeys(corpus, bands, rowsPerBand)
    val qprobe = multiProbeBuckets(queries, bands, rowsPerBand, probes)
    cb.join(broadcast(qprobe), Seq("band", "bucket"))
      .groupBy(col("qid"), col("id"))
      .agg(min(col("ordinal")).cast("long").as("min_probe"))
  }

  def multiProbeLshTopK(corpus: DataFrame, queries: DataFrame, bands: Int,
      rowsPerBand: Int, probes: Int, k: Int): DataFrame = {
    val cb = hyperplaneBandKeys(corpus, bands, rowsPerBand)
    val qprobe = multiProbeBuckets(queries, bands, rowsPerBand, probes)
      .select(col("qid"), col("band"), col("bucket"))
    val cand = cb.join(broadcast(qprobe), Seq("band", "bucket"))
      .select(col("qid"), col("id")).distinct()
    val scored = cand
      .join(broadcast(queries.select(col("id").as("qid"),
        col("vec").as("qv"))), Seq("qid"))
      .join(corpus.select(col("id"), col("vec").as("cv")), Seq("id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rank"))
  }

  /** One Lloyd (k-means) iteration ENTIRELY in the int8 code domain — the
    * centroid-TRAINING step the IVF index (ivfAssign/ivfTopK) consumes.
    * Assignment distance is an exact integer L2 over codes; the centroid
    * update is a per-(cid, dim) integer sum with ONE final division — no
    * double summation anywhere, so the step reproduces bit-for-bit in any
    * engine (the property that lets the gate verify TRAINING, not just
    * search). Training on codes instead of fp32 is also the 100 TB move:
    * the working set is 4× smaller and the sums never overflow
    * (127 · corpus < 2⁶³ at any realistic scale).
    *
    * Scale shape: one broadcast of the centroid set (k ≤ thousands), one
    * (cid, dim) shuffle of partial sums — map-side combined, so shuffle
    * volume is k·dims regardless of corpus size. Iterate by feeding the
    * rounded means back as the next centroid codes.
    *
    * @return (cid, dim, n_members, code_sum, mean_code)
    */
  def kmeansStepInt8(corpusCodes: DataFrame, centroidCodes: DataFrame): DataFrame = {
    val assigned = ivfAssign(
      corpusCodes.select(col("id"), col("code").as("vec")),
      centroidCodes.select(col("cid"), col("code").as("cvec")))
    assigned
      .select(col("bucket").as("cid"), posexplode(col("vec")).as(Seq("dim", "x")))
      .groupBy(col("cid"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n_members"), sum(col("x")).as("code_sum"))
      .withColumn("mean_code",
        col("code_sum").cast(org.apache.spark.sql.types.DoubleType) / col("n_members"))
  }

  /** D4-style prototypicality pruning (Tirumala et al. 2023, "D4:
    * Improving LLM Pretraining via Document De-Duplication and
    * Diversification"; the pruning rule is Sorscher et al. 2022's
    * "Beyond neural scaling laws" prototypes metric): after clustering,
    * the points CLOSEST to their cluster centroid are the most
    * prototypical — the most redundant with the cluster's mass — so the
    * recipe drops the nearest `dropPercent` of EVERY cluster and keeps
    * the diverse tail. The SemDeDup half of D4 is [[semanticDedup]]
    * (q101); this is the diversification half.
    *
    * Runs entirely in the int8 code domain (the q93 training
    * arithmetic): integer L2 distances are exact, and the cut is a RANK,
    * not a float threshold — kept ⟺ 100·rank > dropPercent·n_cluster by
    * integer cross-multiplication (the q145 rank discipline), so a
    * cluster whose cut lands exactly on a rank boundary compares exactly
    * in any engine. Ties (equal distance) break to the lowest id — the
    * total order every ranked operator here uses.
    *
    * `corpusCodes`: (id, code); `centroidCodes`: (cid, code).
    * Returns (id, bucket, dist, proto_rank, n_cluster, kept).
    *
    * Scale shape: one broadcast of the centroid codes (k ≤ thousands)
    * for the assignment, then one window partitioned BY CLUSTER — the
    * same partitioning the IVF lake layout (q143) already stores, so on
    * a bucketed index table the rank is a per-partition sort with no
    * fresh corpus shuffle; cluster sizes are corpus/k, never the corpus.
    */
  def prototypicalityPrune(corpusCodes: DataFrame, centroidCodes: DataFrame,
      dropPercent: Int): DataFrame = {
    require(dropPercent >= 0 && dropPercent <= 100,
      s"dropPercent must be a percentage: $dropPercent")
    // same exchange placement as ivfAssign: the assign window demands
    // hashpartitioning(id) anyway — moving it below the centroid cross
    // runs the integer-L2 forest full-width instead of on the corpus
    // scan's single partition (measured: a 1.0 s one-task stage owning
    // q170) and ships 1x codes instead of the x|centroids| blowup
    val scored = corpusCodes.select(col("id"), col("code"))
      .repartition(
        corpusCodes.sparkSession.sparkContext.defaultParallelism, col("id"))
      .crossJoin(broadcast(
        centroidCodes.select(col("cid"), col("code").as("ccode"))))
      .withColumn("dist", l2sqInt(col("code"), col("ccode")))
    val wAssign = Window.partitionBy(col("id")).orderBy(col("dist"), col("cid"))
    val assigned = scored.withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("id"), col("cid").as("bucket"), col("dist"))
    val wRank = Window.partitionBy(col("bucket")).orderBy(col("dist"), col("id"))
    val wSize = Window.partitionBy(col("bucket"))
    assigned
      .withColumn("proto_rank", row_number().over(wRank)
        .cast(org.apache.spark.sql.types.LongType))
      .withColumn("n_cluster", count(lit(1)).over(wSize))
      .withColumn("kept",
        lit(100L) * col("proto_rank") >
          lit(dropPercent.toLong) * col("n_cluster"))
  }

  /** Retrieval-QUALITY audit for the IVF path: recall@k of [[ivfTopK]]
    * against the exact brute-force neighbors, per query and probe width.
    * Everything is exact arithmetic (integer hit counts, one final
    * division), so the recall fractions themselves reproduce bit-for-bit
    * in an external engine — quality is oracle-checkable, not just
    * eyeballed. Ground truth excludes self-matches, mirroring ivfTopK's
    * own `cid =!= qid` rule, so the two sides count the same candidates.
    *
    * Scale shape: the brute-force truth is the audit's deliberate cost —
    * run it over a SAMPLE of queries (the `queries` frame), never the
    * corpus; the per-nprobe IVF runs reuse one `assigned` frame (callers
    * should persist it) and the hit join is a left-semi on (qid,
    * neighbor) ids only. Output: (nprobe, qid, n_true, n_hit, recall).
    */
  /** Exact top-k neighbor ids per query (brute-force cosine over the
    * corpus side of `assigned`, self excluded, ties → lowest id) — the
    * ground-truth artifact [[recallAtK]] audits against, exposed so
    * callers can compute it ONCE per corpus snapshot and stage it.
    */
  def exactNeighbors(assigned: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val c = assigned.select(col("id").as("cid"), col("vec").as("cv"))
    val q = queries.select(col("id").as("qid"), col("vec").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid").as("neighbor"))
  }

  def recallAtK(assigned: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nprobes: Seq[Int],
      truthOverride: Option[DataFrame] = None): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    // ground truth is the audit's one expensive artifact (brute force
    // over the corpus) and is immutable for a given corpus snapshot —
    // callers auditing the same snapshot repeatedly pass the staged
    // (qid, neighbor) frame back via truthOverride instead of paying the
    // recompute (k·|queries| id pairs — driver-cacheable by construction)
    val truth = truthOverride
      // staged truth is typically a local literal frame — already
      // materialized, free to read twice, no checkpoint job needed
      .map(_.select(col("qid"), col("neighbor")))
      .getOrElse(exactNeighbors(assigned, queries, k)
        .localCheckpoint(true)) // tiny (k·|queries| ids); read twice below
    val truthCounts = truth.groupBy(col("qid")).agg(count(lit(1)).as("n_true"))
    // ONE scored candidate frame serves every probe level (r22): buckets
    // partition the corpus, so a candidate's bucket holds exactly one
    // rank in its query's centroid ordering (__mp), and level np's
    // ivfTopK candidate set is exactly __mp <= np. The per-level union
    // re-ran the bucket join + cosine scoring once PER level (union
    // branches share no subtrees); now scoring runs once and each level
    // is a filter + rank over the checkpointed (tiny) scored frame —
    // identical ranking semantics (cos desc, neighbor id asc, top k).
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("dist"), col("cid"))
    val qProbe = queries
      .crossJoin(broadcast(centroids.select(col("cid"), col("cvec"))))
      .withColumn("dist", l2sq(col("vec"), col("cvec")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobes.max)
      .select(col("id").as("qid"), col("vec").as("qv"),
        col("cid").as("bucket"), col("rn").as("__mp"))
    val scoredOnce = assigned
      .select(col("id").as("__cid"), col("vec").as("cv"), col("bucket"))
      .join(broadcast(qProbe), Seq("bucket"))
      .filter(col("__cid") =!= col("qid"))
      .select(col("qid"), col("__cid").as("neighbor"),
        cosine(col("qv"), col("cv")).as("cos"), col("__mp"))
      .localCheckpoint(true)
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("neighbor"))
    val hits = nprobes.map { np =>
      scoredOnce.filter(col("__mp") <= np)
        .withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= k)
        .select(lit(np).as("nprobe"), col("qid"), col("neighbor"))
    }.reduce(_ unionAll _)
      .join(truth, Seq("qid", "neighbor"), "left_semi")
      .groupBy(col("nprobe"), col("qid")).agg(count(lit(1)).as("n_hit"))
    // the (nprobe × qid) grid keeps zero-hit queries visible — a missing
    // row would silently overstate recall
    truthCounts.crossJoin(nprobes.toDF("nprobe"))
      .join(hits, Seq("nprobe", "qid"), "left")
      .na.fill(0L, Seq("n_hit"))
      .select(col("nprobe"), col("qid"), col("n_true"), col("n_hit"),
        (col("n_hit").cast(org.apache.spark.sql.types.DoubleType) /
          col("n_true")).as("recall"))
  }

  /** Result of [[kmeansTrainInt8]]: the trained integer centroid codes
    * (driver-resident — k·dims values, the same metadata scale as the
    * centroid broadcast every search path already ships), the number of
    * Lloyd rounds run, the final inertia (exact int64 Σ of assignment
    * distances under the PREVIOUS round's centroids), and whether the
    * movement criterion was met.
    */
  final case class KmeansResult(centroids: Array[(Long, Array[Long])],
      rounds: Int, inertia: Long, converged: Boolean,
      inertiaTrace: Seq[Long]) {
    /** The trained centroids as a (cid, code) frame, ready for
      * [[ivfAssign]]/[[ivfTopK]]/[[ivfTopKInt8]] (alias `code` → `cvec`
      * as those APIs expect).
      */
    def toDF(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      centroids.toSeq.map { case (cid, code) => (cid, code.toSeq) }
        .toDF("cid", "code")
    }
  }

  /** Lloyd iteration TO CONVERGENCE in the int8 code domain — the loop
    * around [[kmeansStepInt8]]'s single step. Integer-constrained Lloyd
    * converges by the classic argument, which survives rounding: for a
    * fixed assignment the per-dim mean rounded to the nearest integer is
    * the OPTIMAL integer centroid (the objective is separable and
    * quadratic), so both half-steps are non-increasing in inertia, and
    * inertia is a non-negative integer — it must hit a fixed point. The
    * loop errors if the monotone invariant is ever violated (a bug, not a
    * data property) and, when `requireConvergence`, if `maxRounds` passes
    * without the movement criterion — the [[Dedup]] connected-components
    * convention.
    *
    * Scale shape, per round: assignment is a MAP-SIDE argmin against a
    * literal centroid array (`array_min` over per-centroid
    * (dist, cid) structs — each distance computed once, ties → lowest
    * cid, matching [[ivfAssign]]) — the corpus never shuffles; the only
    * exchange is the map-side-combined (cid, dim) partial-sum collect,
    * k·dims rows regardless of corpus size, and it doubles as the round's
    * ONE job (inertia rides along, counted once per row at dim 0). The
    * corpus frame is materialized once up front so per-round scans don't
    * re-run its derivation. The literal-array form is right for
    * broadcastable k (thousands); for k beyond plan-literal scale, chain
    * [[kmeansStepInt8]] (DataFrame centroids) instead.
    *
    * `epsilon`: max per-dimension code movement (L∞ over centroids) at or
    * below which the loop declares convergence; 0 = exact fixed point.
    * Empty clusters keep their previous codes (the standard Lloyd rule).
    *
    * `exactRounds`: cross-engine parity mode — run exactly `maxRounds`
    * rounds, stopping early only at a TRUE fixed point (movement 0, where
    * further rounds are idempotent). Plateau detection and the
    * convergence requirement are off: this is the form an unrolled SQL
    * oracle reproduces round for round.
    */
  def kmeansTrainInt8(corpusCodes: DataFrame, initialCentroids: DataFrame,
      maxRounds: Int = 25, epsilon: Long = 0L,
      requireConvergence: Boolean = true,
      exactRounds: Boolean = false): KmeansResult = {
    val corpus = corpusCodes.select(col("id"), col("code")).localCheckpoint(true)
    var cents: Array[(Long, Array[Long])] = initialCentroids
      .select(col("cid"), col("code")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Any](1).map(_.asInstanceOf[Number].longValue()).toArray)
      .sortBy(_._1)
    require(cents.nonEmpty, "kmeansTrainInt8: no initial centroids")
    var round = 0
    var prevInertia = Long.MaxValue
    var lastInertia = 0L
    var converged = false
    val trace = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (round < maxRounds && !converged) {
      round += 1
      val centArr = array(cents.map { case (cid, code) =>
        struct(lit(cid).as("cid"),
          array(code.map(lit(_)): _*).as("ccode")) }: _*)
      val best = array_min(transform(centArr, c => struct(
        graft.functions.VectorFunctions.l2sqInt(col("code"), c.getField("ccode"))
          .as("d"),
        c.getField("cid").as("cid"))))
      val parts = corpus.withColumn("best", best)
        .select(col("best.cid").as("cid"), col("best.d").as("d"),
          posexplode(col("code")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("x").cast("long")).as("s"),
          sum(when(col("dim") === 0, col("d")).otherwise(lit(0L))).as("dsum"))
        .collect()
      lastInertia = parts.iterator
        .filter(_.getAs[Int]("dim") == 0).map(_.getAs[Long]("dsum")).sum
      trace += lastInertia
      if (lastInertia > prevInertia) sys.error(
        s"kmeansTrainInt8: inertia increased $prevInertia -> $lastInertia at " +
          s"round $round — integer-Lloyd monotonicity violated (bug)")
      val byCid = parts.groupBy(_.getAs[Long]("cid"))
      val next = cents.map { case (cid, old) =>
        byCid.get(cid) match {
          case None => (cid, old) // empty cluster: keep codes
          case Some(rows) =>
            val code = old.clone()
            rows.foreach { r =>
              val n = r.getAs[Long]("n")
              code(r.getAs[Int]("dim")) =
                math.floor(r.getAs[Long]("s").toDouble / n + 0.5).toLong
            }
            (cid, code)
        }
      }
      val movement = cents.iterator.zip(next.iterator).map { case ((_, a), (_, b)) =>
        a.iterator.zip(b.iterator).map { case (x, y) => math.abs(x - y) }.max
      }.max
      // plateau (equal inertia, codes still oscillating among co-optimal
      // integer roundings) also terminates — inertia can no longer drop
      converged =
        if (exactRounds) movement == 0L
        else movement <= epsilon || lastInertia == prevInertia
      prevInertia = lastInertia
      if (!converged) cents = next
    }
    corpus.unpersist(false)
    if (!converged && requireConvergence && !exactRounds) sys.error(
      s"kmeansTrainInt8 did not converge in $maxRounds rounds " +
        s"(inertia $lastInertia) — raise maxRounds or epsilon")
    KmeansResult(cents, round, lastInertia, converged, trace.toSeq)
  }

  /** Exact integer L2 distance between subspace `j` of an int8 code array
    * and a literal codeword sub-vector — the building block PQ encode and
    * ADC lookup tables share. One slice + zip_with + fold; all arithmetic
    * exact in Long (max term 254²·subDim ≪ 2⁶³). Deliberately the
    * higher-order-function form: a fully-unrolled element_at sum was
    * MEASURED 2× SLOWER (512 array-access expressions per row defeat
    * common-subexpression elimination on the derived code column and
    * split codegen past JIT-friendly method sizes), while the HOF lambda
    * runs one tight loop over the primitive array.
    */
  private def pqSubDist(code: Column, j: Int, subDim: Int,
      codeword: Seq[Long]): Column =
    aggregate(
      zip_with(slice(code, j * subDim + 1, subDim),
        typedLit(codeword.slice(j * subDim, (j + 1) * subDim)),
        (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, d) => acc + d)

  /** Product-quantization encode: each int8 code vector splits into
    * `subspaces` contiguous sub-vectors; each sub-vector is replaced by
    * the id of its nearest codeword (exact integer L2, ties to the
    * lowest codeword id). `codebook` is (codewordId, full-width code)
    * sorted by id — codewords are corpus rows by convention (the q63
    * frozen-centroid contract), so the book is tiny and travels as plan
    * literals: encoding is ONE codegen'd projection over the corpus — no
    * join, no shuffle, nothing ever collected.
    *
    * This is the 100 TB vector-memory step past int8 (q61): a d=64 int8
    * vector stores 64 bytes; its PQ form stores `subspaces` small ints.
    * At deployment scale the encoded corpus rides in cluster RAM next to
    * the IVF bucket layout (q143) while full vectors stay on disk for
    * optional re-rank.
    */
  def pqEncode(corpusCodes: DataFrame, codebook: Seq[(Long, Seq[Long])],
      subspaces: Int): DataFrame = {
    require(codebook.nonEmpty, "pqEncode needs a non-empty codebook")
    val d = codebook.head._2.length
    require(d % subspaces == 0, s"dim $d not divisible into $subspaces subspaces")
    val subDim = d / subspaces
    val sorted = codebook.sortBy(_._1)
    val perSub = (0 until subspaces).map { j =>
      // argmin via array_min over (dist, cid) structs (lexicographic →
      // ties to the LOWEST codeword id, same as a first-minimum scan of
      // the id-sorted book): references each distance tree ONCE — the
      // array_position(dists, array_min(dists)) form duplicated the
      // whole per-codeword distance array in the plan, doubling
      // optimizer/codegen work on an already-large expression
      array_min(array(sorted.map { case (cwId, cw) =>
        struct(pqSubDist(col("code"), j, subDim, cw).as("d"),
          lit(cwId).as("cid")) }: _*))
        .getField("cid").as(s"__pq$j")
    }
    // non-code columns ride through (the fold path carries `bucket`
    // alongside the codes, so the encoded index needs no id re-join)
    val others = corpusCodes.columns.filter(_ != "code").map(col).toSeq
    corpusCodes.select((others ++ perSub): _*)
      .select((others :+
        array((0 until subspaces).map(j => col(s"__pq$j")): _*).as("pq")): _*)
  }

  /** Asymmetric-distance (ADC) top-k over a PQ-encoded corpus: each query
    * precomputes a lookup table of exact integer L2 distances from its
    * own int8 sub-vectors to every codeword (`subspaces`×`codewords`
    * entries — a plan-literal-sized array per query), and a corpus row's
    * approximate distance is `subspaces` table lookups summed — the
    * corpus side touches only its `pq` codes, never a vector. Queries
    * (with their tables) broadcast; the scan is one codegen'd projection
    * + a per-query top-k window (dist asc, id asc — total-ordered). This
    * is the IVF-PQ scan shape: at 100 TB the same projection runs inside
    * each probed bucket of the q143 layout.
    */
  def pqAdcTopK(encoded: DataFrame, queryCodes: DataFrame,
      codebook: Seq[(Long, Seq[Long])], subspaces: Int, k: Int,
      excludeSelf: Boolean = false): DataFrame = {
    require(codebook.nonEmpty, "pqAdcTopK needs a non-empty codebook")
    val d = codebook.head._2.length
    require(d % subspaces == 0, s"dim $d not divisible into $subspaces subspaces")
    val subDim = d / subspaces
    val sorted = codebook.sortBy(_._1)
    val kw = sorted.size
    val posLit = typedLit(sorted.map(_._1)) // codeword id → LUT position
    // flat LUT: entry j*kw + pos(c) = L2(query sub j, codeword c sub j)
    val lut = flatten(array((0 until subspaces).map { j =>
      array(sorted.map { case (_, cw) =>
        pqSubDist(col("code"), j, subDim, cw) }: _*)
    }: _*))
    val q = queryCodes.select(col("id").as("qid"), lut.as("__lut"))
    val dist = (0 until subspaces).map { j =>
      element_at(col("__lut"),
        (lit(j * kw) +
          array_position(posLit, element_at(col("pq"), j + 1))).cast("int"))
    }.reduce(_ + _)
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))
    val joined = encoded.crossJoin(broadcast(q))
    (if (excludeSelf) joined.filter(col("id") =!= col("qid")) else joined)
      .withColumn("dist", dist)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"), col("dist"), col("rk"))
  }

  /** TRAIN a product-quantization codebook: an independent integer-Lloyd
    * run ([[kmeansTrainInt8]]) PER SUBSPACE over the corpus's contiguous
    * sub-vectors, seeded from `seeds`' sub-slices (same seed rows for
    * every subspace — the q63 corpus-rows-as-seeds convention carries
    * over). This is the published PQ recipe (per-subspace k-means
    * codewords) replacing q154's frozen corpus-row book; everything stays
    * in the exact int8 code domain so an unrolled SQL oracle reproduces
    * the trained book round for round (the q95 precedent, per subspace).
    *
    * The result packs the per-subspace codewords back into FULL-WIDTH
    * rows — codeword id c's packed code is `sub₀(c) ++ sub₁(c) ++ …` —
    * because [[pqEncode]]/[[pqAdcTopK]] slice their codebook per
    * subspace anyway: packing keeps one codebook shape across the frozen
    * and trained paths. Driver-resident and tiny (codewords·dims ints,
    * the centroid-collect precedent); each subspace's training shuffles
    * only k·subDim partial-sum rows per round.
    */
  def pqTrainCodebook(corpusCodes: DataFrame, seeds: DataFrame,
      subspaces: Int, maxRounds: Int,
      exactRounds: Boolean = true): Seq[(Long, Seq[Long])] = {
    val d = corpusCodes.select(col("code")).head.getSeq[Any](0).length
    require(d % subspaces == 0, s"dim $d not divisible into $subspaces subspaces")
    val subDim = d / subspaces
    // one slim (id, all sub-slices) frame materialized once; each
    // subspace's Lloyd loop re-reads its slice without re-deriving codes
    val sliced = corpusCodes.select(
      (col("id") +: (0 until subspaces).map(j =>
        slice(col("code"), j * subDim + 1, subDim).as(s"__s$j"))): _*)
      .localCheckpoint(true)
    val seedSliced = seeds.select(
      (col("cid") +: (0 until subspaces).map(j =>
        slice(col("code"), j * subDim + 1, subDim).as(s"__s$j"))): _*)
    val perSub = (0 until subspaces).map { j =>
      kmeansTrainInt8(
        sliced.select(col("id"), col(s"__s$j").as("code")),
        seedSliced.select(col("cid"), col(s"__s$j").as("code")),
        maxRounds = maxRounds, exactRounds = exactRounds,
        requireConvergence = false)
        .centroids.toMap
    }
    sliced.unpersist(false)
    val ids = perSub.head.keys.toSeq.sorted
    ids.map(c => c -> perSub.flatMap(m => m(c).toSeq))
  }

  /** ADC top-k WITHIN PROBED BUCKETS — the composed IVF-PQ search shape
    * q155 documents: `encoded` is the lake-resident index (id, pq,
    * bucket — q143's partitioned layout with PQ codes instead of
    * vectors), `queryProbes` is (qid, code, bucket) — one row per probed
    * bucket per query ([[probeAssignments]]'s contract in the code
    * domain). Each query precomputes the same per-subspace integer-L2
    * LUT as [[pqAdcTopK]] and broadcasts WITH its probe rows; candidates
    * come from the bucket equi-join — scan cost ∝ probed buckets'
    * rows, never the corpus. Self-matches are excluded (the ivfTopK
    * convention). Ties total-ordered (dist asc, id asc).
    */
  def pqAdcTopKBucketed(encoded: DataFrame, queryProbes: DataFrame,
      codebook: Seq[(Long, Seq[Long])], subspaces: Int, k: Int): DataFrame = {
    require(codebook.nonEmpty, "pqAdcTopKBucketed needs a non-empty codebook")
    val d = codebook.head._2.length
    require(d % subspaces == 0, s"dim $d not divisible into $subspaces subspaces")
    val subDim = d / subspaces
    val sorted = codebook.sortBy(_._1)
    val kw = sorted.size
    val posLit = typedLit(sorted.map(_._1))
    val lut = flatten(array((0 until subspaces).map { j =>
      array(sorted.map { case (_, cw) =>
        pqSubDist(col("code"), j, subDim, cw) }: _*)
    }: _*))
    val q = queryProbes.select(col("qid"), col("bucket"), lut.as("__lut"))
    val dist = (0 until subspaces).map { j =>
      element_at(col("__lut"),
        (lit(j * kw) +
          array_position(posLit, element_at(col("pq"), j + 1))).cast("int"))
    }.reduce(_ + _)
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))
    encoded.join(broadcast(q), Seq("bucket"))
      .filter(col("id") =!= col("qid"))
      .withColumn("dist", dist)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"), col("dist"), col("rk"))
  }

  /** Exact re-rank of ADC candidates — the standard IVF-PQ final step:
    * the lossy ADC scan nominates a top-R shortlist per query; the TRUE
    * integer L2 over full-width codes re-scores only those R rows and
    * emits the exact top-k among them. `candidates` is (qid, id) — the
    * shortlist; full codes are fetched by two id joins against the
    * corpus/query code frames ("full vectors stay on disk": at 100 TB
    * the shortlist join is R·|queries| rows against the code table's id
    * layout, the only time a full vector is touched per query). Ties
    * total-ordered (dist asc, id asc).
    */
  def pqRerankExact(candidates: DataFrame, queryCodes: DataFrame,
      corpusCodes: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))
    candidates.select(col("qid"), col("id"))
      .join(broadcast(queryCodes.select(col("id").as("qid"),
        col("code").as("__qc"))), Seq("qid"))
      .join(corpusCodes.select(col("id"), col("code").as("__cc")), Seq("id"))
      .withColumn("dist", graft.functions.VectorFunctions
        .l2sqInt(col("__qc"), col("__cc")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor"), col("dist"))
  }
}
