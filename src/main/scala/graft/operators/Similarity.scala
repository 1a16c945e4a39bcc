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
    val scored = vectors.crossJoin(broadcast(
        centroids.select(col("cid"), col("cvec"))))
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

  // ---- sign-random-projection (hyperplane) LSH ------------------------------

  /** One sign bit per hyperplane: bit_j = [dot(vec, plane_j) >= 0]. Planes
    * are deterministic Rademacher (±1-component) projections — a seeded
    * formula instead of stored plane vectors, so executors need no
    * broadcast side data and any engine can re-derive the sketch (the
    * DuckDB oracle does). Sequential double fold keeps the dot
    * bit-identical cross-engine.
    */
  def hyperplaneBits(vec: Column, planes: Int): Column =
    array((0 until planes).map { j =>
      val dot = aggregate(
        transform(vec, (x, i) =>
          x * when(pmod(i * lit(19349663L) + lit(j * 73856093L), lit(97L)) < 48,
            lit(1.0d)).otherwise(lit(-1.0d))),
        lit(0.0d), (acc, v) => acc + v)
      when(dot >= 0, lit(1L)).otherwise(lit(0L))
    }: _*)

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
    val withBits = vectors
      .withColumn("__bits", hyperplaneBits(col("vec"), bands * rowsPerBand))
    val banded = withBits.select(
      col("id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          (0 until rowsPerBand).map(r =>
            col("__bits")(b * rowsPerBand + r) * lit(1L << r)).reduce(_ + _)
            .as("bucket"))
      }: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cand = Dedup.bandedCandidatePairs(banded, "id", Seq("band", "bucket"),
      maxBucketSize)
    cand
      .join(vectors.select(col("id").as("id1"), col("vec").as("v1")), Seq("id1"))
      .join(vectors.select(col("id").as("id2"), col("vec").as("v2")), Seq("id2"))
      .withColumn("cos", cosine(col("v1"), col("v2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
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
}
