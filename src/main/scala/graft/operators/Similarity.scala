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

  /** IVF top-k: score only corpus vectors in the query's `nprobe` nearest
    * centroid buckets. `assigned` must carry (id, vec, bucket) for the
    * corpus; queries get their probe buckets from the same centroids and
    * join by bucket — recall grows with nprobe while scored candidates
    * stay ~nprobe/buckets of the corpus.
    */
  def ivfTopK(assigned: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int = 1): DataFrame = {
    val scoredQ = queries.crossJoin(broadcast(
        centroids.select(col("cid"), col("cvec"))))
      .withColumn("dist", l2sq(col("vec"), col("cvec")))
    val wq = Window.partitionBy(col("id")).orderBy(col("dist"), col("cid"))
    val qAssigned = scoredQ.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select(col("id").as("qid"), col("vec").as("qv"), col("cid").as("bucket"))
    val c = assigned.select(col("id").as("cid"), col("vec").as("cv"), col("bucket"))
    val scored = c.join(broadcast(qAssigned), Seq("bucket"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid").as("neighbor"), col("cos"))
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
    val bounded = maxBucketSize match {
      case Some(cap) =>
        val sizes = assigned.groupBy(col("bucket")).agg(count(lit(1)).as("__bucket_n"))
        assigned.join(sizes, Seq("bucket"))
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
}
