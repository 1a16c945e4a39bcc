package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora.
  *
  * Scale design (the part that matters at 100 TB):
  *   - exact dedup is one hash-shuffle on the fingerprint — the only full
  *     shuffle in the family, and it moves only (fingerprint, id) pairs,
  *     not document bodies.
  *   - MinHash LSH never builds the quadratic pair space: docs are bucketed
  *     by band signature (shuffle keyed on the signature), and only
  *     same-bucket pairs are generated. Bucket width (rows per signature)
  *     bounds the blowup; skew-prone signatures can be salted or capped.
  *   - verification joins shingle sets only for candidate pairs.
  */
object Dedup {

  /** Exact dedup on normalized content: one row per fingerprint with the
    * representative (min id) and the duplicate count.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(contentFingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-document MinHash signature (md5 family), `numHashes` elements. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleN: Int = 2): DataFrame = {
    val sh = shingleSet(col(textCol), shingleN)
    val sigs = (0 until numHashes).map(j => minhashMd5(sh, j).as(s"mh$j"))
    df.select((col(idCol) +: sigs).toIndexedSeq: _*)
  }

  /** LSH candidate pairs: docs agreeing on a whole band of `rowsPerBand`
    * MinHashes. Returns (band, id1, id2) distinct pairs with id1 < id2.
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int, shingleN: Int = 2): DataFrame = {
    val sh = shingleSet(col(textCol), shingleN)
    val bandSigs = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => minhashMd5(sh, b * rowsPerBand + r))
      concat_ws("#", parts: _*).as(s"band$b")
    }
    val sigDf = df.select((col(idCol) +: bandSigs).toIndexedSeq: _*)
    val exploded = sigDf.select(col(idCol),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), col(s"band$b").as("sig"))): _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"))
      .distinct()
  }

  /** Exact n-gram Jaccard for candidate pairs: joins distinct shingle sets
    * of both sides, counts the intersection, and derives
    * |A∩B| / (|A| + |B| − |A∩B|). Exact integer arithmetic.
    */
  def jaccardVerify(df: DataFrame, candidates: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 2, minJaccard: Double = 0.0): DataFrame = {
    val sets = df.select(col(idCol).as("doc"), shingleSet(col(textCol), shingleN).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val exploded = sets.select(col("doc"), col("n_sh"), explode(col("sh")).as("s"))
    val common = candidates
      .join(exploded.as("x"), col("id1") === col("x.doc"))
      .join(exploded.as("y"), col("id2") === col("y.doc") && col("x.s") === col("y.s"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("common"),
        first(col("x.n_sh")).as("n1"), first(col("y.n_sh")).as("n2"))
    common
      .withColumn("jaccard",
        col("common").cast("double") / (col("n1") + col("n2") - col("common")))
      .filter(col("jaccard") >= minJaccard)
  }

  /** SimHash near-dup keys: 16-bit signature + two 8-bit bands. Documents
    * within Hamming distance 8 share at least one band (pigeonhole), so
    * banding the signature gives candidate buckets without pair explosion.
    */
  def simhashKeys(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sig = simhash16(tokens(col(textCol)))
    df.select(col(idCol), sig.as("simhash"))
      .withColumn("band_hi", shiftright(col("simhash"), 8))
      .withColumn("band_lo", col("simhash") % 256)
  }
}
