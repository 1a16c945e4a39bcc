package graft.operators

import graft.functions.TextFunctions.md5Hash32
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch: the fixed-state frequency summary for heavy-hitter
  * detection over unbounded key domains.
  *
  * Scale design: the sketch is d×m integer cells REGARDLESS of corpus or
  * vocabulary size — the canonical 100 TB shape for "what are the hot
  * keys" when the exact per-key table would itself be huge. Cells are
  * additive (sum-merge), so partial sketches combine map-side and across
  * batches/streams without rescanning history; estimates never
  * underestimate (min over d row counters, each an overcount).
  *
  * Hashing is the engine-portable md5-chunk family (md5Hash32 of the
  * salted key), so counters — and therefore ESTIMATES — reproduce exactly
  * in any engine with md5: the oracle rebuilds the identical sketch.
  */
object CountMin {

  /** Row r's bucket for a key: md5-chunk hash of the salted key mod m. */
  def bucketOf(key: Column, row: Int, m: Int): Column =
    pmod(md5Hash32(concat(key, lit("#cm" + row))), lit(m.toLong))

  /** Sketch cells (r, bucket, cell) from EXACT per-key counts — build the
    * (key, cnt) table first (one exchange, map-side combine), then fold
    * the d salted projections of the small distinct-key table; never
    * explode raw occurrences d times.
    */
  def counters(keyCounts: DataFrame, keyCol: String, cntCol: String,
      d: Int, m: Int): DataFrame = {
    require(d >= 1 && m >= 1, "CountMin needs d >= 1 rows and m >= 1 buckets")
    (0 until d).map { r =>
      keyCounts.select(lit(r).as("r"),
        bucketOf(col(keyCol), r, m).as("bucket"),
        col(cntCol).as("__c"))
    }.reduce(_ union _)
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("__c")).as("cell"))
  }

  /** Cells straight from raw key OCCURRENCES — the streaming/one-pass
    * form: no exact per-key table exists in a stream, so each occurrence
    * contributes 1 to its d cells and ONE aggregation keeps the running
    * sums (chained streaming aggregations are unsupported; this shape is
    * legal under complete/update mode with d×m bounded state). On a batch
    * frame it is cell-identical to [[counters]] over the exact counts.
    */
  def countersFromOccurrences(keys: DataFrame, keyCol: String,
      d: Int, m: Int): DataFrame = {
    require(d >= 1 && m >= 1, "CountMin needs d >= 1 rows and m >= 1 buckets")
    (0 until d).map { r =>
      keys.select(lit(r).as("r"), bucketOf(col(keyCol), r, m).as("bucket"))
    }.reduce(_ union _)
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cell"))
  }

  /** Point estimates for `keys`: min over the d row counters. Keys frame
    * is expected tiny (candidate heavy hitters) → broadcast side of the
    * cell join.
    */
  def estimate(cells: DataFrame, keys: DataFrame, keyCol: String,
      d: Int, m: Int): DataFrame = {
    val probes = (0 until d).map { r =>
      keys.select(col(keyCol),
        lit(r).as("r"), bucketOf(col(keyCol), r, m).as("bucket"))
    }.reduce(_ union _)
    cells.join(broadcast(probes), Seq("r", "bucket"))
      .groupBy(col(keyCol))
      .agg(min(col("cell")).as("cm_est"))
  }
}
