package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-drift measurement — pipeline observability in exact
  * integer arithmetic: the total-variation distance between each group's
  * key distribution and a frozen reference, scaled so no division ever
  * happens:
  *
  *   drift_scaled(g) = Σ_k |c_k·N_ref − r_k·N_g|  =  2·TV·N_ref·N_g
  *
  * A drift gate "TV > t" (t = p/q rational) is then the BIGINT
  * comparison `q·Σ > 2·p·N_ref·N_g` — reproducible in any engine, the
  * same no-libm discipline as the perceptron/PageRank family.
  *
  * Scale shape: `counts` is already aggregated (one (group, key) count
  * agg upstream); the reference is ≤|keys| rows and broadcasts; the grid
  * join guarantees a key missing from a group still contributes r_k·N_g
  * and a group-only key contributes c_k·N_ref. The same call runs per
  * micro-batch in foreachBatch against the same frozen reference rows —
  * batch/stream parity is structural (StreamingSpec gates it).
  */
object Drift {

  /** @param counts (`groupCol`, `keyCol`, `cntCol`) — per-group key counts
    * @param refCnt (`keyCol`, `refCol`) — frozen reference key counts
    * @return one row per group: (group, n_events, drift_scaled)
    */
  def tvScaled(counts: DataFrame, groupCol: String, keyCol: String,
      cntCol: String, refCnt: DataFrame, refCol: String): DataFrame = {
    // DECIMAL(38,0) for the cross products and their sum: c_k·N_ref is a
    // product of two corpus-scale counts and would wrap a BIGINT
    // silently under non-ANSI Spark at ~3·10⁹ events per side; 38 exact
    // digits hold products of two 10¹⁹ counts with room for the Σ.
    // Consumers gate on comparisons of these decimals (still exact);
    // only cast drift_scaled down when the scale provably allows it.
    val dec = DecimalType(38, 0)
    val nRef = refCnt.agg(sum(col(refCol)).cast(dec).as("__n_ref"))
    val nGrp = counts.groupBy(col(groupCol))
      .agg(sum(col(cntCol)).cast(dec).as("__n_grp"))
    val grid = nGrp.select(col(groupCol)).crossJoin(broadcast(refCnt))
    val terms = grid
      .join(counts, Seq(groupCol, keyCol), "full_outer")
      .join(nGrp, groupCol).crossJoin(broadcast(nRef))
      .select(col(groupCol),
        abs(coalesce(col(cntCol), lit(0L)).cast(dec) * col("__n_ref")
          - coalesce(col(refCol), lit(0L)).cast(dec) * col("__n_grp"))
          .as("__term"),
        col("__n_grp"))
    terms.groupBy(col(groupCol))
      .agg(max(col("__n_grp")).cast("long").as("n_events"),
        sum(col("__term")).cast(dec).as("drift_scaled"))
  }
}
