package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed total-order ranking.
  *
  * `row_number()` over an UNPARTITIONED window executes as a single-task
  * sort of the whole frame — the classic scale trap for corpus-wide
  * ranks (quality-percentile cuts, leaderboards, deterministic decile
  * splits). This is the two-phase form: a range-partitioned sort spreads
  * the ordering across the cluster, then `zipWithIndex` assigns global
  * positions — one count job plus one map job over the SAME RDD
  * lineage. Staying on one RDD instance is load-bearing, not style:
  * Spark's range partitioner derives its sampling seed from the RDD id,
  * so two separate DataFrame actions over a `repartitionByRange` plan
  * can draw DIFFERENT range bounds and disagree about partition sizes —
  * per-partition offsets computed by one action would be wrong for the
  * other (observed as scrambled ranks in the spec before this form).
  */
object Ranking {

  /** Append `as`: the 1-based global rank under `orderCols`
    * (lexicographic, each ascending). Ties order by the later columns —
    * pass a unique id last for a total order. Runs two jobs at call
    * time (zipWithIndex's count + map); the result is a plain frame
    * with no hidden cached state.
    */
  def globalRank(df: DataFrame, orderCols: Seq[Column], as: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(orderCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(as, LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex.map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }
}
