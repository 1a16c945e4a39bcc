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

  /** Reciprocal-rank fusion of per-modality shortlists — the standard
    * hybrid-retrieval combiner (lexical BM25 + vector ANN, or any ranked
    * mix): a candidate's fused score is Σ over the modalities that
    * shortlisted it of `scale div (k0 + rank)` — INTEGER division on a
    * fixed scale, so fused scores are exact int64 and the ranking
    * reproduces bit-for-bit in any engine (no float accumulation; the
    * published formula's 1/(k0+r) ordering is preserved because the
    * shared scale is monotone). k0 = 60 is the published default —
    * it damps the winner-take-all effect of rank-1 hits.
    *
    * `ranked`: (modalityName, frame) pairs, each frame (qid, id, rank)
    * with rank 1-based within qid. Output: (qid, id, rrf,
    * <modality>_rank …) — absent modalities contribute 0 and surface as
    * NULL ranks; top `topK` per qid by (rrf desc, id asc), total-ordered.
    *
    * Scale shape: inputs are per-query-BOUNDED shortlists by
    * construction (each modality's top-R), so the outer-join merge and
    * the per-query window cost ∝ queries·R·modalities — never corpus;
    * fusion adds no corpus-sized work to either retrieval path.
    */
  def rrfFuse(ranked: Seq[(String, DataFrame)], topK: Int, k0: Int = 60,
      scale: Long = 1000000L): DataFrame = {
    require(ranked.nonEmpty, "rrfFuse needs at least one ranked input")
    val renamed = ranked.map { case (name, df) =>
      name -> df.select(col("qid"), col("id"),
        col("rank").as(s"${name}_rank"))
    }
    val merged = renamed.map(_._2)
      .reduce((a, b) => a.join(b, Seq("qid", "id"), "full_outer"))
    val rrf = renamed.map { case (name, _) =>
      // backtick-quote (and escape) the derived column so a modality
      // name that is not a bare lowercase identifier — dots, dashes,
      // spaces, reserved words — still parses and resolves correctly
      val quoted = s"${name}_rank".replace("`", "``")
      coalesce(expr(s"$scale div ($k0 + `$quoted`)"), lit(0L))
    }.reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("rrf").desc, col("id"))
    merged.withColumn("rrf", rrf)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= topK)
      .drop("__rk")
  }
}
