package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear-classifier training — the quality-classifier step of
  * published curation recipes (a fastText-style linear model scored over
  * every document, trained on a labeled slice), in its batch-perceptron
  * form so training is EXACT integer arithmetic end to end:
  *
  *   margin_i = y_i · (w_t · x_i)   (BIGINT dot product)
  *   w_{t+1}  = w_t + Σ_{margin_i ≤ 0} y_i · x_i
  *
  * With integer features and labels ∈ {+1, −1} every gradient is an exact
  * BIGINT sum, so the trained weights reproduce bit-for-bit in any engine
  * — no sigmoid/exp, whose libm rounding differs across platforms and
  * would break cross-engine verification (the same reason the q34 family
  * pins float summation to decimal).
  *
  * Scale shape: one round = ONE distributed aggregation (d+1 longs,
  * partial-aggregated map-side — the treeAggregate shape), then the d+1
  * scalars fold into the next round's comparison expression as literals
  * (broadcast by value). Driver state is d+1 longs per round — never data
  * rows — and the feature frame is scanned once per round, so 100 TB
  * training is R linear passes. The k-means loop (Similarity.trainKMeans)
  * uses the same collect-scalars/broadcast-literals contract.
  */
object LinearClassifier {

  /** Post-update weights and the misclassified count that produced them
    * (counted under the PRE-update weights, standard batch perceptron).
    */
  final case class PerceptronRound(round: Int, weights: Seq[Long], nMis: Long)

  /** Train `rounds` batch-perceptron rounds over integer feature columns.
    *
    * @param features one row per example; `labelCol` ∈ {+1, −1} and every
    *   feature column integral. Callers should persist it — each round is
    *   one full scan.
    */
  def trainPerceptron(features: DataFrame, labelCol: String,
      featureCols: Seq[String], rounds: Int): Seq[PerceptronRound] = {
    require(rounds >= 1 && featureCols.nonEmpty,
      s"need rounds >= 1 and features; got $rounds, $featureCols")
    val y = col(labelCol).cast("long")
    var w: Seq[Long] = Seq.fill(featureCols.size)(0L)
    val out = Seq.newBuilder[PerceptronRound]
    for (t <- 1 to rounds) {
      val margin = y * featureCols.zip(w)
        .map { case (c, wi) => col(c).cast("long") * lit(wi) }
        .reduce(_ + _)
      val mis = margin <= 0
      val aggs =
        featureCols.map(c =>
          coalesce(sum(when(mis, y * col(c).cast("long")).otherwise(0L)),
            lit(0L))) :+
        coalesce(sum(when(mis, 1L).otherwise(0L)), lit(0L))
      // bounded collect: d+1 scalars — the round's whole reduce output
      val row = features.agg(aggs.head, aggs.tail: _*).collect()(0)
      w = w.indices.map(i => w(i) + row.getLong(i))
      out += PerceptronRound(t, w, row.getLong(featureCols.size))
    }
    out.result()
  }

  /** Margin expression under fixed weights (BIGINT-exact) — a pure
    * Column over `featureCols`, usable on any frame carrying them.
    */
  def score(featureCols: Seq[String], weights: Seq[Long]): Column =
    featureCols.zip(weights)
      .map { case (c, wi) => col(c).cast("long") * lit(wi) }
      .reduce(_ + _)
}
