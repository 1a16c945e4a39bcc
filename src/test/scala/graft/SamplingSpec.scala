package graft

import graft.operators.Sampling
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bottom-k-by-hash sampling: window-form equivalence, partition
  * invariance (mergeability), and small-group behavior.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def data = spark.range(0, 5000).select(
    col("id").as("doc_id"),
    concat(lit("g"), pmod(col("id"), lit(7))).as("g"))

  test("equals the window row_number form exactly") {
    val viaAgg = Sampling.bottomKSample(data, "doc_id", "g", k = 25)
      .orderBy("g", "doc_id").as[(String, Long)].collect().toSeq
    val w = Window.partitionBy(col("g"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val viaWindow = data
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 25)
      .select(col("g"), col("doc_id"))
      .orderBy("g", "doc_id").as[(String, Long)].collect().toSeq
    assert(viaAgg == viaWindow && viaAgg.size == 7 * 25)
  }

  test("partition-invariant: 1-partition and 16-partition folds agree (mergeability)") {
    def run(parts: Int) =
      Sampling.bottomKSample(data.repartition(parts), "doc_id", "g", k = 10)
        .orderBy("g", "doc_id").as[(String, Long)].collect().toSeq
    assert(run(1) == run(16))
  }

  test("groups smaller than k return every member") {
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "g")
    val got = Sampling.bottomKSample(tiny, "doc_id", "g", k = 10)
      .orderBy("g", "doc_id").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 1L), ("a", 2L), ("b", 3L)))
  }
}
