package graft

import graft.functions.VectorFunctions
import graft.plans.CosineSimilarity
import org.apache.spark.sql.functions._

/** Native cosine expression: bit-equality with the fold form, null safety,
  * codegen + interpreted paths.
  */
class CosineExprSpec extends SparkSpec {
  import spark.implicits._

  test("fused cosine is bit-identical to the fold-composed form on real vectors") {
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), VectorFunctions.asDouble(col("embedding")).as("vec"))
    val a = emb.filter(col("id") < 30).select(col("id").as("ida"), col("vec").as("va"))
    val b = emb.filter(col("id") >= 30 && col("id") < 60)
      .select(col("id").as("idb"), col("vec").as("vb"))
    val both = a.crossJoin(b).select(
      CosineSimilarity(col("va"), col("vb")).as("fused"),
      VectorFunctions.cosineFold(col("va"), col("vb")).as("fold"))
    val diffs = both.filter(col("fused") =!= col("fold")).count()
    assert(diffs == 0)
    assert(both.count() == 900)
  }

  test("null input yields null, not a crash") {
    val df = Seq((Some(Seq(1.0, 2.0)), None: Option[Seq[Double]])).toDF("a", "b")
    val out = df.select(CosineSimilarity(col("a"), col("b")).as("c")).head
    assert(out.isNullAt(0))
  }

  test("interpreted path (nullSafeEval) matches codegen result") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val expr = CosineSimilarity(
      Literal.create(Array(1.0, 2.0, 3.0), ArrayType(DoubleType)),
      Literal.create(Array(2.0, 3.0, 4.0), ArrayType(DoubleType)))
    val interpreted = expr.eval(null).asInstanceOf[Double]
    val viaPlan = Seq(1).toDF("x")
      .select(CosineSimilarity(lit(Array(1.0, 2.0, 3.0)), lit(Array(2.0, 3.0, 4.0))).as("c"))
      .head.getDouble(0)
    assert(interpreted == viaPlan)
  }
}
