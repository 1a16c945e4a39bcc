package graft

import graft.operators.QuantileSketch
import graft.operators.QuantileSketch.Kll
import org.apache.spark.sql.functions._

/** KLL quantile sketch: rank-error bounds, merge associativity, exactness
  * below capacity, and the DataFrame aggregation path.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def rankOf(sorted: Array[Double], v: Double): Double =
    sorted.count(_ <= v).toDouble / sorted.length

  test("rank error stays within bound on 100k skewed values") {
    val rnd = new scala.util.Random(7)
    val values = Array.fill(100000)(math.pow(rnd.nextDouble(), 3) * 1000)
    val sk = new Kll(200)
    values.foreach(sk.update)
    val sorted = values.sorted
    for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
      val est = sk.quantile(q)
      assert(math.abs(rankOf(sorted, est) - q) < 0.03,
        s"q=$q est=$est rank=${rankOf(sorted, est)}")
    }
    // bounded state: ~k log(n/k) items, never the corpus
    assert(sk.retained < 2000, s"retained ${sk.retained}")
  }

  test("property: rank bound holds across distributions and random merge trees") {
    val rng = new scala.util.Random(23)
    for (trial <- 1 to 6) {
      val n = 20000 + rng.nextInt(60000)
      val values: Array[Double] = trial % 3 match {
        case 0 => Array.fill(n)(rng.nextDouble() * 1000) // uniform
        case 1 => Array.fill(n)(-math.log(rng.nextDouble()) * 100) // exponential
        case _ => Array.fill(n)( // heavy ties: 10 distinct levels
          (rng.nextInt(10) * 7).toDouble)
      }
      // random partitioning into 1..12 partials, merged left-to-right
      val parts = 1 + rng.nextInt(12)
      val sketches = values.grouped(math.max(1, n / parts)).map { chunk =>
        val s = new Kll(200); chunk.foreach(s.update); s
      }.toSeq
      val sk = sketches.reduce(_ merge _)
      val sorted = values.sorted
      for (q <- Seq(0.1, 0.5, 0.9)) {
        val est = sk.quantile(q)
        // under ties a value OCCUPIES a rank interval [count(<est),
        // count(<=est)]; the bound holds if the target rank is within ε
        // of that interval (point-rank comparison would jump in tie-mass
        // steps and fail any sketch on 10-level data)
        val lo = sorted.count(_ < est).toDouble / sorted.length
        val hi = sorted.count(_ <= est).toDouble / sorted.length
        assert(lo - 0.05 <= q && q <= hi + 0.05,
          s"trial=$trial q=$q est=$est rankIv=[$lo,$hi] parts=$parts")
      }
      assert(sk.retained < 3000)
    }
  }

  test("merge of partial sketches honors the same bound (mergeability)") {
    val rnd = new scala.util.Random(11)
    val values = Array.fill(60000)(rnd.nextGaussian() * 50 + 100)
    // 6 partitions folded separately, then merged pairwise in a tree —
    // the shuffle-reduce shape
    val parts = values.grouped(10000).map { chunk =>
      val s = new Kll(200); chunk.foreach(s.update); s
    }.toSeq
    val merged = parts.reduce(_.merge(_))
    assert(merged.count == 60000)
    val sorted = values.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = merged.quantile(q)
      assert(math.abs(rankOf(sorted, est) - q) < 0.03,
        s"q=$q est=$est rank=${rankOf(sorted, est)}")
    }
  }

  test("below capacity the sketch is exact") {
    val sk = new Kll(200)
    (1 to 100).foreach(i => sk.update(i.toDouble))
    assert(sk.quantile(0.5) == 50.0)
    assert(sk.quantile(1.0) == 100.0)
    assert(sk.quantile(0.0) == 1.0)
  }

  test("DataFrame groupBy path: distributed fold + merge matches exact quantiles in-bound") {
    val df = spark.range(0, 20000).select(
      (col("id") % 4).cast("string").as("g"),
      (col("id") * 2654435761L % 100000).cast("double").as("v"))
      .repartition(8)
    val got = df.groupBy("g")
      .agg(QuantileSketch.quantilesAgg(col("v"), Seq(0.5, 0.9)).as("qs"))
      .select(col("g"), element_at(col("qs"), 1).as("p50"),
        element_at(col("qs"), 2).as("p90"))
      .as[(String, Double, Double)].collect()
      .map { case (g, p50, p90) => g -> (p50, p90) }.toMap
    val exact = df.as[(String, Double)].collect().groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).sorted }
    for ((g, (p50, p90)) <- got) {
      val sorted = exact(g)
      assert(math.abs(rankOf(sorted, p50) - 0.5) < 0.05, s"g=$g p50=$p50")
      assert(math.abs(rankOf(sorted, p90) - 0.9) < 0.05, s"g=$g p90=$p90")
    }
  }
}
