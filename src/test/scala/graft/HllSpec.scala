package graft

import graft.operators.Hll
import org.apache.spark.sql.functions._

/** HyperLogLog distinct sketch: accuracy at several cardinalities,
  * partition invariance (mergeability), duplicate insensitivity, and the
  * small-range linear-counting regime.
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def estimate(n: Long, parts: Int = 8): Double =
    spark.range(0, n).repartition(parts)
      .agg(Hll.approxDistinct(col("id")).as("est"))
      .as[Double].head()

  test("within 5% at 1e3 / 1e4 / 1e5 distinct values") {
    for (n <- Seq(1000L, 10000L, 100000L)) {
      val est = estimate(n)
      assert(math.abs(est - n) <= 0.05 * n,
        s"n=$n est=$est off by ${math.abs(est - n) / n * 100}%")
    }
  }

  test("partition-invariant: merge order never changes the estimate") {
    val e1 = estimate(50000, parts = 1)
    val e16 = estimate(50000, parts = 16)
    val e32 = estimate(50000, parts = 32)
    assert(e1 == e16 && e16 == e32)
  }

  test("duplicates do not move the estimate") {
    val once = spark.range(0, 20000)
      .agg(Hll.approxDistinct(col("id"))).as[Double].head()
    val tripled = spark.range(0, 60000).select(pmod(col("id"), lit(20000)).as("id"))
      .agg(Hll.approxDistinct(col("id"))).as[Double].head()
    assert(once == tripled)
  }

  test("small-range linear counting is near-exact") {
    for (n <- Seq(1L, 10L, 100L)) {
      val est = estimate(n, parts = 2)
      assert(math.abs(est - n) <= math.max(1.0, 0.02 * n),
        s"n=$n est=$est")
    }
  }

  test("nulls are not counted (countDistinct semantics)") {
    val df = Seq(Some("a"), Some("b"), None, None, Some("a")).toDF("v")
    val r = df.agg(countDistinct(col("v")).as("exact"),
      Hll.approxDistinct(col("v")).as("est")).head
    assert(r.getLong(0) == 2L)
    assert(math.abs(r.getDouble(1) - 2.0) < 0.1,
      s"est=${r.getDouble(1)} — nulls must not inflate the sketch")
  }

  test("property: merge IS union — fold(A++B) == merge(fold(A), fold(B)) on random hash sets") {
    val rng = new scala.util.Random(7)
    val agg = Hll.RegistersAgg(12)
    for (_ <- 1 to 10) {
      val a = Array.fill(1 + rng.nextInt(5000))(rng.nextLong())
      val b = Array.fill(1 + rng.nextInt(5000))(rng.nextLong())
      val fa = a.foldLeft(agg.zero)(agg.reduce)
      val fb = b.foldLeft(agg.zero)(agg.reduce)
      val fab = (a ++ b).foldLeft(agg.zero)(agg.reduce)
      // merge mutates its left arg — clone to keep fa usable
      assert(java.util.Arrays.equals(agg.merge(fa.clone, fb), fab))
      // idempotent: self-merge is identity (re-delivered batches are safe)
      assert(java.util.Arrays.equals(agg.merge(fab.clone, fab), fab))
      // commutative on the register level
      assert(java.util.Arrays.equals(agg.merge(fb.clone, fa), fab))
    }
  }

  test("property: estimate within 5% across distributions and random split counts") {
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 6) {
      val n = 20000 + rng.nextInt(80000)
      // distinct ids drawn three ways: dense range, sparse random, clustered
      val ids: Seq[Long] = trial % 3 match {
        case 0 => 0L until n.toLong
        case 1 => Seq.fill(n)(rng.nextLong()).distinct
        case _ => (0 until n).map(i => (i / 100).toLong * 1000000L + i % 100)
      }
      val parts = 1 + rng.nextInt(16)
      val est = spark.createDataFrame(
          ids.map(Tuple1(_))).toDF("id").repartition(parts)
        .agg(Hll.approxDistinct(col("id"))).head.getDouble(0)
      assert(math.abs(est - ids.size) <= 0.05 * ids.size,
        s"trial=$trial n=${ids.size} est=$est parts=$parts")
    }
  }

  test("grouped: per-group sketches are independent") {
    val df = spark.range(0, 30000).select(
      pmod(col("id"), lit(3)).as("g"),
      (col("id") * lit(7)).as("v"))
    val got = df.groupBy("g").agg(Hll.approxDistinct(col("v")).as("est"))
      .as[(Long, Double)].collect().toMap
    for ((_, est) <- got) assert(math.abs(est - 10000) <= 500)
  }

  test("set ops: inclusion-exclusion intersection on PARTIAL overlap (q129 bounds)") {
    // A = [0, 10000), B = [6000, 16000): |A∩B| = 4000, |A∪B| = 16000 —
    // a genuine partial overlap (the q129 gate tables happen to overlap
    // fully, so the estimator's hard case is exercised here)
    val a = spark.range(0, 10000).select(lit("a").as("s"), col("id"))
    val b = spark.range(6000, 16000).select(lit("b").as("s"), col("id"))
    val regs = a.union(b).groupBy("s")
      .agg(Hll.registersAgg(col("id")).as("r"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    def est(r: Seq[Int]): Double = {
      val df = Seq(Tuple1(r)).toDF("r")
      df.select(Hll.estimate(col("r"))).head.getDouble(0)
    }
    val merged = Seq((regs("a"), regs("b"))).toDF("x", "y")
      .select(Hll.mergeRegisters(col("x"), col("y")).as("r"))
      .head.getSeq[Int](0)
    val (ea, eb, eu) = (est(regs("a")), est(regs("b")), est(merged))
    assert(math.abs(eu - 16000) <= 0.05 * 16000 + 1, s"union est $eu")
    val ei = ea + eb - eu
    assert(math.abs(ei - 4000) <= 0.08 * 16000 + 2,
      s"intersection est $ei (a=$ea b=$eb u=$eu)")
  }

  test("sparse round-trip is register-exact; 1-distinct state is ≤64 B") {
    // one value → one non-zero register → sparse row is ONE packed int
    val one = spark.range(1).select(lit(42L).as("v"))
      .agg(Hll.registersAgg(col("v")).as("r"))
      .select(Hll.sparsify(col("r")).as("s"))
    val sparse = one.select(col("s")).head.getSeq[Int](0)
    assert(sparse.length == 1, s"1-distinct sparse length ${sparse.length}")
    assert(sparse.length * 4 <= 64) // payload bytes
    // round-trip equals the dense original register for register
    val rt = spark.range(1).select(lit(42L).as("v"))
      .agg(Hll.registersAgg(col("v")).as("r"))
      .select(col("r"),
        Hll.densify(Hll.sparsify(col("r"))).as("rt"))
      .head
    assert(rt.getSeq[Int](0) == rt.getSeq[Int](1))
  }

  test("sparse↔dense merges all equal the one-shot dense sketch") {
    // random split: fold halves separately, store one side sparse, merge
    // in every sparse/dense combination — estimates and registers must
    // equal the one-shot fold over the union
    val n = 5000L
    val a = spark.range(0, n / 2).select(xxhash64(col("id")).as("h"))
    val b = spark.range(n / 2, n).select(xxhash64(col("id")).as("h"))
    def regsOf(df: org.apache.spark.sql.DataFrame) =
      df.agg(Hll.registersAgg(col("h")).as("r"))
    val oneShot = regsOf(a.union(b)).select(col("r")).head.getSeq[Int](0)
    val ra = regsOf(a).select(col("r")).head.getSeq[Int](0)
    val rb = regsOf(b).select(col("r")).head.getSeq[Int](0)
    val combos = Seq((true, true), (true, false), (false, true), (false, false))
    combos.foreach { case (sa, sb) =>
      val df = Seq((ra, rb)).toDF("x", "y")
        .select(
          (if (sa) Hll.sparsify(col("x")) else col("x")).as("x"),
          (if (sb) Hll.sparsify(col("y")) else col("y")).as("y"))
        .select(Hll.mergeRegistersAuto(col("x"), col("y")).as("m"))
      assert(df.head.getSeq[Int](0) == oneShot, s"combo sparse=($sa,$sb)")
    }
  }

  test("sparsify promotes to dense past the fill threshold; densify idempotent") {
    // enough distincts to exceed a small maxFill → sparsify must leave
    // the array dense (length 2^p), and densify must pass it through
    val many = spark.range(100000).select(xxhash64(col("id")).as("h"))
      .agg(Hll.registersAgg(col("h")).as("r"))
      .select(col("r"), Hll.sparsify(col("r"), maxFill = 16).as("s"))
      .head
    assert(many.getSeq[Int](1).length == 4096) // stayed dense
    assert(many.getSeq[Int](0) == many.getSeq[Int](1))
    // below threshold: sparsify of a sparse row is idempotent
    val few = spark.range(5).select(xxhash64(col("id")).as("h"))
      .agg(Hll.registersAgg(col("h")).as("r"))
      .select(Hll.sparsify(Hll.sparsify(col("r"))).as("s2"),
        Hll.sparsify(col("r")).as("s1"))
      .head
    assert(few.getSeq[Int](0) == few.getSeq[Int](1))
  }

  test("pass-through branches never alias a reused UnsafeArrayData buffer") {
    // Operators that buffer rows (sort, aggregation) RECYCLE the backing
    // bytes of UnsafeArrayData between rows. An expression that returns
    // its input ArrayData on a no-op branch therefore hands out a view
    // into memory that the operator will overwrite — the result must be
    // a defensive copy that survives mutation of the source buffer.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, IntegerType}
    val p = 4
    val m = 1 << p
    val ref = BoundReference(0, ArrayType(IntegerType, containsNull = false),
      nullable = false)

    def evalThenClobber(expr: org.apache.spark.sql.catalyst.expressions.Expression,
                        input: Array[Int]): (Seq[Int], Array[Int]) = {
      val buf = UnsafeArrayData.fromPrimitiveArray(input)
      val out = expr.eval(InternalRow(buf)).asInstanceOf[ArrayData]
      val snapshot = out.toIntArray.toSeq
      (0 until buf.numElements()).foreach(i => buf.setInt(i, -1)) // buffer reuse
      (snapshot, out.toIntArray)
    }

    // sparsify pass-through #1: already-sparse input
    val sparse = Array((3 << 6) | 5, (7 << 6) | 2)
    val (s1, s1After) = evalThenClobber(graft.plans.HllSparsify(ref, p, 4), sparse)
    assert(s1 == sparse.toSeq && s1After.toSeq == s1)
    // sparsify pass-through #2: dense input above the fill threshold
    val full = Array.tabulate(m)(i => (i % 5) + 1)
    val (s2, s2After) = evalThenClobber(graft.plans.HllSparsify(ref, p, 2), full)
    assert(s2 == full.toSeq && s2After.toSeq == s2)
    // densify pass-through: already-dense input
    val (d1, d1After) = evalThenClobber(graft.plans.HllDensify(ref, p), full)
    assert(d1 == full.toSeq && d1After.toSeq == d1)
  }
}
