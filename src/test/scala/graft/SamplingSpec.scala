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

  // skewed corpus: domain sizes 4000 / 800 / 200
  private def skewed = spark.range(0, 5000).select(
    col("id").as("doc_id"),
    when(col("id") < 4000, "big")
      .when(col("id") < 4800, "mid").otherwise("small").as("g"))

  test("temperature resample flattens the mixture toward sqrt shares") {
    val kept = Sampling.temperatureResample(skewed, "doc_id", "g")
    val byG = kept.groupBy("g").count().as[(String, Long)].collect().toMap
    // target shares ∝ sqrt(count): sqrt(4000):sqrt(800):sqrt(200)
    val w = Map("big" -> math.sqrt(4000), "mid" -> math.sqrt(800),
      "small" -> math.sqrt(200))
    val s = w.values.sum
    // budget pinned by the smallest domain keeping everything
    val budget = w.keys.map(g =>
      Map("big" -> 4000.0, "mid" -> 800.0, "small" -> 200.0)(g) / (w(g) / s))
      .min
    assert(byG("small") == 200, "argmin domain keeps every doc")
    // Poisson sampling: expect n_g ≈ share_g * budget within 4 sigma
    for (g <- Seq("big", "mid")) {
      val exp = w(g) / s * budget
      assert(math.abs(byG(g) - exp) <= 4 * math.sqrt(exp),
        s"$g kept ${byG(g)} vs expected $exp")
    }
    // flattening: kept ratio big/small well below the 20x input ratio
    assert(byG("big").toDouble / byG("small") < 6.0)
  }

  test("temperature resample is deterministic and a subset of the corpus") {
    val a = Sampling.temperatureResample(skewed, "doc_id", "g")
      .orderBy("g", "doc_id").as[(String, Long)].collect().toSeq
    val b = Sampling.temperatureResample(skewed.repartition(16), "doc_id", "g")
      .orderBy("g", "doc_id").as[(String, Long)].collect().toSeq
    assert(a == b, "same rows regardless of partitioning / re-run")
    val ids = a.map(_._2).toSet
    assert(ids.subsetOf((0L until 5000L).toSet))
  }

  test("token-weighted resample balances MASS, not doc counts") {
    // two domains, equal doc counts, but 'heavy' docs carry 9x the tokens
    val df = spark.range(0, 2000).select(
      col("id").as("doc_id"),
      when(col("id") < 1000, "heavy").otherwise("light").as("g"),
      when(col("id") < 1000, 900L).otherwise(100L).as("n_tokens"))
    val kept = Sampling.temperatureResample(df, "doc_id", "g",
      weightCol = Some("n_tokens"))
    val byG = kept.groupBy("g").count().as[(String, Long)].collect().toMap
    // mass 900k vs 100k → shares sqrt(9):sqrt(1) = 3:1; budget pinned by
    // light keeping all its mass → light keeps everything, heavy keeps
    // mass 3×100k = 300k → 300k/900 ≈ 333 docs (±4σ Poisson)
    assert(byG("light") == 1000)
    assert(math.abs(byG("heavy") - 333.0) <= 4 * math.sqrt(333.0),
      s"heavy kept ${byG("heavy")}")
    // doc-weighted run keeps everything (equal doc counts) — different op
    val unweighted = Sampling.temperatureResample(df, "doc_id", "g")
    assert(unweighted.count() == 2000)
  }

  test("uniform corpus: every domain keeps (almost) everything") {
    val uni = spark.range(0, 3000).select(
      col("id").as("doc_id"), pmod(col("id"), lit(3)).cast("string").as("g"))
    val kept = Sampling.temperatureResample(uni, "doc_id", "g").count()
    // equal counts → every rate is 1 up to fp rounding
    assert(kept >= 2997 && kept <= 3000)
  }

  test("unimaxAllocate: saturated prefix caps out, the rest split evenly " +
      "with the remainder to the first in sort order, totals hit the " +
      "budget exactly") {
    def masses(rows: (String, Long)*) =
      rows.flatMap { case (g, m) => Seq((g, m)) }.toDF("lang", "w")
    def alloc(df: org.apache.spark.sql.DataFrame, num: Long, den: Long,
        cap: Long) =
      Sampling.unimaxAllocate(df, "lang", "w", num, den, cap)
        .collect().map(r => r.getAs[String]("lang") ->
          (r.getAs[Long]("allocated"), r.getAs[Boolean]("capped"))).toMap
    // hand-traced waterfill: T=305, B=(305·9) div 10 = 274; caps (E=1)
    // 5/100/100/100 sorted a,b,c,d. a: 5·4=20 ≤ 274 → capped. b: 300 ≤
    // 269? no → open. q=(274−5) div 3=89, r=2 → b,c get 90, d gets 89.
    val out = alloc(masses("a" -> 5L, "b" -> 100L, "c" -> 100L,
      "d" -> 100L), 9L, 10L, 1L)
    assert(out("a") == (5L, true))
    assert(out("b") == (90L, false) && out("c") == (90L, false))
    assert(out("d") == (89L, false))
    assert(out.values.map(_._1).sum == 274L, "Σ allocated ≡ budget")
    // an open language never exceeds its capacity even with the +1
    // remainder (cap·(L−k) > B−Pk ⟹ cap ≥ q+1): a is the smallest yet
    // stays within its cap of 10
    val tight = alloc(masses("a" -> 10L, "b" -> 11L, "c" -> 11L), 9L, 10L, 1L)
    assert(tight("a") == (10L, false), "q+1 = 10 lands exactly on the cap")
    assert(tight.values.map(_._1).sum == 28L)
    // budget above total capacity: everyone saturates (the div-by-zero
    // guard branch), Σ allocated = Σ capacity
    val sat = alloc(masses("a" -> 10L, "b" -> 20L), 3L, 1L, 2L)
    assert(sat("a") == (20L, true) && sat("b") == (40L, true))
  }

  test("unimaxTake: hash-ordered inclusive prefix fills each group's " +
      "allocation exactly; boundary-exact take; capped groups keep all") {
    // md5 order: en ids 1,2,3 sort as 1,2,3 (c4ca… < c81e… < eccb…);
    // xx ids 4,5 sort as 4 (a87f…), 5 (e4da…)
    val docs = Seq(
      (1L, "en", 50L), (2L, "en", 30L), (3L, "en", 20L),
      (4L, "xx", 10L), (5L, "xx", 20L))
      .toDF("doc_id", "lang", "n_chars")
    val alloc = Seq(("en", 60L), ("xx", 30L)).toDF("lang", "allocated")
    val out = Sampling.unimaxTake(docs, "doc_id", "lang", "n_chars", alloc)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("lang"), r.getAs[Long]("cum_weight"))).toMap
    // en: cum 50, 80, 100 under allocation 60 → only doc 1 fits
    // (the INCLUSIVE rule: doc 2 at cum 80 > 60 is out)
    assert(out.keySet == Set(1L, 4L, 5L))
    assert(out(1L) == ("en", 50L))
    // xx: cum 10, 30 — the boundary row (cum == allocated) is KEPT
    assert(out(4L) == ("xx", 10L) && out(5L) == ("xx", 30L))
    // composition with the allocator: a saturated group keeps everything
    val full = Sampling.unimaxTake(docs, "doc_id", "lang", "n_chars",
      Sampling.unimaxAllocate(docs, "lang", "n_chars", 3L, 1L, 2L))
    assert(full.count() == 5L, "budget above capacity keeps the corpus")
  }

  test("unimaxEpochSchedule: capped groups read exactly cap full epochs " +
      "with no partial; uncapped groups factor into floor-epochs + a " +
      "hash-order partial prefix; consumed mass never exceeds allocated") {
    // en mass 60, fr mass 10; cap 3, budget 80 (of 70 total ⇒ b = 80
    // via 8/7): fr saturates at 30 (3 epochs), en gets 50 = 0 full + 50
    val docs = ((1L to 6L).map(i => (i, "en", 10L)) ++
      (11L to 12L).map(i => (i, "fr", 5L))).toDF("doc_id", "lang", "n_chars")
    val alloc = Sampling.unimaxAllocate(docs, "lang", "n_chars", 8L, 7L, 3L)
    val out = Sampling.unimaxEpochSchedule(docs, "doc_id", "lang",
        "n_chars", alloc)
      .collect().map(r => r.getString(0) -> r).toMap
    val fr = out("fr")
    assert(fr.getAs[Long]("n_full_epochs") == 3L)
    assert(fr.getAs[Long]("partial_target") == 0L)
    assert(fr.getAs[Long]("partial_docs") == 0L)
    val en = out("en")
    assert(en.getAs[Long]("allocated") == 50L)
    assert(en.getAs[Long]("n_full_epochs") == 0L)
    assert(en.getAs[Long]("partial_target") == 50L)
    assert(en.getAs[Long]("partial_docs") == 5L,
      "five 10-weight docs fit the 50 partial target")
    assert(en.getAs[Long]("partial_mass") == 50L)
    // consumed ≤ allocated identity on every row
    out.values.foreach { r =>
      val consumed = r.getAs[Long]("n_full_epochs") * r.getAs[Long]("n_mass") +
        r.getAs[Long]("partial_mass")
      assert(consumed <= r.getAs[Long]("allocated"))
    }
    // the partial prefix is the unimaxTake hash order: same five docs
    val takeIds = Sampling.unimaxTake(docs.filter(col("lang") === "en"),
        "doc_id", "lang", "n_chars",
        alloc.filter(col("lang") === "en")
          .withColumn("allocated", lit(50L)))
      .collect().map(_.getLong(1)).toSet
    assert(takeIds.size == 5)
  }

  test("packPayloads: payloads are the pack members' texts joined in " +
      "order; grouping matches packManifest exactly") {
    import graft.operators.Curation
    val docs = Seq(
      (1L, "en", 300L, "one"), (2L, "en", 300L, "two"),
      (3L, "en", 100L, "three"), (4L, "en", 500L, "four"))
      .toDF("doc_id", "lang", "n_tokens", "text")
    val out = Curation.packPayloads(docs, "doc_id", "n_tokens",
        budget = 512L, partitionCol = "lang", orderCol = "doc_id",
        textCol = "text")
      .collect().map(r => r.getAs[Long]("pack_id") ->
        ((r.getAs[Long]("n_docs"), r.getAs[String]("payload")))).toMap
    // exclusive prefixes 0/300/600/700 → packs 0/0/1/1
    assert(out(0L) == ((2L, "one\ntwo")))
    assert(out(1L) == ((2L, "three\nfour")))
  }

  test("unimaxEpochEmission: a capped group's docs appear exactly cap " +
      "times; the partial epoch is the unimaxTake hash-order prefix; " +
      "full epochs carry the whole group") {
    // same fixture as the schedule spec: fr saturates at 3 epochs,
    // en factors into 0 full + a 50-mass partial (5 of its 6 docs)
    val docs = ((1L to 6L).map(i => (i, "en", 10L)) ++
      (11L to 12L).map(i => (i, "fr", 5L))).toDF("doc_id", "lang", "n_chars")
    val alloc = Sampling.unimaxAllocate(docs, "lang", "n_chars", 8L, 7L, 3L)
    val em = Sampling.unimaxEpochEmission(docs, "doc_id", "lang",
      "n_chars", alloc).collect()
    val fr = em.filter(_.getString(0) == "fr")
    // every fr doc appears in epochs 0,1,2 — exactly cap occurrences
    assert(fr.groupBy(_.getLong(1)).view.mapValues(
      _.map(_.getAs[Long]("epoch")).sorted.toSeq).toMap ==
      Map(11L -> Seq(0L, 1L, 2L), 12L -> Seq(0L, 1L, 2L)))
    val en = em.filter(_.getString(0) == "en")
    // en: no full epoch, one partial at epoch 0 = the unimaxTake prefix
    assert(en.forall(_.getAs[Long]("epoch") == 0L))
    val takeIds = Sampling.unimaxTake(docs.filter(col("lang") === "en"),
        "doc_id", "lang", "n_chars",
        alloc.filter(col("lang") === "en"))
      .collect().map(_.getLong(1)).toSet
    assert(en.map(_.getLong(1)).toSet == takeIds && takeIds.size == 5)
    // pack payloads: per-epoch packing means every full epoch of a
    // group packs identically, and epochs never share a pack
    val withText = docs.withColumn("text",
      concat(lit("d"), col("doc_id").cast("string")))
    val packs = Sampling.unimaxEpochPackPayloads(withText, "doc_id",
        "lang", "n_chars", "text", alloc, packBudget = 8L)
      .collect()
    val frPacks = packs.filter(_.getString(0) == "fr")
      .groupBy(_.getAs[Long]("epoch")).view
      .mapValues(_.map(r => (r.getAs[Long]("pack_id"),
        r.getAs[Long]("n_docs"), r.getAs[String]("payload"))).sorted.toSeq)
      .toMap
    assert(frPacks.keySet == Set(0L, 1L, 2L))
    assert(frPacks(0L) == frPacks(1L) && frPacks(1L) == frPacks(2L))
  }

  test("importanceResampleIntSurrogate: exact integer ratio weights, " +
      "target-absent features weigh zero, deterministic top-k") {
    val raw = Seq((1L, "hot cold"), (2L, "cold cold"), (3L, "hot hot"))
      .toDF("doc_id", "text")
    val target = Seq(Tuple1("hot hot hot")).toDF("text")
    val out = Sampling.importanceResampleIntSurrogate(raw, target,
        "doc_id", "text", buckets = 64, scale = 1000000L, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // T=3 (hot x3), R=6; w_hot = (3*6*1e6) div (3*3) = 2e6, w_cold = 0
    // (absent from target) -> scores: doc3 = 4e6, doc1 = 2e6, doc2 = 0;
    // top-k order (score DESC, id ASC) is total and engine-portable
    assert(out.toSeq == Seq((3L, 4000000L), (1L, 2000000L), (2L, 0L)))
  }

  test("curriculumPackPlan: packs never straddle a phase boundary and " +
      "pack ids restart per phase") {
    import graft.operators.Curation
    // scores force phases: ids 1..9, score = id → phases 0/1/2 by rank
    val docs = (1L to 9L).map(i => (i, i, 4L))
      .toDF("doc_id", "score", "n_tokens")
    val out = Curation.curriculumPackPlan(docs, "doc_id", "score",
        "n_tokens", nPhases = 3, packBudget = 8L)
      .collect()
      .map(r => (r.getAs[Long]("phase"), r.getAs[Long]("pack_id")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[String]("boundaries_csv"))))
      .toMap
    // 3 docs of 4 tokens per phase, budget 8 → packs of 2 + 1 per phase;
    // pack ids restart at 0 in every phase (never straddling a boundary)
    assert(out.keySet ==
      Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L)))
    assert(out((0L, 0L)) == ((2L, "4,8")))
    assert(out((0L, 1L)) == ((1L, "4")))
    assert(out((2L, 0L)) == ((2L, "4,8")))
  }
}
