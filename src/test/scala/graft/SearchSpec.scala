package graft

import graft.operators.{Dedup, InvertedIndex}
import org.apache.spark.sql.functions._

/** Inverted index, phrase matching, duplicated-span detection, and
  * winnowing fingerprints on hand-built fixtures with known answers.
  */
class SearchSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("postings are 1-based and per-occurrence; indexStats counts df vs cf") {
    val d = docsDf(1L -> "a b a", 2L -> "b c")
    val post = InvertedIndex.postings(d, "doc_id", "text")
    val rows = post.orderBy("term", "doc", "pos")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(rows == Seq(("a", 1L, 1), ("a", 1L, 3), ("b", 1L, 2), ("b", 2L, 1),
      ("c", 2L, 2)))
    val stats = InvertedIndex.indexStats(post).orderBy("term")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stats == Seq(("a", 1L, 2L), ("b", 2L, 2L), ("c", 1L, 1L)))
  }

  test("phraseMatches finds adjacent positions only, repeated terms included") {
    import spark.implicits._
    // "the the" must need the term at BOTH s and s+1 (distinct ordinals)
    val d = docsDf(1L -> "x the the y", 2L -> "the x the", 3L -> "the the the")
    val post = InvertedIndex.postings(d, "doc_id", "text")
    val phrase = Seq((0, "the"), (1, "the")).toDF("ord", "term")
    val m = InvertedIndex.phraseMatches(post, phrase, k = 2)
      .orderBy("doc", "start")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(m == Seq((1L, 2), (3L, 1), (3L, 2)))
  }

  test("duplicatedSpans flags within-doc and cross-doc repeats; coverage unions overlaps") {
    val w = 2
    // doc 1: "a b a b" → spans "a b"@1, "b a"@2, "a b"@3 ("a b" repeats within doc)
    // doc 2: "a b c"  → "a b"@1 (cross-doc with doc 1), "b c"@2 (unique)
    val d = docsDf(1L -> "a b a b", 2L -> "a b c")
    val spans = Dedup.spanTable(d, "doc_id", "text", w)
    val dup = Dedup.duplicatedSpans(spans)
    val flagged = dup.orderBy("doc", "start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3), r.getLong(4))).toSeq
    // "a b" occurs 3× over 2 docs; "b a" and "b c" once each (not flagged)
    assert(flagged == Seq((1L, 1, 3L, 2L), (1L, 3, 3L, 2L), (2L, 1, 3L, 2L)))
    val cov = Dedup.dupSpanCoverage(dup, w).orderBy("doc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // doc 1: spans @1 and @3 cover {1,2} ∪ {3,4} = 4; doc 2: {1,2} = 2
    assert(cov == Seq((1L, 4L), (2L, 2L)))
  }

  test("winnowing guarantee: shared run of w+k-1 tokens shares a fingerprint") {
    val k = 3
    val w = 4
    // shared run of exactly w+k-1 = 6 tokens embedded in different contexts
    val shared = "one two three four five six"
    val d = docsDf(
      1L -> s"p q r $shared s t u v",
      2L -> s"m n $shared o",
      3L -> "completely different words here nothing matches at all")
    val fps = Dedup.winnowFingerprints(d, "doc_id", "text", k, w)
    val pairs = Dedup.winnowSharedPairs(fps, maxBucketSize = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs.exists { case (a, b, s) => a == 1L && b == 2L && s >= 1L })
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L })
  }

  test("winnowing density: per-doc fingerprints ≈ 2/(w+1) of gram count") {
    val text = (1 to 400).map(i => s"tok${i % 97}x$i").mkString(" ")
    val d = docsDf(1L -> text)
    val nGrams = 400 - 2 // k=3
    val nFp = Dedup.winnowFingerprints(d, "doc_id", "text", k = 3, w = 4)
      .count()
    // robust-winnowing expectation 2/(w+1) = 0.4; allow wide slack but
    // require real sparsification (strictly between 10% and 70%)
    assert(nFp > nGrams / 10 && nFp < nGrams * 7 / 10,
      s"fingerprint density out of range: $nFp of $nGrams grams")
  }

  test("removeDuplicatedSpans: first (doc,start) copy survives, covered positions drop") {
    val w = 2
    // doc 1: "x y z x y" → "x y"@(1,1) canonical, "x y"@(1,4) removed
    // doc 2: "x y q"     → "x y"@(2,1) also non-canonical → removed
    val d = docsDf(1L -> "x y z x y", 2L -> "x y q")
    val post = InvertedIndex.postings(d, "doc_id", "text")
    val clean = Dedup.removeDuplicatedSpans(post,
      Dedup.duplicatedSpans(Dedup.spanTable(d, "doc_id", "text", w)), w)
      .orderBy("doc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(clean == Seq((1L, 3L, "x y z"), (2L, 1L, "q")))
  }

  test("removeDuplicatedSpansFromTokens: array-mask form matches the postings form") {
    val w = 2
    val d = docsDf(1L -> "x y z x y", 2L -> "x y q", 3L -> "a b a b a b",
      4L -> "solo words only here")
    val tok = InvertedIndex.tokenized(d, "doc_id", "text")
    val dups = Dedup.duplicatedSpans(Dedup.spanTableFromTokens(tok, w))
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("doc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val viaPost = rows(Dedup.removeDuplicatedSpans(
      InvertedIndex.postingsFromTokens(tok), dups, w))
    val viaMask = rows(Dedup.removeDuplicatedSpansFromTokens(tok, dups, w))
    assert(viaMask == viaPost)
    assert(viaMask.exists(_._1 == 3L)) // heavy within-doc repetition covered
  }

  test("winnowing guarantee holds on seeded-random corpora: shared run of w+k-1 tokens ⇒ shared fingerprint") {
    val k = 3
    val w = 4
    val rnd = new scala.util.Random(42)
    val cases = (1 to 15).map { i =>
      def word() = s"w${rnd.nextInt(500)}"
      val shared = Seq.fill(w + k - 1)(word()).mkString(" ")
      val pre1 = Seq.fill(rnd.nextInt(20))(word()).mkString(" ")
      val post1 = Seq.fill(rnd.nextInt(20))(word()).mkString(" ")
      val pre2 = Seq.fill(rnd.nextInt(20))(word()).mkString(" ")
      (2L * i -> s"$pre1 $shared $post1".trim,
        (2L * i + 1) -> s"$pre2 $shared".trim)
    }
    val d = docsDf(cases.flatMap(c => Seq(c._1, c._2)): _*)
    val fps = Dedup.winnowFingerprints(d, "doc_id", "text", k, w)
    val pairs = Dedup.winnowSharedPairs(fps, maxBucketSize = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    cases.foreach { case ((a, _), (b, _)) =>
      assert(pairs.contains((a, b)),
        s"docs $a/$b share a ${w + k - 1}-token run but no fingerprint") }
  }

  test("count-min: estimates never underestimate and are exact without collisions") {
    import spark.implicits._
    import graft.operators.CountMin
    val counts = Seq(("alpha", 100L), ("beta", 7L), ("gamma", 3L))
      .toDF("term", "cnt")
    val d = 4
    val m = 256
    val cells = CountMin.counters(counts, "term", "cnt", d, m)
    // 3 keys × 4 rows: every cell total must equal the key totals
    assert(cells.agg(sum("cell")).first().getLong(0) == 110L * d)
    val est = CountMin.estimate(cells, counts.select("term"), "term", d, m)
      .join(counts, "term")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    est.foreach { case (t, e, c) => assert(e >= c, s"$t underestimated") }
    // 3 keys in 256 buckets across 4 independent rows: a full 4-row
    // collision between two keys is (3/256)^4-improbable; with any
    // collision-free row the min recovers the exact count
    est.foreach { case (t, e, c) => assert(e == c, s"$t not exact: $e vs $c") }
  }

  test("stripHtml: script contents drop, tags strip, entities unescape one level, ws collapses") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val rows = Seq(
      "<script type=\"x\">var a = '<b>';</script>keep",
      "<style>p { color: red }</style>text",
      "<div class=\"c\"><p>a</p>  <p>b</p></div>",
      "x &amp;lt; y &lt; z &quot;q&quot; &#39;s&#39; &amp; w",
      "   spaced\tout   text  ")
      .toDF("text")
      .select(TextAnalysis.stripHtml(col("text")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq(
      "keep",
      "text",
      "a b",
      // one unescape level: &amp;lt; → &lt; (not <)
      "x &lt; y < z \"q\" 's' & w",
      "spaced out text"))
  }

  test("short docs: fewer grams than the window still fingerprint (min of all)") {
    val d = docsDf(1L -> "a b c d", 2L -> "a")
    // k=3 → doc 1 has 2 grams (< w=4) → exactly 1 fingerprint (their min);
    // doc 2 has 0 grams → no rows
    val fps = Dedup.winnowFingerprints(d, "doc_id", "text", k = 3, w = 4)
      .collect().map(r => r.getLong(0)).toSeq
    assert(fps == Seq(1L))
  }
}
