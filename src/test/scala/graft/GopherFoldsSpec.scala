package graft

import graft.functions.TextFunctions
import graft.plans.{DupValueStats, GopherRepStats}
import org.apache.spark.sql.functions._

/** The native Gopher repetition folds (r22 codegen rewrite) against an
  * independent plain-Scala reference — cell-for-cell on the gated
  * corpus's token shapes plus adversarial docs (repeated tokens,
  * prefix-token grams, control characters, multi-byte code points,
  * pathological many-distinct-duplicate docs — the O(dups²) case the
  * rewrite fixes).
  */
class GopherFoldsSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent reference (strings + standard collections) ----

  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  private def numChars(s: String): Long = s.codePointCount(0, s.length).toLong

  /** (n_word_chars, top2..4, dup5..10) — the published-rule definitions
    * computed the obvious quadratic way.
    */
  private def refStats(tokens: Seq[String]): Seq[Long] = {
    val nch = tokens.map(numChars)
    val total = nch.sum
    def top(n: Int): Long = {
      if (tokens.length < n) return 0L
      val grams = tokens.sliding(n).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val maxc = counts.values.max
      val best = counts.collect { case (g, c) if c == maxc => g }
        .reduceLeft((a, b) => if (utf8Cmp(a, b) <= 0) a else b)
      maxc * (numChars(best) - (n - 1))
    }
    def cov(n: Int): Long = {
      if (tokens.length < n) return 0L
      val wins = tokens.sliding(n).toSeq
      val counts = wins.groupBy(identity).view.mapValues(_.size).toMap
      val covered = scala.collection.mutable.Set.empty[Int]
      for ((w, i) <- wins.zipWithIndex if counts(w) >= 2; p <- i until i + n)
        covered += p
      covered.toSeq.map(nch).sum
    }
    Seq(total, top(2), top(3), top(4)) ++ (5 to 10).map(cov)
  }

  /** (n, n_dup, dup_chars, tot_chars) of a value array. */
  private def refDup(arr: Seq[String]): Seq[Long] = {
    val counts = arr.groupBy(identity).view.mapValues(_.size.toLong).toMap
    Seq(arr.size.toLong, arr.size.toLong - counts.size,
      counts.map { case (v, c) => (c - 1) * numChars(v) }.sum,
      arr.map(numChars).sum)
  }

  private val adversarial: Seq[Seq[String]] = Seq(
    Seq.empty,
    Seq("one"),
    Seq("a", "a", "a", "a", "a", "a", "a", "a", "a", "a", "a", "a"),
    // prefix-token tie-breaks: "ab x" vs "ab" "x" style joins
    Seq("ab", "a", "b", "ab", "a", "b", "ab", "a", "b", "a", "b", "ab"),
    // control char below 0x20 inside a token (joined-gram order edge)
    Seq("ab", "a", "b", "ab", "a", "b", "ab", "a", "b"),
    // multi-byte code points: char counts != byte counts
    Seq("日本語", "ß", "日本語", "ß", "日本語", "ß", "日本語", "ß", "日本語", "ß"),
    // many DISTINCT duplicated windows — the accumulator blowup case
    (0 until 40).flatMap(i => Seq(s"w$i", s"x$i")) ++
      (0 until 40).flatMap(i => Seq(s"w$i", s"x$i")))

  test("gopherStats matches the reference on adversarial and random docs") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("the", "cat", "sat", "mat", "on", "a", "ab", "abc",
      "ß", "日本", "x", "zz")
    val random = (0 until 60).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => vocab(rnd.nextInt(vocab.length)))
    }
    val docs = (adversarial ++ random).zipWithIndex
      .map { case (tk, i) => (i.toLong, tk) }
    val out = docs.toDF("id", "tk")
      .select(col("id"), GopherRepStats(col("tk")).as("o"))
      .orderBy("id").collect()
    for ((row, (_, tk)) <- out.zip(docs)) {
      val o = row.getStruct(1)
      val got = (0 until 10).map(o.getLong)
      val want = refStats(tk)
      assert(got == want, s"tokens=$tk got=$got want=$want")
    }
  }

  test("dupStats matches the reference on paragraph/line arrays") {
    val arrs: Seq[Seq[String]] = Seq(
      Seq.empty, Seq(""), Seq("", "", ""), Seq("a"),
      Seq("para one", "para two", "para one", "", "para one"),
      Seq("日本語の段落", "日本語の段落", "ß"),
      (0 until 50).map(i => s"line ${i % 7}"))
    val docs = arrs.zipWithIndex.map { case (a, i) => (i.toLong, a) }
    val out = docs.toDF("id", "arr")
      .select(col("id"), DupValueStats(col("arr")).as("o"))
      .orderBy("id").collect()
    for ((row, (_, arr)) <- out.zip(docs)) {
      val o = row.getStruct(1)
      val got = (0 until 4).map(o.getLong)
      assert(got == refDup(arr), s"arr=$arr got=$got want=${refDup(arr)}")
    }
  }

  test("gopherRepetition end-to-end on the sf0.001 corpus with the q168 splice") {
    // the q168 shape: spliced repeated paragraphs; compare every stat
    // column against the reference computed from the same text
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 6 === 0,
          lit("\n\nrepeat me paragraph\n\nrepeat me paragraph"))
          .otherwise(lit(""))).as("text"))
    val out = graft.operators.Curation
      .gopherRepetition(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val texts = docs.orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.nonEmpty)
    for (r <- out) {
      val text = texts(r.getLong(0))
      val tk = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val want = refStats(tk)
      val tokStats = Seq("n_word_chars", "top2_chars", "top3_chars",
        "top4_chars", "dup5_chars", "dup6_chars", "dup7_chars",
        "dup8_chars", "dup9_chars", "dup10_chars")
        .map(c => r.getLong(r.fieldIndex(c)))
      assert(tokStats == want, s"doc=${r.getLong(0)}")
      val paras = text.split("\n\n", -1).toSeq
      val lines = text.split("\n", -1).toSeq
      assert(r.getLong(r.fieldIndex("n_paras")) == paras.size.toLong)
      assert(r.getLong(r.fieldIndex("n_dup_paras")) == refDup(paras)(1))
      assert(r.getLong(r.fieldIndex("dup_para_chars")) == refDup(paras)(2))
      assert(r.getLong(r.fieldIndex("n_para_chars")) == refDup(paras)(3))
      assert(r.getLong(r.fieldIndex("dup_line_chars")) == refDup(lines)(2))
      assert(r.getLong(r.fieldIndex("n_line_chars")) == refDup(lines)(3))
    }
  }

  test("native folds run inside whole-stage codegen (no CodegenFallback)") {
    // non-foldable source (range) so the projection cannot collapse to a
    // LocalTableScan — the folds must run inside the codegen'd stage
    val df = spark.range(2).select(
      GopherRepStats(split(concat_ws(" ", lit("a b a b"),
        col("id").cast("string")), " ")).as("o"),
      DupValueStats(split(concat_ws("\n", lit("x\nx"),
        col("id").cast("string")), "\n")).as("p"))
    // "*(1) Project" = the projection runs inside WholeStageCodegen, and
    // the generated source calls the static folds directly — the
    // CodegenFallback path would instead embed an interpreted .eval()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    val gen = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(gen.contains("graft.plans.GopherFolds.gopherStats"), gen.take(2000))
    assert(gen.contains("graft.plans.GopherFolds.dupStats"), gen.take(2000))
    assert(!gen.contains("CodegenFallback"), gen.take(2000))
    val row = df.orderBy("o.n_word_chars").collect().head
    // tokens = [a, b, a, b, "0"] -> 5 word chars, top2 "a b" count 2 -> 4
    assert(row.getStruct(0).getLong(0) == 5L)
    assert(row.getStruct(0).getLong(1) == 4L)
    // lines = [x, x, "0"] -> one repeated value of 1 char
    assert(row.getStruct(1).getLong(2) == 1L)
  }
}
