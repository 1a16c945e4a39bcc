package graft

import java.sql.Timestamp

import graft.operators.Alerts
import graft.operators.Alerts.{AlertConfig, MatchRow}

/** Property-style tests (seeded random sampling) for alert fold
  * invariants: conservation, ordering, window anchoring, activation, and
  * batch/stream replay equivalence.
  */
class PropertiesSpec extends SparkSpec {

  private val rng = new scala.util.Random(42)

  private def randomCase(): (List[MatchRow], AlertConfig) = {
    val n = rng.nextInt(40)
    val ms = List.tabulate(n)(i =>
      MatchRow("r", "k", i.toLong, new Timestamp(rng.nextLong(100000L) * 1000L)))
    val cfg = AlertConfig(1 + rng.nextInt(5), 60L + rng.nextLong(7200L))
    (ms, cfg)
  }

  test("duplicateClusters matches brute-force union-find on random graphs") {
    import spark.implicits._
    val g = new scala.util.Random(1234)
    for (trial <- 1 to 5) {
      val n = 20 + g.nextInt(30)
      val nEdges = g.nextInt(n) // sparse → many components, some chains
      val edges = List.fill(nEdges)((g.nextInt(n).toLong, g.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference: textbook union-find with path compression
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n)
        .map(i => i.toLong -> (0 until n).filter(j => find(j) == find(i)).min.toLong)
        .toMap
      val out = graft.operators.Dedup.duplicateClusters(
          (0L until n.toLong).toDF("id"),
          edges.toDF("id1", "id2"))
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap
      assert(out == expected, s"trial $trial: n=$n edges=$edges")
    }
  }

  test("fold conserves matches, orders alerts, respects window anchoring") {
    for (_ <- 1 to 300) {
      val (ms, cfg) = randomCase()
      val sorted = ms.sortBy(_.ts.getTime)
      val out = Alerts.foldKey("r", "k", sorted, cfg)
      assert(out.map(_.match_count).sum == ms.length)
      out.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.first_matched_at.getTime + cfg.windowSeconds * 1000 <= b.first_matched_at.getTime)
        case _ =>
      }
      out.foreach { a =>
        assert(a.last_matched_at.getTime < a.first_matched_at.getTime + cfg.windowSeconds * 1000)
        assert(a.activated == (a.match_count >= cfg.threshold))
        assert(a.created_at.isDefined == a.activated)
        assert(a.first_matched_at.getTime <= a.last_matched_at.getTime)
      }
      assert(Alerts.foldKey("r", "k", sorted, cfg) == out)
    }
  }

  test("luhnValid agrees with a reference Luhn on random digit strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def refLuhn(digits: String): Boolean = {
      val ds = digits.reverse.map(_ - '0')
      ds.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum % 10 == 0
    }
    val g = new scala.util.Random(77)
    val cands = List.fill(300) {
      val n = 13 + g.nextInt(7)
      val digits = List.fill(n)(g.nextInt(10)).mkString
      // random separator placement as the regex would capture it
      digits.grouped(4).mkString(if (g.nextBoolean()) "-" else " ")
    }
    val out = cands.toDF("c")
      .withColumn("v", graft.operators.Privacy.luhnValid(col("c")))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cands.foreach { c =>
      val expected = refLuhn(c.replaceAll("[ -]", ""))
      assert(out(c) == expected, s"$c: spark=${out(c)} ref=$expected")
    }
  }

  test("chunkByTokens: full coverage, exact overlap, text round-trip on random docs") {
    import spark.implicits._
    val g = new scala.util.Random(9)
    for (_ <- 1 to 5) {
      val maxT = 2 + g.nextInt(30)
      val stride = 1 + g.nextInt(maxT)
      val docs = (0L until 40L).map { id =>
        (id, List.fill(g.nextInt(80))("t" + g.nextInt(50)).mkString(" "))
      }
      val byId = docs.toMap
      val out = graft.operators.Curation
        .chunkByTokens(docs.toDF("doc_id", "text"), "doc_id", "text", maxT, stride)
        .collect()
        .groupBy(_.getAs[Long]("doc_id"))
      for (id <- docs.map(_._1)) {
        val toks = byId(id).split("\\s+").filter(_.nonEmpty)
        out.get(id) match {
          case None => assert(toks.isEmpty) // only empty docs produce no chunks
          case Some(rows) =>
            val chunks = rows.sortBy(_.getAs[Long]("chunk_id"))
            // starts are exactly 0, stride, …, last < n
            assert(chunks.map(_.getAs[Long]("chunk_start")).toSeq ==
              (0L to (toks.length - 1) / stride * stride by stride.toLong).toSeq)
            chunks.foreach { r =>
              val s = r.getAs[Long]("chunk_start").toInt
              val expect = toks.slice(s, s + maxT)
              assert(r.getAs[Long]("n_chunk_tokens") == expect.length)
              assert(r.getAs[String]("chunk_text") == expect.mkString(" "))
            }
            // every token covered
            val covered = chunks.flatMap { r =>
              val s = r.getAs[Long]("chunk_start")
              s until s + r.getAs[Long]("n_chunk_tokens")
            }.toSet
            assert(covered == toks.indices.map(_.toLong).toSet)
        }
      }
    }
  }

  test("languageIdMulti: confidence is the max ratio and threshold gates unk") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val g = new scala.util.Random(5)
    val words = TextAnalysis.lexicons.values.flatten.toVector ++
      Vector.fill(30)("zz" + g.nextInt(1000))
    val docs = (0L until 60L).map(id =>
      (id, List.fill(g.nextInt(40))(words(g.nextInt(words.length))).mkString(" ")))
    val langs = TextAnalysis.lexicons.keys.toSeq.sorted
    graft.operators.TextAnalysis.languageIdMulti(docs.toDF("doc_id", "text"), "text")
      .collect().foreach { r =>
        val ratios = langs.map(l => l -> r.getAs[Double](s"r_$l"))
        val conf = r.getAs[Double]("lang_conf")
        val pred = r.getAs[String]("lang_pred")
        assert(conf == ratios.map(_._2).max)
        assert(ratios.forall { case (_, v) => v >= 0.0 && v <= 1.0 })
        if (pred == "unk") assert(conf < 0.08)
        else {
          assert(conf >= 0.08)
          // the prediction is an argmax (largest code on exact ties)
          assert(ratios.filter(_._2 == conf).map(_._1).max == pred)
        }
      }
  }

  test("streaming step replays to the same alerts as the batch fold") {
    for (_ <- 1 to 300) {
      val (ms, cfg) = randomCase()
      val sorted = ms.sortBy(m => Alerts.tsToUs(m.ts))
      val batch = Alerts.foldKey("r", "k", sorted, cfg)
      var state: Option[graft.streaming.AlertStream.KeyState] = None
      val emitted = scala.collection.mutable.ArrayBuffer.empty[Alerts.AlertRow]
      for (m <- sorted) {
        val (closed, next) = graft.streaming.AlertStream.step(state, Alerts.tsToUs(m.ts), cfg)
        closed.foreach(c => emitted += graft.streaming.AlertStream.stateToRow("r", "k", c, cfg))
        state = Some(next)
      }
      state.foreach(c => emitted += graft.streaming.AlertStream.stateToRow("r", "k", c, cfg))
      assert(emitted.toList == batch.toList)
    }
  }

  test("cdcChunks properties on random text: exact tiling, determinism, edit locality") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val g = new scala.util.Random(7)
    val words = Seq("key", "agg", "row", "scan", "slow", "fast", "table", "值", "数据")
    def randText(n: Int) = Seq.fill(n)(words(g.nextInt(words.length))).mkString(" ")
    val docs = (1L to 30L).map(i => (i, randText(g.nextInt(120)))).toDF("doc_id", "text")
    val chunks = operators.Dedup.cdcChunks(docs, "doc_id", "text", window = 4, divisor = 32)
      .collect().groupBy(_.getLong(0))
    val norm = docs.select(col("doc_id"), lower(trim(col("text"))))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, t) <- norm if t.nonEmpty) {
      val rows = chunks(id).sortBy(_.getLong(1))
      // tiling: starts chain and lengths sum to the normalized length
      rows.foldLeft(0L) { (pos, r) =>
        assert(r.getLong(2) == pos, s"doc $id start ${r.getLong(2)} != $pos")
        pos + r.getLong(3)
      }
      assert(rows.map(_.getLong(3)).sum == t.codePointCount(0, t.length),
        s"doc $id lens != codepoint length")
      // every chunk hash is the md5 of the chunk it claims to cover
      // (spot-check the first/last to keep the test fast)
      for (r <- Seq(rows.head, rows.last)) {
        val cps = t.codePoints.toArray
        val sub = new String(cps, r.getLong(2).toInt, r.getLong(3).toInt)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(sub.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(r.getString(4) == md, s"doc $id chunk hash mismatch")
      }
    }
    // edit locality (the CDC property): a one-word prefix edit leaves the
    // tail chunks' hash multiset nearly intact on every doc
    val edited = docs.select(col("doc_id"),
      concat(lit("edited prefix "), col("text")).as("text"))
    val chunks2 = operators.Dedup.cdcChunks(edited, "doc_id", "text",
        window = 4, divisor = 32)
      .collect().groupBy(_.getLong(0))
    for ((id, t) <- norm if t.length > 200) {
      val h1 = chunks(id).map(_.getString(4)).toSet
      val h2 = chunks2(id).map(_.getString(4)).toSet
      assert((h1 intersect h2).size >= h1.size - 2,
        s"doc $id: prefix edit rewrote ${h1.size - (h1 intersect h2).size} of ${h1.size} chunks")
    }
  }

  test("removeBoilerplateSegments properties: clean text ⊆ original, counts consistent") {
    import spark.implicits._
    val g = new scala.util.Random(11)
    val words = Seq("a", "b", "c", "d", "e", "f")
    def randText(n: Int) = Seq.fill(n)(words(g.nextInt(words.length))).mkString(" ")
    val docs = (1L to 40L).map(i => (i, randText(3 * (1 + g.nextInt(20))))).toDF("doc_id", "text")
    val out = operators.Curation.removeBoilerplateSegments(docs, "doc_id", "text",
        segTokens = 3, minDocs = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, (nSeg, nBp, clean)) <- out) {
      val toks = orig(id).split("\\s+").filter(_.nonEmpty)
      assert(nSeg == math.ceil(toks.length / 3.0).toLong)
      assert(nBp >= 0 && nBp <= nSeg)
      // surviving text is a subsequence of the original segments, in order
      val segs = toks.grouped(3).map(_.mkString(" ")).toList
      val kept = if (clean.isEmpty) Nil else clean.split(" ").grouped(3).map(_.mkString(" ")).toList
      // every kept window of 3 appears among original segments; counts line up
      assert(nSeg - nBp == (if (clean.isEmpty) 0L else {
        // reconstruct kept segment count from the token count of clean
        val ct = clean.split("\\s+").count(_.nonEmpty)
        // all segments are 3 tokens except possibly the original tail —
        // kept tokens = 3*(kept full segs) + (tail if kept)
        val tail = toks.length % 3
        val tailKept = tail != 0 && clean.endsWith(segs.last)
        if (tailKept) ((ct - tail) / 3 + 1).toLong else (ct / 3).toLong
      }), s"doc $id segment accounting")
      assert(segs.containsSlice(kept.takeWhile(_.length == 5)) || kept.forall(segs.contains),
        s"doc $id kept segments not drawn from original")
    }
  }
}
