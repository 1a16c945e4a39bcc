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
}
