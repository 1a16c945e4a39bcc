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
