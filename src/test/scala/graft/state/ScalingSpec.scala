package graft.state

import org.scalatest.funsuite.AnyFunSuite
import Scaling.{run => _, _}

/** Exhaustive tests of the pure cooldown/clamp state machine (SURVEY.md
  * §5.2 item 4, §7.4 item 4) against the reference's published scaling
  * narrative (/root/reference/README.md:150-153,174-188). Property-style
  * cases run over a seeded deterministic sweep. */
class ScalingSpec extends AnyFunSuite {
  private val rules = referenceRules
  private val cons = referenceConstraints
  private def ev(t: Long, avg: Double) = WindowAvg("j-TEST", t, avg)

  test("scale-out fires at avg <= 25 and adds 5 nodes") {
    val (st, acts) = Scaling.run(rules, cons, ClusterState(1, Map.empty),
      Seq(ev(300, 10.0)))
    assert(acts == Seq(Action("j-TEST", "scale-out", 300, 1, 6)))
    assert(st.capacity == 6)
  }

  test("boundary: avg exactly 25 fires (LESS_THAN_OR_EQUAL), 75 does not (GREATER_THAN)") {
    val (_, out) = Scaling.run(rules, cons, ClusterState(1, Map.empty), Seq(ev(300, 25.0)))
    assert(out.map(_.rule) == Seq("scale-out"))
    val (_, in) = Scaling.run(rules, cons, ClusterState(1, Map.empty), Seq(ev(300, 75.0)))
    assert(in.isEmpty) // 75 is not > 75
  }

  test("cooldown suppresses repeats for 300s, then re-fires") {
    val events = Seq(ev(300, 10.0), ev(330, 10.0), ev(599, 10.0), ev(600, 10.0))
    val (st, acts) = Scaling.run(rules, cons, ClusterState(0, Map.empty), events)
    assert(acts.map(_.atSec) == Seq(300, 600)) // 330 & 599 suppressed
    assert(st.capacity == 10)
  }

  test("the README narrative: load spike 0 -> 15 task nodes in 3 actions") {
    // 30s-cadence alarm evaluations every 150 s; cooldown 300 s means
    // every other evaluation is suppressed: fires at 150, 450, 750
    val spike = (1 to 5).map(i => ev(150L * i, 5.0))
    val (st, acts) = Scaling.run(rules, cons, ClusterState(0, Map.empty), spike)
    assert(acts.map(a => (a.from, a.to)) ==
      Seq((0, 5), (5, 10), (10, 15)))
    assert(st.capacity == 15)
  }

  test("clamp at MaxCapacity 20; clamped action still recorded + cooldown starts") {
    val (st, acts) = Scaling.run(rules, cons, ClusterState(18, Map.empty),
      Seq(ev(300, 10.0), ev(700, 10.0)))
    assert(acts.map(a => (a.from, a.to)) == Seq((18, 20), (20, 20)))
    assert(st.capacity == 20)
  }

  test("scale-in: avg > 75 removes 2, clamped at MinCapacity 0") {
    val (st, acts) = Scaling.run(rules, cons, ClusterState(3, Map.empty),
      Seq(ev(300, 90.0), ev(700, 90.0), ev(1100, 90.0)))
    assert(acts.map(_.to) == Seq(1, 0, 0))
    assert(st.capacity == 0)
  }

  test("independent cooldowns per rule: out then in can both fire") {
    val (_, acts) = Scaling.run(rules, cons, ClusterState(5, Map.empty),
      Seq(ev(300, 10.0), ev(330, 90.0)))
    assert(acts.map(_.rule) == Seq("scale-out", "scale-in"))
  }

  test("a cooling rule yields to the next matching eligible rule") {
    val tiers = Seq(
      Rule("out-fast", "LESS_THAN_OR_EQUAL", 10.0, +10, 600L),
      Rule("out-slow", "LESS_THAN_OR_EQUAL", 25.0, +2, 0L))
    // 1st event fires out-fast; 2nd (still low, fast rule cooling) must
    // fall through to out-slow instead of doing nothing
    val (_, acts) = Scaling.run(tiers, cons, ClusterState(0, Map.empty),
      Seq(ev(300, 5.0), ev(600, 5.0)))
    assert(acts.map(_.rule) == Seq("out-fast", "out-slow"))
  }

  test("unknown comparison operator is rejected") {
    intercept[IllegalArgumentException](matches("BOGUS", 1.0, 2.0))
  }

  test("property sweep: capacity always within [min, max] on random traces") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val st0 = ClusterState(rnd.nextInt(21), Map.empty)
      val events = (1 to rnd.nextInt(30)).map(i =>
        ev(300L * i + rnd.nextInt(200), rnd.nextDouble() * 100))
      val (st, acts) = Scaling.run(rules, cons, st0, events)
      assert(st.capacity >= 0 && st.capacity <= 20)
      assert(acts.forall(a => a.to >= 0 && a.to <= 20))
    }
  }

  test("property sweep: clamp is idempotent and monotone") {
    val vals = -100 to 120
    vals.foreach(x => assert(clamp(clamp(x, cons), cons) == clamp(x, cons)))
    vals.sliding(2).foreach { case Seq(x, y) =>
      assert(clamp(x, cons) <= clamp(y, cons))
    }
  }
}
