package graft.state

/** Pure scaling decision core — the reference's CloudWatch-alarm + EMR
  * autoscaler semantics (SURVEY.md §3.3) as a total function
  * `(State, Event) => (State, Seq[Action])`, kept Spark-free so it is
  * exhaustively unit-testable; graft.streaming wraps it in
  * `flatMapGroupsWithState`.
  *
  * Semantics mirrored from /root/reference/config/instance-group-config.json:
  *  - threshold predicates with a ComparisonOperator vocabulary (:47-51,:76-80)
  *  - CHANGE_IN_CAPACITY additive adjustment (:30-33,:59-62)
  *  - capacity clamp to [MinCapacity, MaxCapacity] (:21-24)
  *  - per-rule CoolDown suppression, 300 s (:33,:62)
  */
object Scaling {

  /** One autoscaling rule (instance-group-config.json `Rules[*]`). */
  final case class Rule(
      name: String,
      comparison: String, // CloudWatch ComparisonOperator vocabulary
      threshold: Double,
      adjustment: Int,    // CHANGE_IN_CAPACITY delta (+5 out / -2 in)
      cooldownSec: Long)

  final case class Constraints(minCapacity: Int, maxCapacity: Int)

  /** A windowed metric observation (the alarm evaluator's input). */
  final case class WindowAvg(clusterId: String, windowEndSec: Long, avg: Double)

  final case class Action(
      clusterId: String, rule: String, atSec: Long, from: Int, to: Int)

  /** Mutable-free cluster state carried across events. */
  final case class ClusterState(
      capacity: Int, lastFiredSec: Map[String, Long]) {
    def inCooldown(rule: Rule, nowSec: Long): Boolean =
      lastFiredSec.get(rule.name).exists(t => nowSec - t < rule.cooldownSec)
  }

  /** The reference's two rules with their published thresholds. */
  val referenceRules: Seq[Rule] = Seq(
    Rule("scale-out", "LESS_THAN_OR_EQUAL", 25.0, +5, 300L),
    Rule("scale-in", "GREATER_THAN", 75.0, -2, 300L))

  val referenceConstraints: Constraints = Constraints(0, 20)

  /** The ComparisonOperator mini-compiler (SURVEY.md §2A R15). */
  def matches(comparison: String, avg: Double, threshold: Double): Boolean =
    comparison match {
      case "LESS_THAN_OR_EQUAL"    => avg <= threshold
      case "LESS_THAN"             => avg < threshold
      case "GREATER_THAN"          => avg > threshold
      case "GREATER_THAN_OR_EQUAL" => avg >= threshold
      case other =>
        throw new IllegalArgumentException(s"unknown comparison: $other")
    }

  def clamp(cap: Int, c: Constraints): Int =
    math.min(math.max(cap, c.minCapacity), c.maxCapacity)

  /** Process one windowed observation: first matching rule not in cooldown
    * fires; the adjustment is clamped; a clamped no-op (already at the
    * bound) still starts the cooldown — matching EMR, which records the
    * scaling activity even when capacity is pinned. */
  def step(rules: Seq[Rule], cons: Constraints, st: ClusterState,
      ev: WindowAvg): (ClusterState, Seq[Action]) = {
    rules.find(r => matches(r.comparison, ev.avg, r.threshold) &&
        !st.inCooldown(r, ev.windowEndSec)) match {
      case Some(r) =>
        val next = clamp(st.capacity + r.adjustment, cons)
        val st2 = ClusterState(next,
          st.lastFiredSec + (r.name -> ev.windowEndSec))
        val act = Action(ev.clusterId, r.name, ev.windowEndSec,
          st.capacity, next)
        (st2, Seq(act))
      case _ => (st, Nil)
    }
  }

  /** Fold a (time-ordered) event sequence — the batch/test entry point. */
  def run(rules: Seq[Rule], cons: Constraints, init: ClusterState,
      events: Seq[WindowAvg]): (ClusterState, Seq[Action]) =
    events.sortBy(e => (e.windowEndSec, e.clusterId))
      .foldLeft((init, Vector.empty[Action])) { case ((st, acts), ev) =>
        val (st2, a) = step(rules, cons, st, ev)
        (st2, acts ++ a)
      }
}
