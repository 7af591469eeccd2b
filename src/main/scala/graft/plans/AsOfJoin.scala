package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, AttributeMap, Expression, GenericInternalRow, JoinedRow, PredicateHelper, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf

/** Native as-of join — the whole-operator (c)-tier of SURVEY.md §7.3: a
  * custom `LogicalPlan` + `SparkStrategy` + `SparkPlan` registered through
  * `SparkSessionExtensions` for semantics the built-in operators can only
  * express with a window over a unioned stream (SURVEY.md §2B Q38).
  *
  * Semantics (the standard trade/quote as-of): for every left row, append
  * the single right row with the same key and the greatest right timestamp
  * `<=` the left timestamp (inclusive), or nulls when none exists. Rows
  * whose key or timestamp is null never match — SQL equality semantics.
  * For a deterministic result the right side must be unique per
  * `(key, ts)` (pre-aggregate ties away, e.g. with `max_by`), the same
  * contract DuckDB's `ASOF JOIN` has.
  *
  * Scale shape: both sides hash-cluster on the join key and sort within
  * partitions on `(key, ts)` — exactly a sort-merge join's distribution,
  * so at 100 TB it is one co-partitioned shuffle per side, no broadcast,
  * no per-row backward probe, and the merge itself is a single forward
  * pass holding ONE remembered right row (no per-key buffering, so a hot
  * key cannot OOM an executor the way a buffered window partition can).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    "as-of join needs matching, non-empty key lists")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Predicate pushdown through [[AsOfJoinPlan]] — Catalyst cannot push
  * filters through nodes it does not know, so without this rule a filter
  * over an as-of join runs AFTER the join, scanning and shuffling rows the
  * query provably discards. Each left row produces exactly one output row,
  * so any conjunct referencing only left columns filters identically
  * before the join; conjuncts on the JOIN KEYS additionally transfer to
  * the right side (a right row only matters if its key survives on the
  * left). At 100 TB this is the difference between shuffling the whole
  * probe table and shuffling one user's slice. Injected via
  * `GraftExtensions.injectOptimizerRule`. */
object AsOfJoinPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val (pushable, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic &&
          p.references.subsetOf(aj.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val newLeft = Filter(pushable.reduce(And), aj.left)
        // key-only conjuncts also prune the right side, rewritten onto
        // the matching right key attributes
        val keyAttrs = aj.leftKeys.zip(aj.rightKeys).collect {
          case (l: Attribute, r: Attribute) => l -> r
        }
        val keyMap = AttributeMap(keyAttrs)
        val rightPreds = pushable
          .filter(_.references.subsetOf(
            org.apache.spark.sql.catalyst.expressions.AttributeSet(
              keyAttrs.map(_._1))))
          .map(_.transform { case a: Attribute if keyMap.contains(a) =>
            keyMap(a) })
        val newRight =
          if (rightPreds.isEmpty) aj.right
          else Filter(rightPreds.reduce(And), aj.right)
        val pushed = aj.copy(left = newLeft, right = newRight)
        if (rest.isEmpty) pushed else Filter(rest.reduce(And), pushed)
      }
  }
}

/** Plans [[AsOfJoinPlan]], choosing the physical shape from statistics the
  * way Spark's own join strategy does: a right side under the session's
  * `autoBroadcastJoinThreshold` broadcasts ([[BroadcastAsOfJoinExec]] — the
  * 100 TB probe side is never shuffled at all); otherwise both sides
  * hash-cluster and merge ([[AsOfJoinExec]]). Under AQE the planner re-runs
  * on runtime stats, so the choice self-corrects after the right side's
  * aggregation actually executes. Injected via `GraftExtensions` (and
  * idempotently by [[AsOfJoin.asofJoin]] for sessions built without
  * extensions). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      val threshold = SQLConf.get.autoBroadcastJoinThreshold
      if (threshold > 0 && r.stats.sizeInBytes <= threshold)
        BroadcastAsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
      else
        AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: children are hash-clustered on the keys and
  * sorted by `(keys, ts)`, then each co-partition pair is merged in one
  * forward pass that remembers only the latest qualifying right row. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val (lKeyE, rKeyE, lTsE, rTsE) = (leftKeys, rightKeys, leftTs, rightTs)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyE, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyE, rightOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsE), leftOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsE), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyE.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTsE.dataType))
      // Bind against nullability-WIDENED right attrs: unmatched left rows
      // pair with an all-null row, so a non-nullable binding would skip the
      // null check in codegen and read garbage zeros.
      val outProj = UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow

      // Current right cursor (copies: sort iterators reuse row buffers).
      var rValid = false
      var rRow: InternalRow = null
      var rKey: UnsafeRow = null
      var rTs: UnsafeRow = null
      // Latest right row whose (key, ts) qualified for some left row.
      var matchedRow: InternalRow = null
      var matchedKey: UnsafeRow = null

      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rRow = rIter.next().copy()
          rKey = rKeyProj(rRow).copy()
          rTs = rTsProj(rRow).copy()
          rValid = true
        } else rValid = false
      advanceRight()

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTs = lTsProj(lRow)
        if (lKey.anyNull || lTs.isNullAt(0)) joined(lRow, nullRight)
        else {
          // Advance right past every row at-or-before (lKey, lTs); the last
          // same-key, non-null-ts row seen is the as-of match. Both inputs
          // are sorted, so the cursor only ever moves forward.
          var advancing = rValid
          while (advancing) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) { advanceRight(); advancing = rValid }
            else if (c == 0 && tsOrd.compare(rTs, lTs) <= 0) {
              if (!rTs.isNullAt(0)) { matchedRow = rRow; matchedKey = rKey }
              advanceRight(); advancing = rValid
            } else advancing = false
          }
          if (matchedRow != null && keyOrd.compare(matchedKey, lKey) == 0)
            joined(lRow, matchedRow)
          else joined(lRow, nullRight)
        }
      }.map(outProj)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast as-of join: the right side ships to every executor whole
  * (IdentityBroadcastMode), gets indexed per task as key → ts-sorted rows,
  * and each left partition probes it with a binary search — the LEFT SIDE
  * IS NEVER SHUFFLED OR SORTED, which is the whole point when the probe
  * side is the 100 TB one. Build cost is per task over the broadcast
  * array, same trade Spark's own BroadcastHashJoin makes. */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val (lKeyE, rKeyE, lTsE, rTsE) = (leftKeys, rightKeys, leftTs, rightTs)
    val broadcastRight = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions({ lIter =>
      val lKeyProj = UnsafeProjection.create(lKeyE, leftOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsE), leftOut)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTsE.dataType))
      val outProj = UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow

      // key → rows sorted by ts, built ONCE per executor per broadcast
      // (BroadcastHashJoin shares its HashedRelation the same way —
      // rebuilding per left partition would multiply build cost by the
      // task count); null-key/null-ts rows can never match
      val sorted = BroadcastAsOfJoinExec.cachedIndex(broadcastRight.id, () => {
        val rKeyProj = UnsafeProjection.create(rKeyE, rightOut)
        val rTsProj = UnsafeProjection.create(Seq(rTsE), rightOut)
        val index = scala.collection.mutable.HashMap
          .empty[UnsafeRow, scala.collection.mutable.ArrayBuffer[(UnsafeRow, InternalRow)]]
        broadcastRight.value.foreach { r =>
          val k = rKeyProj(r)
          val t = rTsProj(r)
          if (!k.anyNull && !t.isNullAt(0)) {
            var buf = index.getOrElse(k, null)
            if (buf == null) { // copy the projected key only on first sight
              buf = scala.collection.mutable.ArrayBuffer
                .empty[(UnsafeRow, InternalRow)]
              index.put(k.copy(), buf)
            }
            buf += ((t.copy(), r))
          }
        }
        index.view.mapValues(
          _.sortWith((a, b) => tsOrd.compare(a._1, b._1) < 0).toArray).toMap
      })

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTs = lTsProj(lRow)
        val m =
          if (lKey.anyNull || lTs.isNullAt(0)) null
          else sorted.get(lKey).map { rows =>
            // greatest index with rows(i).ts <= lTs
            var lo = 0
            var hi = rows.length - 1
            var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (tsOrd.compare(rows(mid)._1, lTs) <= 0) { ans = mid; lo = mid + 1 }
              else hi = mid - 1
            }
            if (ans >= 0) rows(ans)._2 else null
          }.orNull
        outProj(joined(lRow, if (m == null) nullRight else m))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object BroadcastAsOfJoinExec {
  private type Index =
    scala.collection.Map[UnsafeRow, Array[(UnsafeRow, InternalRow)]]
  // Executor-wide derived-index cache keyed by broadcast id. Soft refs let
  // the JVM reclaim an index under memory pressure (it is rebuilt from the
  // still-broadcast rows on the next probe).
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    Long, java.lang.ref.SoftReference[Index]]()

  private[plans] def cachedIndex(id: Long, build: () => Index): Index = {
    val ref = cache.get(id)
    val hit = if (ref == null) null else ref.get()
    if (hit != null) hit
    else {
      val built = build() // racing tasks may build twice; last write wins
      cache.put(id, new java.lang.ref.SoftReference(built))
      built
    }
  }
}

object AsOfJoin {
  /** As-of join `left` to `right` on equal keys with the latest
    * `right.tsRight <= left.tsLeft`; output is all left columns followed by
    * all right columns (nulls when unmatched). Column name collisions are
    * the caller's to avoid (alias the right side). */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTsCol: String, rightTsCol: String): DataFrame = {
    GraftBridge.withExtraStrategy(left.sparkSession, AsOfJoinStrategy)
    val lp = GraftBridge.analyzed(left)
    val rp = GraftBridge.analyzed(right)
    // self-join guard: the custom node does no attribute deduplication
    // (stock Spark's Join gets it from the analyzer's DeduplicateRelations,
    // which doesn't know this plan) — shared expression IDs would bind
    // right-side columns to LEFT ordinals and silently return the probe
    // row's own values. Loud beats wrong: re-alias one side first.
    val shared = lp.outputSet.intersect(rp.outputSet)
    if (shared.nonEmpty) throw new IllegalArgumentException(
      "asofJoin: both sides share attribute IDs (" +
        shared.toSeq.map(_.name).mkString(", ") +
        ") — a self-join must re-create one side's columns first, e.g. " +
        "df.select(df.columns.map(c => col(c).as(c)): _*).toDF(df.columns: _*)" +
        " or rebuild it from the source")
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"column '$n' not found among ${p.output.map(_.name).mkString(", ")}"))
    GraftBridge.ofRows(left.sparkSession, AsOfJoinPlan(lp, rp,
      leftKeys.map(attr(lp, _)), rightKeys.map(attr(rp, _)),
      attr(lp, leftTsCol), attr(rp, rightTsCol)))
  }
}
