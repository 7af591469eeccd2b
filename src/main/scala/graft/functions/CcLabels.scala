package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Local connected components over an edge array, shared by eval and
  * generated code.
  *
  * Input: one element per (possibly directed/duplicated) edge (a, b).
  * Output: one element per distinct node, (doc_id, cluster) where
  * cluster is the MINIMUM node id in the node's component — exactly the
  * fixed point of `Dedup.ccLabels`' min-label propagation, computed by
  * weighted union-find in O(E α(E)) instead of O(diameter) distributed
  * rounds. Result is independent of edge order (components and their
  * minima are set properties), emitted sorted by doc_id. */
object CcLabelsUtil {
  def minLabels(edges: ArrayData): ArrayData = {
    val m = edges.numElements()
    val idx = new java.util.HashMap[java.lang.Long, Integer](m * 2)
    val ids = new scala.collection.mutable.ArrayBuffer[Long](m * 2)
    val parent = new scala.collection.mutable.ArrayBuffer[Int](m * 2)
    val rank = new scala.collection.mutable.ArrayBuffer[Int](m * 2)
    def nodeOf(id: Long): Int = {
      val got = idx.get(id)
      if (got != null) got.intValue()
      else {
        val i = ids.length
        idx.put(id, i)
        ids += id; parent += i; rank += 0
        i
      }
    }
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) {
        parent(x) = parent(parent(x))
        x = parent(x)
      }
      x
    }
    var e = 0
    while (e < m) {
      val row = edges.getStruct(e, 2)
      val ra = find(nodeOf(row.getLong(0)))
      val rb = find(nodeOf(row.getLong(1)))
      if (ra != rb) {
        if (rank(ra) < rank(rb)) parent(ra) = rb
        else if (rank(ra) > rank(rb)) parent(rb) = ra
        else { parent(rb) = ra; rank(ra) += 1 }
      }
      e += 1
    }
    val n = ids.length
    // min node id per root
    val minOf = new Array[Long](n)
    java.util.Arrays.fill(minOf, Long.MaxValue)
    var i = 0
    while (i < n) {
      val r = find(i)
      if (ids(i) < minOf(r)) minOf(r) = ids(i)
      i += 1
    }
    val order = (0 until n).sortBy(ids(_))
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val v = order(i)
      out(i) = InternalRow(ids(v), minOf(find(v)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `cc_min_labels(edges)` — connected-component min-labels of a bounded
  * edge group in one pass. The callers guarantee the bound: every edge
  * group is one (label, SRP-bucket) cell, whose population the plane
  * count holds constant as the corpus grows, so the per-group work is
  * corpus-size-independent — the distributed loop this replaces paid
  * O(log diameter) whole-relation shuffles instead. */
case class CcMinLabels(child: Expression) extends UnaryExpression {

  private def okInput(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(fs), _) =>
      fs.length == 2 && fs.forall(_.dataType == LongType)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okInput(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cc_min_labels expects array<struct<bigint,bigint>>, got " +
        child.dataType.simpleString)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("cluster", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "cc_min_labels"

  override def nullSafeEval(input: Any): Any =
    CcLabelsUtil.minLabels(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.CcLabelsUtil.minLabels($t);")

  override protected def withNewChildInternal(newChild: Expression): CcMinLabels =
    copy(child = newChild)
}

object CcMinLabels {
  /** Column form: `ccMinLabels(edgeArray)`. */
  def of(edges: Column): Column =
    GraftBridge.column(CcMinLabels(GraftBridge.expression(edges)))
}
