package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave shared by eval and generated code: the
  * low 16 bits of each key, bit-interleaved into a 32-bit curve key
  * (a on even bit positions, b on odd). */
object ZOrderUtil {
  def interleave16(a: Long, b: Long): Long = {
    var x = a & 0xffffL
    var y = b & 0xffffL
    // classic bit-spreading (Morton encode via magic masks)
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    y = (y | (y << 8)) & 0x00ff00ffL
    y = (y | (y << 4)) & 0x0f0f0f0fL
    y = (y | (y << 2)) & 0x33333333L
    y = (y | (y << 1)) & 0x55555555L
    x | (y << 1)
  }

  /** The same function as portable SQL over BIGINTs — one shared
    * generator so engine and oracle can never disagree. */
  def interleaveSql(a: String, b: String): String =
    (0 until 16).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " + ", ")")
}

/** `zorder_key(a, b)` — 32-bit Morton key over the low 16 bits of two
  * integral columns.
  *
  * The data-layout primitive for multi-dimensional pruning at scale:
  * sort/cluster a 100 TB table by this key and parquet row-group min/max
  * stats become selective for range predicates on EITHER dimension —
  * neighboring curve keys are neighbors in both `a` and `b`, unlike a
  * lexicographic sort which prunes only its leading column. Codegen'd
  * (b)-tier Expression like [[DotProduct]]/[[Shingles]].
  */
case class ZOrderKey(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_key expects two bigint arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderUtil.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderUtil.interleave16($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  def zorderKey(a: Column, b: Column): Column =
    GraftBridge.column(ZOrderKey(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
