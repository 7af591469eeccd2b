package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deserialize-and-point-query pass for a hex-encoded
  * `org.apache.spark.util.sketch.CountMinSketch` column (the consumer
  * side of `count_min_sketch(...)` aggregates). Fresh deserialization per
  * call keeps the expression thread-safe under whole-stage codegen; the
  * input is an aggregated (group-count-sized) relation, so the parse cost
  * is per GROUP, not per base row. */
object CmsProbeUtil {
  def estimate(hex: UTF8String, key: Long): Long = {
    val s = hex.toString
    // an odd length would otherwise drop the trailing nibble and hand a
    // truncated buffer to readFrom — corruption must surface, not parse
    require(s.length % 2 == 0,
      s"cms_estimate: hex sketch has odd length ${s.length} — truncated or corrupt input")
    val bytes = new Array[Byte](s.length / 2)
    var i = 0
    while (i < bytes.length) {
      bytes(i) = Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes)).estimateCount(key)
  }
}

/** `cms_estimate(cms_hex, key)` — CMS point estimate for a bigint key.
  * Codegen'd scalar replacing the engine's last Scala-udf consumer, so
  * the sketch-probe projection stays inside the whole-stage span. */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects (string, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(h: Any, k: Any): Any =
    CmsProbeUtil.estimate(h.asInstanceOf[UTF8String], k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, k) =>
      s"${ev.value} = graft.functions.CmsProbeUtil.estimate($h, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  /** Column form: `cmsEstimate(col("cms_hex"), col("key"))`. */
  def cmsEstimate(hex: Column, key: Column): Column =
    GraftBridge.column(
      CmsEstimate(GraftBridge.expression(hex), GraftBridge.expression(key)))
}
