package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate pass shared by eval and generated code.
  *
  * Level 6 (zlib default), raw UTF-8 bytes in, compressed size out. A
  * fresh Deflater per call: the expression must be thread-safe under
  * whole-stage codegen (one generated class instance per task, but
  * speculative/local retries can interleave), and Deflater is not.
  * ~1-2 µs per short document — the same order as an md5 call, fine for
  * the per-row hot path.
  */
object DeflateRatioUtil {
  def ratio(text: UTF8String): Double = {
    val bytes = text.getBytes
    if (bytes.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](256)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      out.toDouble / bytes.length.toDouble
    } finally d.end()
  }
}

/** `deflate_ratio(text)` — compressed-size / raw-size of the UTF-8 bytes,
  * the Gopher/FineWeb-class repetitiveness signal: boilerplate and
  * near-duplicated spans compress far below natural text (ratio ≪ 0.4 on
  * ASCII prose flags machine-generated repetition that word-level
  * detectors miss). Codegen'd scalar — a narrow map over the scan, no
  * shuffle, embarrassingly parallel at 100 TB.
  *
  * Capability-matrix surface (unit-tested, not oracle-graded): DuckDB has
  * no deflate, so there is nothing for the driver's SQL oracle to replay.
  * Values are deterministic for a given zlib level and input on the JVM;
  * the spec pins ordering properties (repetitive < varied) rather than
  * exact bytes so a zlib upgrade can't silently break the suite.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(input: Any): Any =
    DeflateRatioUtil.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.DeflateRatioUtil.ratio($t);")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {
  /** Column form: `deflateRatio(col("text"))`. */
  def deflateRatio(text: Column): Column =
    GraftBridge.column(DeflateRatio(GraftBridge.expression(text)))
}
