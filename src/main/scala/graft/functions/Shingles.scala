package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level n-gram shingling shared by eval and generated code.
  *
  * Semantics are pinned to the composable form the dedup family's oracle
  * SQL mirrors: split on a single literal space, drop empty tokens, join
  * n consecutive tokens with one space. Tokenization scans raw UTF-8
  * bytes (0x20 never occurs inside a multi-byte sequence) and each
  * shingle is one byte-copy — no regex, no per-element lambda.
  */
object ShinglesUtil {
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // token boundaries (byte offsets), skipping empty tokens
    var nTok = 0
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && bytes(i) == ' ') i += 1
      if (i < len) {
        val s = i
        while (i < len && bytes(i) != ' ') i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = s
        ends(nTok) = i
        nTok += 1
      }
    }
    if (nTok < n) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](nTok - n + 1)
    var k = 0
    while (k <= nTok - n) {
      var sz = n - 1 // separators
      var j = 0
      while (j < n) { sz += ends(k + j) - starts(k + j); j += 1 }
      val buf = new Array[Byte](sz)
      var p = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(p) = ' '; p += 1 }
        val w = ends(k + j) - starts(k + j)
        System.arraycopy(bytes, starts(k + j), buf, p, w)
        p += w
        j += 1
      }
      out(k) = UTF8String.fromBytes(buf)
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** `shingle_ngrams(text, n)` — all n-word shingles of a document in one
  * codegen'd pass.
  *
  * The composable form (`transform(sequence(...), i -> concat_ws(' ',
  * slice(ws, i, n)))`) evaluates its lambda interpreted, per element —
  * profiled at ~20× the cost of this expression on the documents table —
  * and every dedup/fingerprint query funnels through shingling, so this
  * is the (b)-tier custom-Expression hot loop of SURVEY.md §7.3. Output
  * strings are byte-identical to the HOF form, so oracle SQL is
  * unchanged.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_ngrams expects (string, n>=1), got ${child.dataType.simpleString}, n=$n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_ngrams"

  override def nullSafeEval(input: Any): Any =
    ShinglesUtil.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.ShinglesUtil.shingles($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  /** Column form: `shingleNgrams(text, 5)`. */
  def shingleNgrams(text: Column, n: Int): Column =
    GraftBridge.column(Shingles(GraftBridge.expression(text), n))
}
