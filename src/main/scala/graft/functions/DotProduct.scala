package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `dot_product(a, b)` — fused dot product over two double arrays.
  *
  * The composable form, `aggregate(zip_with(a, b, _*_), 0d, _+_)`, first
  * materializes an intermediate array per row; on an all-pairs similarity
  * scan that allocation dominates. This expression loops directly over the
  * unsafe `ArrayData` in generated code — no allocation, stays inside
  * whole-stage codegen — which is the (b)-tier custom-Expression path of
  * SURVEY.md §7.3 for the one hot loop the built-ins can't fuse.
  *
  * Semantics match the HOF form bit-for-bit: left-to-right IEEE summation
  * from a 0.0 seed (the oracle-parity requirement of SURVEY.md §2B Q31),
  * INCLUDING null propagation — a null element anywhere in the overlapped
  * range nulls the whole product, exactly like the HOF fold (reading the
  * slot as 0.0 instead would silently compute a wrong norm and let a
  * corrupt vector win a top-k).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // length mismatch → null, like the HOF form (zip_with null-pads the
    // shorter array, so the fold's sum is null); truncating to the
    // shorter length instead would hand a corrupt vector a plausible
    // partial score
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($x.numElements() != $y.numElements()) { ${ev.isNull} = true; }
         |int $n = $x.numElements();
         |double $s = 0.0;
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column form: `dot(a, b)` over `array<double>` columns. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
