package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** `LshProject(vec, dirs, nPlanes)` — signed-random-projection LSH bucket
  * for one embedding row, fused into a single codegen'd expression.
  *
  * Semantics are bit-for-bit the composable form it replaces
  * (llm/Dedup.scala `lshBucketSql`): per plane p, project the vector onto
  * the ±1 direction row `dirs(p)` with every element first pushed through
  * Spark's exact `CAST(CAST(v AS DOUBLE) AS DECIMAL(20,10))`, sum the
  * scale-10 decimals exactly, and set bit p of the bucket iff the sum is
  * positive. A DECIMAL(20,10) is an integer count of 1e-10 units, so the
  * exact-decimal sum is a long sum of unscaled values — same number, no
  * BigDecimal accumulator — and the scaling itself replays Spark's cast
  * (shortest double repr, HALF_UP at scale 10) so oracle parity is
  * untouched.
  *
  * Why it exists: the HOF form — `aggregate(zip_with(...))` folding
  * DECIMAL(38,10) — does not participate in whole-stage codegen and runs
  * interpreted BigDecimal math per element per plane (~1.7 ms/row at
  * dim 64). This expression scales each element ONCE (not once per
  * plane), keeps the per-plane sums in longs, and stays inside codegen —
  * the same (b)-tier custom-Expression move as [[DotProduct]] and
  * [[Shingles]], for the same reason.
  */
case class LshProject(child: Expression, dirs: Seq[Seq[Int]], nPlanes: Int)
  extends UnaryExpression {

  require(nPlanes >= 1 && nPlanes <= 63 && dirs.length >= nPlanes,
    s"LshProject: need 1..63 planes with a direction row each, got " +
      s"$nPlanes planes over ${dirs.length} rows")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"LshProject expects array<float> or array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_project"

  /** Direction rows must be rectangular: one sign per supported dim. */
  @transient private lazy val rowLen: Int = {
    val n = dirs.head.length
    require(dirs.take(nPlanes).forall(_.length == n),
      "LshProject: ragged direction matrix")
    n
  }

  @transient private lazy val flatDirs: Array[Int] =
    dirs.take(nPlanes).flatten.toArray

  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n > rowLen) throw new IllegalStateException(
      s"embedding dim $n exceeds the $rowLen-dim LSH plane matrix")
    val sums = new Array[Long](nPlanes)
    var i = 0
    while (i < n) {
      // a null element null-propagated every plane's decimal sum in the
      // HOF fold this replaces — its `sum > 0` was null, so every IF took
      // the 0 branch and the bucket was 0; replicate exactly
      if (arr.isNullAt(i)) return 0L
      val v = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val sc = LshProject.scale10(v)
      var p = 0
      while (p < nPlanes) {
        sums(p) = Math.addExact(sums(p),
          if (flatDirs(p * rowLen + i) > 0) sc else -sc)
        p += 1
      }
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      if (sums(p) > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dirsRef = ctx.addReferenceObj("lshDirs", flatDirs, "int[]")
    val getter = if (elemIsFloat) "(double) %s.getFloat(%s)" else "%s.getDouble(%s)"
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val sums = ctx.freshName("sums")
      val sc = ctx.freshName("sc")
      val bkt = ctx.freshName("bkt")
      val get = getter.format(arr, i)
      val hasNull = ctx.freshName("hasNull")
      s"""
         |int $n = $arr.numElements();
         |if ($n > $rowLen) {
         |  throw new IllegalStateException("embedding dim " + $n +
         |    " exceeds the $rowLen-dim LSH plane matrix");
         |}
         |long[] $sums = new long[$nPlanes];
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n && !$hasNull; $i++) {
         |  if ($arr.isNullAt($i)) { $hasNull = true; break; }
         |  long $sc = graft.functions.LshProject.scale10($get);
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    $sums[$p] = java.lang.Math.addExact($sums[$p],
         |      $dirsRef[$p * $rowLen + $i] > 0 ? $sc : -$sc);
         |  }
         |}
         |long $bkt = 0L;
         |if (!$hasNull) {
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    if ($sums[$p] > 0) $bkt |= (1L << $p);
         |  }
         |}
         |${ev.value} = $bkt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshProject =
    copy(child = newChild)
}

object LshProject {
  /** Unscaled long of `CAST(CAST(v AS DOUBLE) AS DECIMAL(20,10))`, i.e.
    * Spark's exact cast path: shortest decimal representation of the
    * double (`Double.toString`), then HALF_UP at scale 10. Kept in a
    * static-forwardable method so generated code shares one definition
    * with the interpreted path.
    *
    * Range carve-out vs the HOF fold: elements with |v| above ~0.92e9
    * have a scale-10 unscaled value past Long.MAX — the decimal fold
    * still computed those; this path fails loudly instead. Embeddings
    * live in unit-ish ranges, so a value that size is corrupt input, and
    * a clear error beats a silently different bucket. */
  def scale10(v: Double): Long =
    try new java.math.BigDecimal(java.lang.Double.toString(v))
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
    catch {
      case _: ArithmeticException => throw new IllegalStateException(
        s"lsh_project: |element| = ${math.abs(v)} exceeds the ~9.2e8 " +
          "magnitude limit of the exact scale-10 long representation")
    }

  /** Column form over an `array<float>`/`array<double>` embedding. */
  def bucket(vec: Column, dirs: Seq[Seq[Int]], nPlanes: Int): Column =
    GraftBridge.column(LshProject(GraftBridge.expression(vec), dirs, nPlanes))
}
