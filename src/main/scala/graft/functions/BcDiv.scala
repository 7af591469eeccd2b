package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.functions._

/** `bc_div(a, b, s)` — fixed-scale TRUNCATING division with null on a zero
  * divisor, reproducing the reference's `bc` pipeline semantics
  * (/root/reference/scripts/custom-metrics.sh:12: `scale=2; a*100/b` under
  * `set -e`, where `bc` truncates toward zero and a zero divisor kills the
  * tick → no value emitted, /root/reference/scripts/custom-metrics.sh:2).
  *
  * Implemented as a `RuntimeReplaceable` Catalyst expression — it expands
  * to `floor(a * 10^s / b) / 10^s` guarded by a divisor check, so the
  * optimizer sees only built-in (codegen'd, constant-foldable) operators.
  * Exact whenever `a * 10^s` is integral and representable in a double —
  * always true for the metric pipeline's integer core counts.
  */
case class BcDiv(a: Expression, b: Expression, s: Expression,
    replacement: Expression)
  extends RuntimeReplaceable with InheritAnalysisRules {

  def this(a: Expression, b: Expression, s: Expression) =
    this(a, b, s, BcDiv.mkReplacement(a, b, s))

  override def parameters: Seq[Expression] = Seq(a, b, s)
  override def prettyName: String = "bc_div"
  override protected def withNewChildInternal(newChild: Expression): BcDiv =
    copy(replacement = newChild)
}

object BcDiv {
  private[functions] def mkReplacement(
      a: Expression, b: Expression, s: Expression): Expression = {
    val pow = Pow(Literal(10.0), Cast(s, DoubleType))
    val ad = Cast(a, DoubleType)
    val bd = Cast(b, DoubleType)
    val scaled = Divide(Multiply(ad, pow), bd)
    // bc truncates TOWARD ZERO: floor for non-negative, ceil for negative
    val truncated = If(GreaterThanOrEqual(scaled, Literal(0.0)),
      Cast(Floor(scaled), DoubleType), Cast(Ceil(scaled), DoubleType))
    If(EqualTo(bd, Literal(0.0)),
      Literal(null, DoubleType),
      Divide(truncated, pow))
  }

  def apply(a: Expression, b: Expression, s: Expression): BcDiv =
    new BcDiv(a, b, s)
}

/** Column-level engine functions (usable without SQL registration). */
object GraftFunctions {
  /** Column form of bc_div — same expansion the expression produces. */
  def bc_div(a: Column, b: Column, s: Int): Column = {
    val p = math.pow(10.0, s)
    val scaled = a.cast(DoubleType) * p / b.cast(DoubleType)
    val truncated = when(scaled >= 0, floor(scaled)).otherwise(ceil(scaled))
    when(b.cast(DoubleType) === 0.0, lit(null).cast(DoubleType))
      .otherwise(truncated / p)
  }

  /** Registers SQL-facing engine functions on an existing session
    * (idempotent). Mirrors what [[GraftExtensions]] does at session build
    * time, for sessions the driver constructs without extensions. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction(
      "bc_div", exprs => BcDiv(exprs(0), exprs(1), exprs(2)), "built-in")
    r.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    r.createOrReplaceTempFunction(
      "deflate_ratio", exprs => DeflateRatio(exprs(0)), "built-in")
    r.createOrReplaceTempFunction(
      "bpe_token_count", exprs => BpeTokenCount(exprs(0)), "built-in")
    r.createOrReplaceTempFunction(
      "cms_estimate", exprs => CmsEstimate(exprs(0), exprs(1)), "built-in")
    r.createOrReplaceTempFunction("bloom_filter_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    r.createOrReplaceTempFunction("might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }
}

/** SparkSessionExtensions hook: registers engine functions at session build:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or conf
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  /** Int literal extraction with loud failures — integral types only,
    * Int-range checked: a blind Number.intValue() would floor 2.7 and
    * WRAP 5e9 silently, the opposite of the loud error this promises. */
  private def intLit(fn: String, e: Expression, what: String): Int = e match {
    case l if l.foldable => l.eval() match {
      case i: java.lang.Integer => i.intValue()
      case i: java.lang.Short => i.intValue()
      case i: java.lang.Byte => i.intValue()
      case i: java.lang.Long
        if i.longValue() == i.intValue().toLong => i.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be a non-null Int-range integer literal, got $other")
    }
    case _ => throw new IllegalArgumentException(
      s"$fn: $what must be a literal, not an expression")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("bc_div"),
      new ExpressionInfo(classOf[BcDiv].getName, "bc_div"),
      (exprs: Seq[Expression]) => BcDiv(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("shingle_ngrams"),
      new ExpressionInfo(classOf[Shingles].getName, "shingle_ngrams"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          "shingle_ngrams(text, n) takes exactly 2 arguments")
        Shingles(exprs(0), intLit("shingle_ngrams", exprs(1), "n"))
      }))
    e.injectFunction((
      FunctionIdentifier("zorder_key"),
      new ExpressionInfo(classOf[ZOrderKey].getName, "zorder_key"),
      (exprs: Seq[Expression]) => ZOrderKey(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatio].getName, "deflate_ratio"),
      (exprs: Seq[Expression]) => DeflateRatio(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("bpe_token_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, "bpe_token_count"),
      (exprs: Seq[Expression]) => BpeTokenCount(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (exprs: Seq[Expression]) => CmsEstimate(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("topk_freq"),
      new ExpressionInfo(classOf[TopKFreqAgg].getName, "topk_freq"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 3) throw new IllegalArgumentException(
          "topk_freq(value, k, capacity) takes exactly 3 arguments")
        TopKFreqAgg(exprs(0), intLit("topk_freq", exprs(1), "k"),
          intLit("topk_freq", exprs(2), "capacity"))
      }))
    // Spark ships these bloom expressions for its internal runtime join
    // filters but does not SQL-register them; exposing them makes the
    // dim-side-bloom / fact-side-prune shape (sketch_bloom) first-class.
    e.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName, "bloom_filter_agg"),
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[BloomFilterMightContain].getName, "might_contain"),
      (exprs: Seq[Expression]) => BloomFilterMightContain(exprs(0), exprs(1))))
    // whole-operator tier: the native as-of join's planner strategy and
    // its predicate-pushdown optimizer rule (plans/AsOfJoin.scala)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.AsOfJoinPushdown)
  }
}
