package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The fused dot product must be bit-identical to the composable HOF fold
  * it replaces (left-to-right IEEE sum from 0.0) — that equivalence is what
  * keeps q31's oracle parity after the optimization. */
class DotProductSpec extends SparkSuite {
  import DotProduct.dot
  import spark.implicits._

  test("matches aggregate(zip_with(...)) bit-for-bit on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(100)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .withColumn("fused", dot(col("a"), col("b")))
      .withColumn("hof", aggregate(
        zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x))
    assert(df.filter(col("fused") =!= col("hof")).count() == 0)
  }

  test("null array, null element, and mismatched lengths all propagate null") {
    // matches the HOF form exactly: zip_with null-pads a shorter array
    // and a null element nulls the fold — truncating instead would hand
    // a corrupt vector a plausible partial score
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 5.0))), // length mismatch
      (None, Some(Seq(1.0))),                           // null array
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0)))        // clean
    ).toDF("a", "b").withColumn("d", dot(col("a"), col("b")))
    val out = df.select("d").collect().map(r => Option(r.get(0)))
    assert(out(0).isEmpty)
    assert(out(1).isEmpty)
    assert(out(2).contains(11.0))
    val withNullElem = spark.sql(
      "SELECT dot_product(array(1.0d, cast(null as double)), array(1.0d, 1.0d)) AS v")
      .collect().head
    assert(withNullElem.isNullAt(0))
  }

  test("SQL registration: dot_product available via extensions") {
    val v = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS v")
      .collect()(0).getDouble(0)
    assert(v == 11.0)
  }

  test("stays inside codegen (no fallback marker in plan)") {
    val df = Seq((Seq(1.0), Seq(2.0))).toDF("a", "b")
      .select(dot(col("a"), col("b")).as("d"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CodegenFallback"), p)
  }
}
