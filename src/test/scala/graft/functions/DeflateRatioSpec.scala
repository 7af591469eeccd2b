package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions.col

/** Ordering/range properties for the compressibility signal (no oracle —
  * DuckDB has no deflate; see DeflateRatio scaladoc). */
class DeflateRatioSpec extends SparkSuite {
  import spark.implicits._

  private def ratios(texts: String*): Seq[Double] =
    texts.toDF("text")
      .select(DeflateRatio.deflateRatio(col("text")).as("r"))
      .collect().map(_.getDouble(0)).toSeq

  test("repetitive text compresses far below varied text") {
    val Seq(rep, varied) = ratios(
      "spam spam spam spam spam spam spam spam spam spam " * 10,
      (1 to 100).map(i => s"w${i * 7919 % 997}x$i").mkString(" "))
    assert(rep < 0.1, s"repetitive ratio $rep")
    assert(varied > 0.3, s"varied ratio $varied")
    assert(rep < varied)
  }

  test("ratios are positive, deterministic, and 1.0 for empty input") {
    val r1 = ratios("", "abc", "the quick brown fox jumps over the lazy dog")
    val r2 = ratios("", "abc", "the quick brown fox jumps over the lazy dog")
    assert(r1 == r2)
    assert(r1.head == 1.0)
    assert(r1.forall(_ > 0))
  }

  test("SQL registration and codegen: deflate_ratio stays in a codegen'd project") {
    val df = graft.core.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "deflate_ratio(text) AS r")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val projLine = p.linesIterator.find(_.contains("deflate_ratio"))
    assert(projLine.exists(_.contains("*(")), p)
  }

  test("nulls pass through as null") {
    val rows = Seq(Some("abc"), None).toDF("text")
      .select(DeflateRatio.deflateRatio(col("text")).as("r"))
      .collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }
}
