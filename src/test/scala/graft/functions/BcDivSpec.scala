package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** R9 semantics (SURVEY.md §5.2 item 2): bc scale=s division TRUNCATES and
  * a zero divisor emits nothing (/root/reference/scripts/custom-metrics.sh:2,12). */
class BcDivSpec extends SparkSuite {
  import GraftFunctions.bc_div

  private def one(col: org.apache.spark.sql.Column): Any =
    spark.range(1).select(col.as("v")).collect()(0).get(0)

  test("13 of 16 cores -> 81.25 (the reference's worked example)") {
    assert(one(bc_div(lit(13 * 100), lit(16), 2)) == 81.25)
  }

  test("truncation, not rounding: 100/3 at scale 2 -> 33.33") {
    assert(one(bc_div(lit(100), lit(3), 2)) == 33.33)
    assert(one(bc_div(lit(200), lit(3), 2)) == 66.66) // bc gives .66, not .67
  }

  test("zero divisor -> null (tick skipped)") {
    assert(one(bc_div(lit(100), lit(0), 2)) == null)
  }

  test("scale 0 truncates toward zero") {
    assert(one(bc_div(lit(7), lit(2), 0)) == 3.0)
  }

  test("negative quotients truncate toward zero, not toward -inf") {
    assert(one(bc_div(lit(-100), lit(3), 2)) == -33.33) // bc: -33.33, floor would give -33.34
    assert(one(bc_div(lit(-7), lit(2), 0)) == -3.0)
    val sql = spark.sql("SELECT bc_div(-100, 3, 2) AS v").collect()(0).getDouble(0)
    assert(sql == -33.33)
  }

  test("SQL registration via extensions: bc_div usable in spark.sql") {
    val r = spark.sql("SELECT bc_div(1300, 16, 2) AS v").collect()(0).getDouble(0)
    assert(r == 81.25)
  }

  test("optimizer folds constant bc_div (RuntimeReplaceable expansion)") {
    val plan = spark.sql("SELECT bc_div(1300, 16, 2) AS v")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("81.25"), s"expected constant-folded plan, got:\n$plan")
  }
}
