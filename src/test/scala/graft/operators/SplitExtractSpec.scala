package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** R10/R11 extraction idioms (SURVEY.md §5.2 item 2): the reference's
  * ruby `split('"')[-2]` jobFlowId parse (custom-metrics.sh:8) and the
  * sed `s/\(.*\)[a-z]/\1/` AZ→region trim (setup-custom-metrics.sh:14). */
class SplitExtractSpec extends SparkSuite {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).collect()(0).get(0)

  test("R10: split on quote, take second-from-end — jobFlowId parse") {
    // the reference greps the jobFlowId line first, so the id is the last
    // quoted token on the line — [-2] of a quote-split picks it out
    val line = """  "jobFlowId": "j-ABC123XYZ","""
    val parsed = one(try_element_at(split(lit(line), "\""), lit(-2)))
    assert(parsed == "j-ABC123XYZ")
  }

  test("R10: degenerate input (no quotes) yields null, not a crash") {
    assert(one(try_element_at(split(lit("noquotes"), "\""), lit(-2))) == null)
  }

  test("R11: strip trailing letter — availability zone to region") {
    assert(one(regexp_replace(lit("us-east-1a"), "[a-z]$", "")) == "us-east-1")
    assert(one(regexp_replace(lit("eu-central-1b"), "[a-z]$", "")) == "eu-central-1")
  }

  test("R10 alternative: the proper JSON path does the same job") {
    val line = """{"jobFlowId":"j-ABC123XYZ"}"""
    assert(one(get_json_object(lit(line), "$.jobFlowId")) == "j-ABC123XYZ")
  }
}
