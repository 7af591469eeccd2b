package graft.streaming

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming dedup semantics: first arrival wins inside the watermark
  * horizon (in-batch and across batches), duplicate state is dropped once
  * the watermark passes — so a late re-arrival re-emits (the documented
  * bounded-state trade the downstream batch dedup absorbs). */
class StreamDedupSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("first arrival wins within the horizon; state expires after it") {
    val input = MemoryStream[DocEvent](spark)
    val q = StreamDedup.dedupStream(input.toDS(), delay = "1 minute")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two copies in-batch + one distinct doc
      input.addData(
        DocEvent(ts(0), 1L, "the Same   text"),
        DocEvent(ts(10), 2L, "THE same text"), // same fingerprint as doc 1
        DocEvent(ts(20), 3L, "another doc"))
      q.processAllAvailable()
      // batch 2: cross-batch duplicate still inside the 1 min horizon
      input.addData(DocEvent(ts(30), 4L, "the same text"))
      q.processAllAvailable()
      // batch 3: advance event time so the watermark passes the old state
      input.addData(DocEvent(ts(500), 5L, "unrelated"))
      q.processAllAvailable()
      // batch 4: same content again — state was dropped, so it re-emits
      input.addData(DocEvent(ts(510), 6L, "the same text"))
      q.processAllAvailable()

      val got = spark.table("dedup_out").select("docId").as[Long]
        .collect().sorted.toSeq
      // exactly ONE of docs 1/2 survives batch 1 (in-batch survivor is
      // arbitrary); doc 4 is a cross-batch dup (state wins); 6 re-emits
      assert(got.length === 4, got)
      assert(got.count(Set(1L, 2L)) === 1, got)
      assert(Seq(3L, 5L, 6L).forall(got.contains), got)
    } finally q.stop()
  }

  test("fingerprint matches the batch q30 normalization") {
    val df = Seq((1L, "A  b\tc "), (2L, "a b c")).toDF("doc_id", "text")
    val fps = StreamDedup.fingerprinted(df).select("fp").as[String].collect()
    assert(fps.distinct.length === 1)
  }
}
