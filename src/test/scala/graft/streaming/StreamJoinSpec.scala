package graft.streaming

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class Impression(impTs: Timestamp, userId: Long, impId: Long)
case class Click(clickTs: Timestamp, userId: Long, clickId: Long)

/** Stream-stream interval join semantics: matches inside the interval
  * emit; out-of-interval rows don't; left-outer emits the null row only
  * after the watermark closes the interval. */
class StreamJoinSpec extends SparkSuite {
  import spark.implicits._

  // base offset keeps event times strictly above the initial watermark
  // (0): a row AT the watermark is already "late" and silently dropped
  private def ts(sec: Long) = new Timestamp((10000 + sec) * 1000)

  test("inner join pairs events on key within the interval only") {
    val imps = MemoryStream[Impression](spark)
    val clicks = MemoryStream[Click](spark)
    val joined = StreamJoin.intervalJoin(
      imps.toDF(), clicks.toDF(), "userId", "impTs", "clickTs", "2 minutes")
      .selectExpr("l.impId", "r.clickId")
    val q = joined.writeStream.format("memory").queryName("ssj_inner")
      .outputMode(OutputMode.Append).start()
    try {
      imps.addData(Impression(ts(0), 1L, 100L), Impression(ts(0), 2L, 200L))
      clicks.addData(
        Click(ts(60), 1L, 11L),   // in interval, same user → match
        Click(ts(300), 2L, 22L),  // beyond 2 min → no match
        Click(ts(30), 3L, 33L))   // no impression for user 3
      q.processAllAvailable()
      val got = spark.table("ssj_inner").as[(Long, Long)].collect().toSet
      assert(got == Set((100L, 11L)))
    } finally q.stop()
  }

  test("left outer emits the unmatched row once the watermark closes it") {
    val imps = MemoryStream[Impression](spark)
    val clicks = MemoryStream[Click](spark)
    val joined = StreamJoin.intervalJoin(
      imps.toDF(), clicks.toDF(), "userId", "impTs", "clickTs", "2 minutes",
      joinType = "left_outer")
      .selectExpr("l.impId", "r.clickId")
    val q = joined.writeStream.format("memory").queryName("ssj_outer")
      .outputMode(OutputMode.Append).start()
    try {
      imps.addData(Impression(ts(0), 1L, 100L), Impression(ts(0), 2L, 200L))
      clicks.addData(Click(ts(60), 1L, 11L))
      q.processAllAvailable()
      // user 2 unmatched but its interval may still fill — no null row yet
      val early = spark.table("ssj_outer").collect()
      assert(early.map(_.getLong(0)).toSet == Set(100L))
      // advance BOTH watermarks well past impTs(0) + 2 min
      imps.addData(Impression(ts(1000), 9L, 900L))
      clicks.addData(Click(ts(1000), 9L, 99L))
      q.processAllAvailable()
      // one more batch so the closed interval's null row flushes
      imps.addData(Impression(ts(1100), 9L, 901L))
      clicks.addData(Click(ts(1100), 9L, 98L))
      q.processAllAvailable()
      val rows = spark.table("ssj_outer").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet
      assert(rows.contains((200L, None)), s"missing outer null row: $rows")
    } finally q.stop()
  }
}
