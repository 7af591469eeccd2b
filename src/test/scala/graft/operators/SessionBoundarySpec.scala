package graft.operators

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins Spark's session_window boundary semantics: an event EXACTLY the
  * gap after the previous one still merges into the session. The q42
  * oracle's lag-flag must therefore use strict `>` for its new-session
  * test — `>=` silently diverges on any dataset with an exact-gap pair
  * (latent until the fixture happens to contain one). */
class SessionBoundarySpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("events exactly one gap apart merge into a single session") {
    val df = Seq((1L, ts(0)), (1L, ts(1800)), (1L, ts(3601)))
      .toDF("user_id", "ts")
    val sessions = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long").as("start"), col("n"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    // 0 and 1800 merge (exact gap, inclusive); 3601 is 1801s after 1800 → new
    assert(sessions === Seq((0L, 2L), (3601L, 1L)), sessions)
  }
}
