package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** `cms_estimate` (functions/CmsProbe.scala): the codegen'd probe must
  * return exactly what direct library deserialization returns, through
  * both the SQL and Column surfaces, and respect the CMS never-
  * under-estimate guarantee on a crafted stream. */
class CmsProbeSpec extends SparkSuite {

  test("probe equals direct CountMinSketch deserialization; bound holds") {
    val sess = spark
    import sess.implicits._
    // key 7 appears 5 times, key 9 twice, 100 singletons
    val keys = Seq.fill(5)(7L) ++ Seq.fill(2)(9L) ++ (100L until 200L)
    val df = keys.toDF("k")
    df.createOrReplaceTempView("cms_probe_stream")
    val row = spark.sql(
      """SELECT hex(count_min_sketch(k, 0.01d, 0.95d, 42)) AS h
        |FROM cms_probe_stream""".stripMargin).collect().head
    val hex = row.getString(0)
    val direct = {
      val bytes = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(bytes))
    }
    Seq(7L, 9L, 150L, 999L).foreach { k =>
      val viaSql = spark.sql(
        s"SELECT cms_estimate('$hex', ${k}L) AS e").collect().head.getLong(0)
      assert(viaSql == direct.estimateCount(k), s"key $k")
    }
    // CMS guarantee: never under-estimates the true count
    val est7 = spark.sql(s"SELECT cms_estimate('$hex', 7L)").collect().head.getLong(0)
    assert(est7 >= 5L)
    // Column surface matches SQL surface
    val viaCol = Seq(hex).toDF("h")
      .select(CmsEstimate.cmsEstimate(col("h"), lit(7L)).as("e"))
      .collect().head.getLong(0)
    assert(viaCol == est7)
    // null sketch -> null, not a crash
    assert(spark.sql("SELECT cms_estimate(CAST(NULL AS STRING), 7L)")
      .collect().head.isNullAt(0))
    // odd-length hex (a truncated sketch) fails LOUDLY instead of
    // silently dropping the trailing nibble and parsing garbage
    val odd = intercept[Exception] {
      spark.sql(s"SELECT cms_estimate('${hex.dropRight(1)}', 7L)").collect()
    }
    val msgs = Iterator.iterate[Throwable](odd)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString("; ")
    assert(msgs.contains("odd length"), msgs)
  }
}
