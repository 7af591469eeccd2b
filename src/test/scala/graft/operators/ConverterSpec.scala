package graft.operators

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** End-to-end replica of the reference batch job (SURVEY.md §5.2 item 5):
  * TSV scan → groupBy(product_category).count() → show → repartition(10) →
  * Parquet overwrite (/root/reference/scripts/spark_converter.py:25-31). */
class ConverterSpec extends SparkSuite {

  test("t1 replica: category counts, 10 output files, round-trip equality") {
    val tsv = ReviewsTsv.ensure()
    val df = spark.read.option("sep", "\t").option("header", "true").csv(tsv)

    // all-string schema: no inferSchema in the reference
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))

    val counts = df.groupBy("product_category").count()
    val byCat = counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 120 fixture rows over an 8-slot category rotation:
    // Books 3/8, Electronics 2/8, Home/Toys/Video_Games 1/8 each
    assert(byCat == Map("Books" -> 45L, "Electronics" -> 30L,
      "Home" -> 15L, "Toys" -> 15L, "Video_Games" -> 15L))

    val out = Files.createTempDirectory("graft_conv").toString + "/out"
    df.repartition(10).write.mode("overwrite").parquet(out)
    val parts = new java.io.File(out).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts == 10, s"expected 10 part files, got $parts")

    // overwrite mode really overwrites
    df.repartition(10).write.mode("overwrite").parquet(out)

    val back = spark.read.parquet(out)
    assert(back.count() == 120)
    assert(back.groupBy("product_category").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == byCat)
  }

  test("show() renders the reference's 20-row truncated table (R3)") {
    val df = spark.read.option("sep", "\t").option("header", "true")
      .csv(ReviewsTsv.ensure())
      .groupBy("product_category").count()
      .orderBy("product_category")
    val rendered = df.showString(20, 20, vertical = false)
    assert(rendered.contains("product_category"))
    assert(rendered.contains("Books"))
    assert(rendered.contains("45"))
  }

  /** showString is private[sql]; reflective call keeps the golden test on
    * the public show() path without capturing stdout. */
  implicit private class ShowAccess(df: org.apache.spark.sql.DataFrame) {
    def showString(n: Int, truncate: Int, vertical: Boolean): String = {
      val m = df.getClass.getMethod("showString",
        classOf[Int], classOf[Int], classOf[Boolean])
      m.setAccessible(true)
      m.invoke(df, Integer.valueOf(n), Integer.valueOf(truncate),
        java.lang.Boolean.valueOf(vertical)).asInstanceOf[String]
    }
  }
}
