package graft.io

import graft.SparkSuite
import graft.core.{Tables => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source/sink format matrix: every columnar/row format Spark ships
  * (parquet, orc, csv, json) round-trips the same fixture slice with
  * schema fidelity — csv/json through explicit declared schemas, the
  * engine's rule for text formats (SURVEY.md §7.4: never infer schemas
  * twice and hope). */
class SourceMatrixSpec extends SparkSuite {

  private lazy val base: DataFrame =
    T.nation(spark, sfDir).orderBy("n_nationkey").cache()

  private def sortedRows(df: DataFrame) =
    df.orderBy("n_nationkey").collect().toSeq

  private def dir(fmt: String) = s"target/source-matrix/$fmt"

  test("parquet and orc round-trip with identical schema and rows") {
    for (fmt <- Seq("parquet", "orc")) {
      base.write.mode("overwrite").format(fmt).save(dir(fmt))
      val back = spark.read.format(fmt).load(dir(fmt))
      assert(back.schema === base.schema, fmt)
      assert(sortedRows(back) === sortedRows(base), fmt)
    }
  }

  test("csv round-trips through a declared schema (header, no inference)") {
    base.write.mode("overwrite").option("header", "true").csv(dir("csv"))
    val back = spark.read
      .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
      .option("header", "true").csv(dir("csv"))
      .select(base.columns.map(col).toSeq: _*)
    assert(sortedRows(back) === sortedRows(base))
  }

  test("json lines round-trip through a declared schema") {
    base.write.mode("overwrite").json(dir("json"))
    val back = spark.read
      .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
      .json(dir("json"))
      .select(base.columns.map(col).toSeq: _*)
    assert(sortedRows(back) === sortedRows(base))
  }

  test("orc scan pushes filters and prunes columns like parquet") {
    base.write.mode("overwrite").format("orc").save(dir("orc-scan"))
    val q = spark.read.format("orc").load(dir("orc-scan"))
      .where(col("n_regionkey") === 2).select("n_name")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("EqualTo(n_regionkey,2)"), plan)
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("n_nationkey"), readSchema)
  }
}
