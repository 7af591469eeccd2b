package graft.io

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** Source robustness: the three JSON parse modes against a file with
  * broken lines — a 100 TB ingest ALWAYS contains some; the engine must
  * quarantine them (PERMISSIVE + corrupt-record column), drop them
  * (DROPMALFORMED), or fail the job (FAILFAST), never silently mangle. */
class MalformedInputSpec extends SparkSuite {

  private lazy val path: String = {
    val p = Paths.get("target/fixtures/malformed.jsonl")
    Files.createDirectories(p.getParent)
    Files.writeString(p,
      """{"id": 1, "v": 10}
        |{"id": 2, "v": }
        |not json at all
        |{"id": 4, "v": 40}
        |""".stripMargin)
    p.toString
  }

  private val schema = "id LONG, v LONG, _corrupt STRING"

  test("PERMISSIVE quarantines bad lines into the corrupt-record column") {
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path).cache()
    try {
      assert(df.count() === 4)
      assert(df.where(col("_corrupt").isNotNull).count() === 2)
      assert(df.where(col("_corrupt").isNull).select("id")
        .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 4L))
    } finally df.unpersist()
  }

  test("DROPMALFORMED keeps only parseable rows") {
    val df = spark.read.schema("id LONG, v LONG")
      .option("mode", "DROPMALFORMED").json(path)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 4L))
  }

  test("FAILFAST fails the read because of the malformed record") {
    val e = intercept[SparkException] {
      spark.read.schema("id LONG, v LONG")
        .option("mode", "FAILFAST").json(path).collect()
    }
    // the failure must be the malformed-record error, not just any error
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(messages.toLowerCase.contains("malformed"), messages)
  }
}
