package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Degenerate-input sweep: EVERY registry query runs against a crafted
  * minimal star schema containing the edge rows the generated fixtures
  * never produce — an empty-text document, an all-whitespace document, a
  * single-word document, exact duplicates, and an empty embedding
  * vector. The contract is no-crash (loud documented guards excepted):
  * results may be empty, but a query that throws on degenerate data
  * would take down a 100 TB pipeline on its one weird partition. */
class EdgeCaseSpec extends SparkSuite {
  import spark.implicits._

  private lazy val edgeDir: String = {
    val dir = graft.core.Fixtures.path("edgecase")
    def write(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")

    write("region", Seq((0, "AFRICA"), (1, "AMERICA")).toDF("r_regionkey", "r_name"))
    write("nation", Seq((0, "ALGERIA", 0), (1, "BRAZIL", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey"))
    write("customer", Seq(
      (1L, "c1", 0, 10.5, "BUILDING"), (2L, "c2", 1, -3.25, "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    write("supplier", Seq((1L, "s1", 0, 5.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"))
    write("part", Seq((1L, "p1", "B1", "T1", 5, 10.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"))
    def ts(sec: Long) = new Timestamp(sec * 1000)
    write("orders", Seq(
      (1L, 1L, "O", 100.0, ts(86400), "1-URGENT"),
      (2L, 2L, "F", 200.0, ts(172800), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
    write("lineitem", Seq(
      (1L, 1L, 1L, 1, 1.0, 10.0, 0.05, 0.02, "N", "O", ts(86400)),
      (2L, 1L, 1L, 2, 2.0, 20.0, 0.0, 0.0, "R", "F", ts(172800)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"))
    // events.ts is read as raw NANOS longs by Tables.events
    write("events", Seq(
      (1L, 1000000000L * 1000000000L, 1L, "view", 1.0, """{"k": 1}"""),
      (2L, 1000000060L * 1000000000L, 1L, "purchase", 5.0, """{"k": 2}"""),
      (3L, 1000000120L * 1000000000L, 2L, "view", 2.0, null))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    write("documents", Seq(
      (0L, "", "en", "s0", 0L),                       // EMPTY text
      (1L, "   ", "en", "s1", 3L),                    // whitespace only
      (2L, "word", "de", "s2", 4L),                   // single word
      (3L, "a b c d e f g h", "en", "s3", 15L),
      (4L, "a b c d e f g h", "en", "s4", 15L),       // exact duplicate
      (5L, "x y z q r s t u v w", "fr", "s5", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true)),
      StructField("label", IntegerType, nullable = false)))
    write("embeddings", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, Seq(0.1f, 0.2f), 0),
        Row(1L, Seq.empty[Float], 1),                 // EMPTY vector
        Row(2L, Seq(0.3f, -0.4f), 0),
        Row(3L, Seq(1.0f, 1.0f), 1),
        Row(4L, Seq(0.5f, null), 0),                  // NULL element
        Row(5L, Seq(0.0f, 0.0f), 1))), embSchema))    // ZERO-norm vector
    dir
  }

  test("every registry query survives the degenerate fixture") {
    val failures = SparkEntry.registry.flatMap { case (name, q) =>
      try { q.fn(spark, edgeDir).collect(); None }
      catch { case e: Throwable =>
        Some(name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
      finally graft.core.Release.storage(spark)
    }
    assert(failures.isEmpty,
      failures.map { case (n, m) => s"\n  $n -> $m" }.mkString)
  }
}
