package graft.operators

import graft.{SparkEntry, SparkSuite}
import graft.core.{Tables => T}

/** spark.sql passthrough surface (SURVEY.md §7.5): the ANSI-compatible
  * subset of the declared oracle SQL runs UNCHANGED through Spark's own
  * SQL engine and returns exactly what the DataFrame programs return —
  * a third leg of consistency next to the DuckDB oracle. */
class SqlPassthroughSpec extends SparkSuite {

  // DuckDB-dialect-free oracle queries (no read_csv/list ops/etc.)
  private val ansiNames = Seq(
    "q01_scan_agg", "q03_filter_project", "q04_groupagg_tpch1",
    "q05_broadcast_join", "q06_join3_topk", "q07_left_outer",
    "q08_left_semi", "q09_left_anti", "q11_cross_join",
    "q14_window_rank", "q17_topk", "q18a_union", "q18b_intersect",
    "q18c_except", "q19a_distinct", "q23_conditional", "q34_pivot")

  private def registerViews(): Unit = {
    T.region(spark, sfDir).createOrReplaceTempView("region")
    T.nation(spark, sfDir).createOrReplaceTempView("nation")
    T.customer(spark, sfDir).createOrReplaceTempView("customer")
    T.supplier(spark, sfDir).createOrReplaceTempView("supplier")
    T.part(spark, sfDir).createOrReplaceTempView("part")
    T.orders(spark, sfDir).createOrReplaceTempView("orders")
    T.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    T.events(spark, sfDir).createOrReplaceTempView("events")
    T.documents(spark, sfDir).createOrReplaceTempView("documents")
  }

  test("ANSI oracle SQL through spark.sql equals the DataFrame programs") {
    registerViews()
    val failures = ansiNames.flatMap { name =>
      val sql = SparkEntry.oracleSql(name)
      try {
        val viaSql = spark.sql(sql).collect().map(_.toString).toSeq
        val viaDf = SparkEntry.queries(name)(spark, sfDir)
          .collect().map(_.toString).toSeq
        if (viaSql == viaDf) None
        else Some(s"$name: ${viaSql.size} vs ${viaDf.size} rows or value diff")
      } catch {
        case e: Exception => Some(s"$name: ${e.getMessage.linesIterator.next()}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
