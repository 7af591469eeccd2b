package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: the Spark program plus (when SQL-expressible)
  * the equivalent DuckDB SQL the driver's oracle runs on the same tables.
  * Queries without an oracle get the driver's weaker rows-only check
  * (SURVEY.md §2B capability matrix). */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryGroup {
  /** Ordered (name → def); names are stable driver-facing identifiers. */
  def defs: Seq[(String, QueryDef)]
}
