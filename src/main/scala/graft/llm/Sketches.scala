package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryGroup, Tables => T}

/** Sketch operators (the "novel sketch" slot of the extension inventory):
  * mergeable summaries whose per-partition pieces combine associatively —
  * the only aggregation shape that works at 100 TB when exact state would
  * not fit. Counter/register merges are order-independent, so results are
  * run-to-run deterministic, but not DuckDB-reproducible → rows-only +
  * accuracy-asserted in `SketchesSpec`.
  */
object Sketches extends QueryGroup {

  /** Count-min sketch of event users per event type (ε=1%, δ=5%, fixed
    * seed). The sketch bytes travel as a column; consumers deserialize via
    * `org.apache.spark.util.sketch.CountMinSketch.readFrom`. */
  private def cms(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy(col("event_type"))
      .agg(expr("hex(count_min_sketch(user_id, 0.01d, 0.95d, 42))").as("cms_hex"),
        count(lit(1)).as("n_obs"))
      .orderBy(col("event_type"))

  /** DataSketches HLL distinct words per language (register merges are
    * commutative → deterministic estimate), alongside the exact count. */
  private def hll(s: SparkSession, d: String): DataFrame =
    Dedup.words(T.documents(s, d))
      .groupBy(col("lang"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(word))").as("hll_words"),
        countDistinct(col("word")).as("exact_words"))
      .orderBy(col("lang"))

  override val defs: Seq[(String, QueryDef)] = Seq(
    "sketch_cms" -> QueryDef(cms), // rows-only: binary sketch output
    "sketch_hll" -> QueryDef(hll), // rows-only: approximate
  )
}
