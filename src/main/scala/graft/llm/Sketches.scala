package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, QueryGroup, Tables => T}

/** Sketch operators (the "novel sketch" slot of the extension inventory):
  * mergeable summaries whose per-partition pieces combine associatively —
  * the only aggregation shape that works at 100 TB when exact state would
  * not fit. Counter/register merges are order-independent, so results are
  * run-to-run deterministic.
  *
  * Oracle strategy: the sketch bytes themselves are not DuckDB-reproducible,
  * so the registry queries output the EXACT companion columns (graded
  * bit-for-bit by the oracle) plus a boolean accuracy flag computed from
  * the sketch inside the query — the oracle asserts the flag is TRUE, which
  * grades the sketch's error bound, not just row counts. Raw sketch
  * surfaces stay available to `SketchesSpec` via the *Raw builders.
  */
object Sketches extends QueryGroup {

  /** Count-min sketch of event users per event type (ε=1%, δ=5%, fixed
    * seed), plus the exact count of a fixed probe key. The sketch bytes
    * travel as a column; consumers deserialize via
    * `org.apache.spark.util.sketch.CountMinSketch.readFrom`. */
  private[llm] def cmsRaw(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .groupBy(col("event_type"))
      .agg(expr("hex(count_min_sketch(user_id, 0.01d, 0.95d, 42))").as("cms_hex"),
        count(lit(1)).as("n_obs"),
        sum(when(col("user_id") === 7L, 1L).otherwise(0L)).as("probe_exact"))

  /** Deserialize + point-query the CMS — the consumer side of the sketch
    * column. A UDF is fine here: it runs on the aggregated (tiny) result,
    * never on base-table rows. */
  private val cmsEstimate = udf((hexStr: String, key: Long) => {
    val bytes = hexStr.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes)).estimateCount(key)
  })

  /** Registry surface: sketch built AND consumed in one query. `cms_ok`
    * checks the CMS guarantee on the probe key (never under-estimates;
    * over-estimates by at most εN) — the oracle asserts it TRUE and grades
    * `n_obs`/`probe_exact` exactly. */
  private def cms(s: SparkSession, d: String): DataFrame = {
    val est = cmsEstimate(col("cms_hex"), lit(7L)).cast(DoubleType)
    val exact = col("probe_exact").cast(DoubleType)
    cmsRaw(s, d)
      .select(col("event_type"), col("n_obs"), col("probe_exact"),
        (est >= exact &&
          est <= exact + col("n_obs").cast(DoubleType) * 0.01 + 1.0).as("cms_ok"))
      .orderBy(col("event_type"))
  }

  private val cmsSql =
    """SELECT event_type, COUNT(*) AS n_obs,
      |  CAST(SUM(CASE WHEN user_id = 7 THEN 1 ELSE 0 END) AS BIGINT) AS probe_exact,
      |  TRUE AS cms_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** DataSketches HLL distinct words per language (register merges are
    * commutative → deterministic estimate), alongside the exact count. */
  private[llm] def hllRaw(s: SparkSession, d: String): DataFrame =
    Dedup.words(T.documents(s, d))
      .groupBy(col("lang"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(word))").as("hll_words"),
        countDistinct(col("word")).as("exact_words"))

  /** Registry surface: exact count graded by the oracle; `hll_ok` asserts
    * the estimate sits within 5% of exact. */
  private def hll(s: SparkSession, d: String): DataFrame =
    hllRaw(s, d)
      .select(col("lang"), col("exact_words"),
        (abs(col("hll_words").cast(DoubleType) - col("exact_words").cast(DoubleType)) /
          col("exact_words").cast(DoubleType) <= 0.05).as("hll_ok"))
      .orderBy(col("lang"))

  private val hllSql =
    """WITH wrd AS (
      |  SELECT doc_id, lang, word FROM (
      |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
      |    FROM documents) WHERE word <> '')
      |SELECT lang, COUNT(DISTINCT word) AS exact_words, TRUE AS hll_ok
      |FROM wrd GROUP BY lang ORDER BY lang""".stripMargin

  override val defs: Seq[(String, QueryDef)] = Seq(
    "sketch_cms" -> QueryDef(cms, Some(cmsSql)),
    "sketch_hll" -> QueryDef(hll, Some(hllSql)),
  )
}
