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

  /** Greenwald-Khanna quantile sketch (approx_percentile, accuracy 100 →
    * rank error ≤ n/100) over per-language doc lengths. Graded columns are
    * the exact interpolated p50/p90 (percentile ↔ quantile_cont match
    * bitwise on doubles); `q_ok` checks the sketch's RANK guarantee
    * in-query with the tie-robust sandwich: #(< est)/n ≤ q+ε and
    * #(≤ est)/n ≥ q−ε. */
  private def quantileSketch(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d).select(col("lang"), col("n_chars"))
    val agg = docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n"),
      percentile(col("n_chars"), lit(0.5)).as("exact_p50"),
      percentile(col("n_chars"), lit(0.9)).as("exact_p90"),
      percentile_approx(col("n_chars"), lit(0.5), lit(100)).as("ap50"))
    val ranks = docs.join(agg.select(col("lang"), col("ap50")), Seq("lang"))
      .groupBy(col("lang")).agg(
        sum(when(col("n_chars") < col("ap50"), 1L).otherwise(0L)).as("n_lt"),
        sum(when(col("n_chars") <= col("ap50"), 1L).otherwise(0L)).as("n_le"))
    val eps = lit(0.02) + lit(1.0) / col("n").cast(DoubleType)
    agg.join(ranks, Seq("lang"))
      .select(col("lang"), col("n"), col("exact_p50"), col("exact_p90"),
        (col("n_lt").cast(DoubleType) / col("n") <= lit(0.5) + eps &&
          col("n_le").cast(DoubleType) / col("n") >= lit(0.5) - eps).as("q_ok"))
      .orderBy(col("lang"))
  }

  private val quantileSketchSql =
    """SELECT lang, COUNT(*) AS n,
      |  quantile_cont(n_chars, 0.5) AS exact_p50,
      |  quantile_cont(n_chars, 0.9) AS exact_p90,
      |  TRUE AS q_ok
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Bloom-filter membership — the runtime-filter shape: build a bloom
    * over the dim-side keys (BUILDING customers), probe the fact side
    * (events) WITHOUT joining it, so at 100 TB the filter prunes the probe
    * scan before any shuffle. Graded columns are the exact membership
    * counts; the flags check the bloom's two guarantees in-query (zero
    * false negatives; false-positive rate under the sizing bound). */
  private def bloom(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s) // sessions built w/o extensions
    val members = T.customer(s, d).where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("user_id"))
    members.createOrReplaceTempView("g_sketch_bloom_members")
    T.events(s, d).select(col("user_id"))
      .createOrReplaceTempView("g_sketch_bloom_events")
    // bloom_filter_agg needs FOLDABLE sizing, so size it from the actual
    // dim-side count (one tiny dim-side action, like the IVF centroid
    // collect) — fixed constants would blow the FPR bound the flag checks
    // as soon as the scale factor grows. 16 bits/item ≈ 4e-4 FPR at any n.
    val nMembers = math.max(members.count(), 1L)
    // Spark rejects numBits above the session's bloom-filter ceiling
    // (spark.sql.optimizer.runtime.bloomFilter.maxNumBits, default 64M) —
    // clamp so the query still runs past ~4.2M members; past the clamp the
    // bound degrades gracefully and the in-query fpr_ok flag absorbs it.
    val maxNumBits = s.conf
      .getOption("spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
      .map(_.toLong).getOrElse(67108864L)
    val numBits = math.min(nMembers * 16, maxNumBits)
    // might_contain requires the bloom as a scalar subquery — built once,
    // broadcast as a literal, probed per fact row with no join of the
    // fact side against the dim side.
    s.sql(
      s"""SELECT COUNT(*) AS n_events,
        |  CAST(SUM(is_m) AS BIGINT) AS n_member_events,
        |  SUM(CASE WHEN is_m = 1 AND NOT bh THEN 1 ELSE 0 END) = 0
        |    AS bloom_no_false_neg,
        |  CAST(SUM(CASE WHEN is_m = 0 AND bh THEN 1 ELSE 0 END) AS DOUBLE) /
        |    CAST(GREATEST(SUM(CASE WHEN is_m = 0 THEN 1 ELSE 0 END), 1)
        |      AS DOUBLE) <= 0.05 AS bloom_fpr_ok
        |FROM (
        |  SELECT e.user_id,
        |    CASE WHEN m.user_id IS NOT NULL THEN 1 ELSE 0 END AS is_m,
        |    might_contain(
        |      (SELECT bloom_filter_agg(user_id, ${nMembers}L, ${numBits}L)
        |       FROM g_sketch_bloom_members), e.user_id) AS bh
        |  FROM g_sketch_bloom_events e
        |  LEFT JOIN g_sketch_bloom_members m ON e.user_id = m.user_id)"""
        .stripMargin)
  }

  private val bloomSql =
    """SELECT COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_member_events,
      |  TRUE AS bloom_no_false_neg, TRUE AS bloom_fpr_ok
      |FROM events e LEFT JOIN
      |  (SELECT c_custkey AS user_id FROM customer
      |   WHERE c_mktsegment = 'BUILDING') c USING (user_id)""".stripMargin

  // ---- sketch_topk: space-saving heavy hitters over the word stream -----
  // The custom TypedImperativeAggregate (graft.functions.TopKFreqAgg):
  // fixed-memory partial-aggregable top-k — one shuffle of capacity-sized
  // states instead of grouping the whole key space. Capacity (256) far
  // exceeds the corpus vocabulary, so estimates are exact with zero error
  // and the oracle is the plain exact top-10; the eviction/approximation
  // path is exercised with crafted skew in TopKFreqSpec.
  private def topkWords(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TopKFreqAgg.topkFreq
    T.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .agg(topkFreq(col("w"), 10, 256).as("tk"))
      // exactness precondition, asserted LOUDLY: the oracle is the plain
      // exact top-10, which is only what the sketch returns while nothing
      // was evicted (err = 0 everywhere). If a fixture/scale change ever
      // grows the vocabulary past capacity, fail with this message
      // instead of an inscrutable oracle hash mismatch.
      .where(assert_true(forall(col("tk"), e => e.getField("err") === 0),
        lit("sketch_topk: vocabulary exceeded sketch capacity 256 — " +
          "estimates are now approximate and the exact-count oracle " +
          "no longer applies")).isNull)
      .select(explode(col("tk")).as("e"))
      .select(col("e.value").as("word"), col("e.est").as("cnt"),
        col("e.err").as("err"))
      .orderBy(col("cnt").desc, col("word"))
  }

  private val topkWordsSql =
    """SELECT word, cnt, CAST(0 AS BIGINT) AS err FROM (
      |  SELECT u AS word, COUNT(*) AS cnt FROM (
      |    SELECT unnest(string_split(text, ' ')) AS u FROM documents)
      |  WHERE u <> '' GROUP BY u)
      |ORDER BY cnt DESC, word LIMIT 10""".stripMargin

  // ---- sketch_hll_rollup: mergeable sketches under grouping sets --------
  // The property that makes sketches matter at 100 TB: HLL partials MERGE,
  // so one pass computes distinct counts for (lang, source), (lang), and
  // the grand total — Spark rolls the same partial sketches up through
  // every grouping set instead of rescanning per level. Exact companion
  // graded by the oracle; the in-query flag asserts the HLL++ estimate
  // within 10% at every rollup level. Sort order pins NULLS FIRST on both
  // sides (the engines' ASC defaults disagree).
  private def hllRollup(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("lang"), col("source"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("lang"), col("source"),
        Dedup.h48(col("w")).as("wh"))
      .rollup(col("lang"), col("source"))
      .agg(countDistinct(col("wh")).as("exact_words"),
        approx_count_distinct(col("wh"), 0.02).as("approx"))
      .select(col("lang"), col("source"), col("exact_words"),
        (abs(col("approx").cast(DoubleType) - col("exact_words").cast(DoubleType)) /
          col("exact_words").cast(DoubleType) <= 0.10).as("acd_ok"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)

  private val hllRollupSql =
    """WITH wrd AS (
      |  SELECT lang, source,
      |    CAST('0x'||substring(md5(u),1,12) AS BIGINT) AS wh
      |  FROM (SELECT lang, source, unnest(string_split(text, ' ')) AS u
      |        FROM documents) WHERE u <> '')
      |SELECT lang, source, COUNT(DISTINCT wh) AS exact_words, TRUE AS acd_ok
      |FROM wrd GROUP BY ROLLUP (lang, source)
      |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin

  override val defs: Seq[(String, QueryDef)] = Seq(
    "sketch_cms" -> QueryDef(cms, Some(cmsSql)),
    "sketch_hll" -> QueryDef(hll, Some(hllSql)),
    "sketch_quantile" -> QueryDef(quantileSketch, Some(quantileSketchSql)),
    "sketch_bloom" -> QueryDef(bloom, Some(bloomSql)),
    "sketch_topk" -> QueryDef(topkWords, Some(topkWordsSql)),
    "sketch_hll_rollup" -> QueryDef(hllRollup, Some(hllRollupSql)),
  )
}
