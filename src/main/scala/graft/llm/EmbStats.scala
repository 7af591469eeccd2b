package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.core.{QueryDef, QueryGroup, Tables => T}

/** Embedding-column analytics: per-label centroid quality — vector count,
  * centroid norm, and the distribution (mean/min/max) of each member's
  * cosine to its label centroid. The embedding-drift / cluster-cohesion
  * report a curation pipeline runs after every re-embedding.
  *
  * Determinism: float components are quantized to 1e-6 fixed-point with
  * `floor(v·1e6 + 0.5)` — pure IEEE multiply/add/floor, bit-identical in
  * both engines — and every sum (dot products, norms) then runs in exact
  * BIGINT (≤ 6.4e13 per group, far under 2^53). A decimal cast would NOT
  * work here: a float's shortest decimal repr regularly ends exactly at
  * the cut digit, and Spark (HALF_UP on the repr) and DuckDB disagree on
  * those ties — observed live as 1-in-~500 cosines off by one rounding
  * unit. Cosines round through DECIMAL(10,4) at the edge (full-precision
  * doubles — repr ties are measure-zero there), the repo's cosine rule.
  *
  * Scale shape: one explode (64 rows per vector), two hash aggregations
  * keyed by (label, pos) then (label, vec_id), and a broadcast-sized
  * centroid table (labels × dims) joined back — the same partial-agg
  * pattern as IVF, no driver-side math.
  */
object EmbStats extends QueryGroup {

  /** 1e-6 fixed-point quantizer: portable because it is IEEE arithmetic
    * on identical doubles, not a decimal-cast rounding. */
  private def q6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)).cast(LongType)

  private def centroidStats(s: SparkSession, d: String): DataFrame = {
    val comp = T.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "v0")))
      .select(col("vec_id"), col("label"), col("pos"),
        q6(col("v0").cast(DoubleType)).as("qv"))
    val cent = comp.groupBy(col("label"), col("pos"))
      .agg(q6(sum(col("qv")).cast(DoubleType) /
        (count(lit(1)) * lit(1000000L)).cast(DoubleType)).as("qc"))
    val cnorm = cent.groupBy(col("label"))
      .agg(sum(col("qc") * col("qc")).as("cq2"))
    val perVec = comp.join(cent, Seq("label", "pos"))
      .groupBy(col("label"), col("vec_id"))
      .agg(sum(col("qv") * col("qc")).as("dotq"),
        sum(col("qv") * col("qv")).as("vq2"))
    perVec.join(cnorm, Seq("label"))
      .select(col("label"), col("vec_id"), col("cq2"),
        // zero-norm guard (the family-wide degenerate contract): a vector
        // quantizing to all-zero, or a label whose members cancel to a
        // zero centroid, gets a DEFINED null cosine — not an ANSI
        // divide-by-zero (Spark) vs silent NULL (DuckDB) split
        when(col("vq2") > 0 && col("cq2") > 0,
          (col("dotq").cast(DoubleType) /
            (sqrt(col("vq2").cast(DoubleType)) * sqrt(col("cq2").cast(DoubleType))))
            .cast(DecimalType(10, 4))).as("cosd"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        (sqrt(max(col("cq2")).cast(DoubleType)) / lit(1000000.0))
          .cast(DecimalType(10, 4)).cast(DoubleType).as("centroid_norm"),
        (sum(col("cosd")).cast(DoubleType) / count(lit(1))).as("mean_cos"),
        min(col("cosd")).cast(DoubleType).as("min_cos"),
        max(col("cosd")).cast(DoubleType).as("max_cos"))
      .orderBy(col("label"))
  }

  private val centroidStatsSql =
    """WITH comp AS (
      |  SELECT vec_id, label, pos,
      |    CAST(floor(CAST(v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS qv
      |  FROM (
      |    SELECT vec_id, label, unnest(embedding) AS v,
      |      generate_subscripts(embedding, 1) AS pos
      |    FROM embeddings)),
      |cent AS (
      |  SELECT label, pos,
      |    CAST(floor(CAST(SUM(qv) AS DOUBLE) /
      |      CAST(COUNT(*) * 1000000 AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
      |      AS qc
      |  FROM comp GROUP BY label, pos),
      |cnorm AS (
      |  SELECT label, CAST(SUM(qc * qc) AS BIGINT) AS cq2
      |  FROM cent GROUP BY label),
      |pv AS (
      |  SELECT comp.label, vec_id,
      |    CAST(SUM(qv * qc) AS BIGINT) AS dotq,
      |    CAST(SUM(qv * qv) AS BIGINT) AS vq2
      |  FROM comp JOIN cent ON comp.label = cent.label AND comp.pos = cent.pos
      |  GROUP BY comp.label, vec_id),
      |cosd AS (
      |  SELECT pv.label, vec_id, cq2,
      |    CASE WHEN vq2 > 0 AND cq2 > 0 THEN
      |      CAST(CAST(dotq AS DOUBLE) /
      |        (sqrt(CAST(vq2 AS DOUBLE)) * sqrt(CAST(cq2 AS DOUBLE)))
      |        AS DECIMAL(10,4)) END AS cosd
      |  FROM pv JOIN cnorm ON pv.label = cnorm.label)
      |SELECT label, COUNT(*) AS n_vecs,
      |  CAST(CAST(sqrt(CAST(MAX(cq2) AS DOUBLE)) / 1000000.0 AS DECIMAL(10,4))
      |    AS DOUBLE) AS centroid_norm,
      |  CAST(SUM(cosd) AS DOUBLE) / COUNT(*) AS mean_cos,
      |  CAST(MIN(cosd) AS DOUBLE) AS min_cos,
      |  CAST(MAX(cosd) AS DOUBLE) AS max_cos
      |FROM cosd GROUP BY label ORDER BY label""".stripMargin

  // ---- emb_quantize_int8: per-vector symmetric int8 quantization --------
  // The storage/serving compression step for embedding tables: per-vector
  // absmax scale, q_i = half-up(v_i * 127 / scale) in [-127, 127]. A
  // shuffle-free narrow map (per-row array HOFs; at 100 TB this is an
  // embarrassingly parallel rewrite pass), digested to scalar columns for
  // the driver's hasher. Rounding is floor(x + 0.5) — half-toward-+inf,
  // pure IEEE arithmetic on identical doubles in both engines — NOT
  // round(), whose decimal-repr ties Spark and DuckDB settle differently
  // (the q6 lesson above).
  private def quantizeInt8(s: SparkSession, d: String): DataFrame = {
    T.embeddings(s, d)
      // null elements dropped and empty (post-filter) vectors excluded,
      // EXPLICITLY and in both engines: Spark's aggregate null-propagates
      // where DuckDB's list_sum skips NULLs, and they disagree on an
      // empty fold too (seed 0 vs NULL) — either would be a silent
      // parity landmine. Same guard rationale as Dedup.lshInput.
      .select(col("vec_id"),
        filter(transform(col("embedding"), x => x.cast(DoubleType)),
          v => v.isNotNull).as("emb"))
      .where(size(col("emb")) > 0)
      .select(col("vec_id"), col("emb"),
        array_max(transform(col("emb"), v => abs(v))).as("scale"))
      .select(col("vec_id"), col("scale"),
        transform(col("emb"), v =>
          when(col("scale") === 0.0, lit(0L))
            .otherwise(floor(v * lit(127.0) / col("scale") + lit(0.5))
              .cast(LongType))).as("q"))
      .select(col("vec_id"), col("scale"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"),
        aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
        size(filter(col("q"), x => abs(x) === 127)).cast(LongType)
          .as("n_sat"))
      .orderBy(col("vec_id"))
  }

  private val quantizeInt8Sql =
    """WITH e0 AS (
      |  SELECT vec_id, list_filter(CAST(embedding AS DOUBLE[]),
      |    v -> v IS NOT NULL) AS emb
      |  FROM embeddings),
      |e AS (
      |  SELECT vec_id, emb,
      |    list_max(list_transform(emb, v -> abs(v))) AS scale
      |  FROM e0 WHERE len(emb) > 0),
      |q AS (
      |  SELECT vec_id, scale,
      |    list_transform(emb, v -> CASE WHEN scale = 0 THEN 0
      |      ELSE CAST(floor(v * 127.0 / scale + 0.5) AS BIGINT) END) AS qa
      |  FROM e)
      |SELECT vec_id, scale,
      |  CAST(list_min(qa) AS BIGINT) AS q_min,
      |  CAST(list_max(qa) AS BIGINT) AS q_max,
      |  CAST(list_sum(qa) AS BIGINT) AS q_sum,
      |  CAST(len(list_filter(qa, x -> abs(x) = 127)) AS BIGINT) AS n_sat
      |FROM q ORDER BY vec_id""".stripMargin

  // ---- emb_truncate_recall: Matryoshka truncation sweep -----------------
  // The dimension-budget question MRL-trained embeddings pose: how much
  // retrieval quality survives if the pipeline stores only the first
  // 8/16/32 dims? For each budget, brute-force cosine top-5 on the PREFIX
  // slices; recall is graded against the largest budget's (full-vector)
  // top-5. One query answers every budget: the budget list rides an
  // explode, so the slices, the per-(budget, probe) rank windows, and the
  // hit counts all share one plan — no per-budget re-derivation.
  //
  // Determinism: raw-double cosines over identical prefix slices (the q31
  // precedent — array-order sums are bit-equal in both engines), integer
  // hit counts, and ONE final IEEE division. A prefix slice containing a
  // NULL element or quantizing to zero norm drops that (vector, budget)
  // row in both engines (null-propagating dot ≡ the guarded-CASE SQL).
  //
  // Scale shape: candidate generation per budget is the q31 broadcast
  // cross (the declared small-scale ground truth — the ANN paths are the
  // scale story); everything downstream of the rank windows is ≤
  // 5·|probes| rows per budget.
  private def truncateRecall(s: SparkSession, d: String): DataFrame = {
    import graft.functions.DotProduct.dot
    import org.apache.spark.sql.expressions.Window
    val budgets = array(Seq(8, 16, 32, 64).map(lit): _*)
    val sl = T.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("emb"))
      .select(col("vec_id"), explode(budgets).as("budget"), col("emb"))
      .withColumn("xs", slice(col("emb"), lit(1), col("budget")))
      .withColumn("nsq", dot(col("xs"), col("xs")))
      .where(col("nsq") > 0)
      .select(col("vec_id"), col("budget"), col("xs"), col("nsq"))
    val q = sl.filter(col("vec_id") < 5)
      .select(col("budget"), col("vec_id").as("q_id"),
        col("xs").as("q_xs"), col("nsq").as("q_nsq"))
    val w = Window.partitionBy(col("budget"), col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val top5 = sl.join(q, Seq("budget"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", dot(col("q_xs"), col("xs")) /
        (sqrt(col("q_nsq")) * sqrt(col("nsq"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("budget"), col("q_id"), col("vec_id").as("n_id"))
    val truth = top5.filter(col("budget") === 64)
      .select(col("q_id"), col("n_id"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    val hits = top5.join(truth, Seq("q_id", "n_id"))
      .groupBy(col("budget")).agg(count(lit(1)).as("n_hits"))
    sl.select(col("budget")).distinct()
      .join(hits, Seq("budget"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .crossJoin(broadcast(nTruth))
      .withColumn("recall", col("n_hits").cast(DoubleType) /
        col("n_truth").cast(DoubleType))
      .select(col("budget"), col("n_truth"), col("n_hits"), col("recall"))
      .orderBy(col("budget"))
  }

  private val truncateRecallSql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      |  FROM embeddings),
      |sl0 AS (SELECT vec_id, budget, list_slice(emb, 1, budget) AS xs
      |  FROM e CROSS JOIN (SELECT unnest([8, 16, 32, 64]) AS budget) b),
      |sl AS (SELECT vec_id, budget, xs, nsq FROM (
      |  SELECT vec_id, budget, xs,
      |    CASE WHEN len(list_filter(xs, v -> v IS NULL)) > 0 THEN NULL
      |         ELSE list_inner_product(xs, xs) END AS nsq
      |  FROM sl0) WHERE nsq > 0),
      |top5 AS (SELECT budget, q_id, n_id FROM (
      |    SELECT c.budget, q.vec_id AS q_id, c.vec_id AS n_id,
      |      ROW_NUMBER() OVER (PARTITION BY c.budget, q.vec_id ORDER BY
      |        list_inner_product(q.xs, c.xs) / (sqrt(q.nsq) * sqrt(c.nsq))
      |          DESC, c.vec_id) AS rn
      |    FROM sl c JOIN sl q ON q.budget = c.budget AND q.vec_id < 5
      |      AND q.vec_id <> c.vec_id)
      |  WHERE rn <= 5),
      |tr AS (SELECT q_id, n_id FROM top5 WHERE budget = 64),
      |nt AS (SELECT COUNT(*) AS n_truth FROM tr),
      |ht AS (SELECT budget, COUNT(*) AS n_hits
      |       FROM top5 JOIN tr USING (q_id, n_id) GROUP BY budget)
      |SELECT b.budget, nt.n_truth, COALESCE(ht.n_hits, 0) AS n_hits,
      |  CAST(COALESCE(ht.n_hits, 0) AS DOUBLE) / CAST(nt.n_truth AS DOUBLE)
      |    AS recall
      |FROM (SELECT DISTINCT budget FROM sl) b
      |LEFT JOIN ht USING (budget) CROSS JOIN nt
      |ORDER BY budget""".stripMargin

  // ---- emb_outlier_zscore: per-dimension z-score outlier report ----------
  // The embedding sanity filter a curation run applies before ANN
  // indexing: per dimension, corpus mean/variance; per vector, the worst
  // absolute z-score across dimensions and how many dimensions sit beyond
  // 3σ. Vectors topping the report are the mis-encoded / corrupted rows
  // you quarantine before they poison centroid training.
  //
  // Determinism: with μ = s1/(n·1e6) and σ = sqrt(n·s2 − s1²)/(n·1e6)
  // over q6-quantized components, the z-score ALGEBRAICALLY reduces to
  //     z = |n·qv − s1| / sqrt(n·s2 − s1²)
  // — an exact-integer numerator (DECIMAL(38,0) here ≡ HUGEINT in the
  // oracle; n·s2 ≤ ~1e24 would silently wrap an int64 at sf1, hence the
  // wide type), ONE sqrt, ONE division, both on correctly-rounded doubles
  // → bit-identical engines. z rounds through DECIMAL(10,4) at the edge
  // (the family's cosine rule) BEFORE max/comparisons, so ordering and
  // the 3σ test see identical decimals. A zero-variance dimension yields
  // a DEFINED null z (constant dimension says nothing about outliers).
  //
  // Scale shape: one explode + per-pos hash agg (64 rows out), stats
  // broadcast back (dims × 24 bytes at ANY corpus size), per-vector agg,
  // TakeOrderedAndProject top-50 — a single wide exchange at 100 TB.
  private def outlierZscore(s: SparkSession, d: String): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val comp = T.embeddings(s, d)
      .select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "v0")))
      .select(col("vec_id"), col("pos"),
        q6(col("v0").cast(DoubleType)).as("qv"))
    val st = comp.groupBy(col("pos")).agg(
      count(lit(1)).as("n"),
      sum(col("qv").cast(dec38)).as("s1"),
      sum((col("qv") * col("qv")).cast(dec38)).as("s2"))
      .select(col("pos"), col("n"), col("s1"),
        (col("n").cast(dec38) * col("s2") - col("s1") * col("s1"))
          .cast(dec38).as("varnum"))
    comp.join(broadcast(st), Seq("pos"))
      .select(col("vec_id"),
        when(col("varnum") > 0,
          (abs(col("n").cast(dec38) * col("qv").cast(dec38) - col("s1"))
            .cast(DoubleType) / sqrt(col("varnum").cast(DoubleType)))
            .cast(DecimalType(10, 4))).as("zd"))
      .groupBy(col("vec_id"))
      .agg(max(col("zd")).as("max_zd"),
        sum(when(col("zd") > 3.0, 1L).otherwise(0L)).cast(LongType)
          .as("n_extreme"))
      .where(col("max_zd").isNotNull)
      .orderBy(col("max_zd").desc, col("vec_id")).limit(50)
      .select(col("vec_id"), col("max_zd").cast(DoubleType).as("max_z"),
        col("n_extreme"))
  }

  private val outlierZscoreSql =
    """WITH comp AS (
      |  SELECT vec_id, pos,
      |    CAST(floor(CAST(v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS qv
      |  FROM (
      |    SELECT vec_id, unnest(embedding) AS v,
      |      generate_subscripts(embedding, 1) - 1 AS pos
      |    FROM embeddings)),
      |st AS (
      |  SELECT pos, COUNT(*) AS n,
      |    SUM(CAST(qv AS HUGEINT)) AS s1,
      |    SUM(CAST(qv AS HUGEINT) * CAST(qv AS HUGEINT)) AS s2
      |  FROM comp GROUP BY pos),
      |z AS (
      |  SELECT vec_id,
      |    CASE WHEN n * s2 - s1 * s1 > 0 THEN
      |      CAST(CAST(abs(CAST(n AS HUGEINT) * CAST(qv AS HUGEINT) - s1)
      |          AS DOUBLE) / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
      |        AS DECIMAL(10,4)) END AS zd
      |  FROM comp JOIN st USING (pos)),
      |agg AS (
      |  SELECT vec_id, MAX(zd) AS max_zd,
      |    CAST(SUM(CASE WHEN zd > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_extreme
      |  FROM z GROUP BY vec_id)
      |SELECT vec_id, CAST(max_zd AS DOUBLE) AS max_z, n_extreme
      |FROM agg WHERE max_zd IS NOT NULL
      |ORDER BY max_zd DESC, vec_id LIMIT 50""".stripMargin

  override val defs: Seq[(String, QueryDef)] = Seq(
    "emb_centroid_stats" -> QueryDef(centroidStats, Some(centroidStatsSql)),
    "emb_outlier_zscore" -> QueryDef(outlierZscore, Some(outlierZscoreSql)),
    "emb_quantize_int8" -> QueryDef(quantizeInt8, Some(quantizeInt8Sql)),
    "emb_truncate_recall" -> QueryDef(truncateRecall, Some(truncateRecallSql)))
}
