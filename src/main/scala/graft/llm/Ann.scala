package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import graft.core.{QueryDef, QueryGroup, Tables => T}
import graft.functions.DotProduct.dot

/** Approximate-nearest-neighbor scale paths (SURVEY.md extension list):
  * the brute-force q31 is the ground truth; these trade recall for a
  * candidate set that stays bounded at 100 TB.
  *
  *  - LSH: probe and candidates meet only inside a shared
  *    random-projection bucket. The plane count is a knob
  *    ([[buckets]]/[[multiProbeQ]]): the registry's topk/multiprobe/
  *    hard-negative queries pin `planes=4` (16 buckets — oracle
  *    stability), `ann_lsh_buckets` shows the 8-plane/256-bucket
  *    projection, and `AnnRecallSpec` grades recall at planes=8. The
  *    join key is the bucket, so cost is Σ bucket² not n²; more planes
  *    shrink each inverted list as the corpus grows, multi-probe
  *    (Hamming-1 bucket flips) buys the recall back.
  *  - IVF: coarse quantizer = deterministic k-means (init = the k lowest
  *    surviving vec_ids, parameterized k/iters); probes scan only the
  *    `nprobe` nearest centroids' inverted lists.
  *
  * Both are deterministic end-to-end (seeded planes, exact-decimal
  * projections and centroid means) and ORACLE-GRADED: the LSH pipeline and
  * the fixed 2-iteration Lloyd loop are both replayed in DuckDB SQL.
  * `AnnRecallSpec` additionally grades recall vs the q31 ground truth —
  * keep any change deterministic or BOTH gates break.
  */
object Ann extends QueryGroup {

  private[llm] def normed(s: SparkSession, d: String): DataFrame =
    T.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("emb"))
      .withColumn("nsq", dot(col("emb"), col("emb")))
      // zero-norm (incl. empty) vectors have no cosine — excluded here
      // and in both ANN oracles; ANSI would throw DIVIDE_BY_ZERO
      .where(col("nsq") > 0)

  /** Bucket per vector from `planes` seeded hyperplanes (2^planes
    * buckets; the registry pins planes=4 → 16 buckets, ~30 candidates per
    * probe at sf0.01). Same md5-derived ±1 construction as
    * Dedup.lshBuckets (shared precomputed matrix + fused codegen'd
    * projection — shuffle-free). Fewer planes trade candidate-set size
    * for recall; a real corpus raises `planes` with its size so each
    * inverted list stays bounded (`AnnRecallSpec` gates planes=8). */
  private[llm] def buckets(s: SparkSession, d: String,
      planes: Int = 4): DataFrame =
    Dedup.lshInput(s, d)
      .select(col("vec_id"), Dedup.lshBucket(planes).as("bucket"))

  /** Exact cosine re-rank shared by every ANN surface: candidates
    * (vec_id, emb, nsq + the join key) meet the broadcast probe set
    * (q_id, q_emb, q_nsq + key) on `key`; top-5 by cosine survive, ties
    * to the lower vec_id, output rounded through DECIMAL(10,4). ONE
    * definition — the tie-break and rounding are oracle-parity-critical
    * and must not drift between the LSH, multi-probe, and IVF paths
    * (the SQL twin is [[lshTopkTail]]). */
  private[llm] def rerank(candidates: DataFrame, probes: DataFrame,
      key: String, keep: Column = lit(true)): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    candidates.join(broadcast(probes), Seq(key))
      .filter(col("q_id") =!= col("vec_id") && keep)
      .withColumn("dot", dot(col("q_emb"), col("emb")))
      .withColumn("cos", col("dot") / (sqrt(col("q_nsq")) * sqrt(col("nsq"))))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("cos").cast(DecimalType(10, 4)).cast(DoubleType).as("cos_sim"),
        col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** ANN top-5 via LSH bucketing at any plane count: probes 0..4,
    * candidates = same bucket (or the Hamming-1 flip set when
    * `multiProbe`), exact cosine re-rank inside the candidate buckets.
    * The registry surfaces pin planes=4; the spec-only planes=8 path is
    * the same code with a different knob, so recall gates grade exactly
    * what a production index would run. */
  private[llm] def lshTopkAt(s: SparkSession, d: String, planes: Int,
      multiProbe: Boolean): DataFrame = {
    val n = normed(s, d).join(buckets(s, d, planes), Seq("vec_id"))
    val q =
      if (multiProbe) multiProbeQ(n, withLabel = false, planes)
      else n.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
          col("nsq").as("q_nsq"), col("bucket"))
    rerank(n, q, "bucket")
  }

  /** Registry surface: single-bucket LSH top-5 at the pinned planes=4. */
  private def lshTopk(s: SparkSession, d: String): DataFrame =
    lshTopkAt(s, d, planes = 4, multiProbe = false)

  /** IVF ANN: coarse quantizer = deterministic k-means (init = the `k`
    * lowest vec_ids, `iters` Lloyd rounds). Each iteration is a
    * distributed narrow aggregation; only the k×dim centroid table
    * (tiny) touches the driver and is re-broadcast — the classic
    * scalable Lloyd loop. Probes scan the `nprobe` nearest centroids'
    * inverted lists. The registry query pins k=8/iters=2/nprobe=1 for
    * oracle stability (measured recall@5 vs q31 is ~0.88 on the
    * structureless fixture embeddings); real index builds call this
    * directly with model-sized parameters — `AnnRecallSpec` grades
    * k=32/nprobe=2 on the dim-1024 fixture. */
  private[llm] def ivf(s: SparkSession, d: String, k: Int, iters: Int,
      nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= k,
      s"ivf: need 1 <= nprobe <= k; got k=$k nprobe=$nprobe")
    val (lists, cdf) = ivfModel(s, d, k, iters)
    val probes = lists.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("nsq").as("q_nsq"))
    rerank(lists, probeCells(probes, cdf, nprobe), "ck")
  }

  /** The guarded vector-vs-centroid cosine, against a joined centroid
    * row's (cvec, c_nsq) columns. ONE definition for every consumer
    * ([[assignCells]], [[probeCells]], `IvfIndex.quality`) so the
    * staleness yardstick can never drift from the argmax rule.
    * c_nsq > 0 guard: initial centroids are nonzero by construction, but
    * a Lloyd UPDATE whose members cancel exactly yields a zero centroid —
    * unguarded, 0/0 = NaN sorts HIGHEST in Spark's struct ordering and
    * the dead centroid would win every argmax (DuckDB's NULL quietly
    * ranks last; the null here matches it). */
  private[llm] def centroidCosine(emb: Column, nsq: Column): Column =
    when(col("c_nsq") > 0,
      dot(emb, col("cvec")) / (sqrt(nsq) * sqrt(col("c_nsq"))))

  /** Nearest-centroid assignment — THE argmax rule of the whole IVF
    * family (Lloyd iterations, final lists, and [[IvfIndex.assign]]'s
    * out-of-sample path all route through here so they cannot diverge).
    * Argmax via ordered-struct max: no window sort, one hash aggregate. */
  private[llm] def assignCells(n: DataFrame, cdf: DataFrame): DataFrame =
    n.crossJoin(broadcast(cdf))
      .withColumn("c_cos", centroidCosine(col("emb"), col("nsq")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("c_cos"), (-col("ck")).as("nck"))).as("m"))
      .select(col("vec_id"), (-col("m.nck")).cast("int").as("ck"))

  /** Probe cells: the nprobe nearest centroids per probe (cosine, ties to
    * the lower ck — the same rule as assign); at nprobe=1 this IS the
    * probe's own cell. The (probe × nprobe) fan-out stays constant-size,
    * so the broadcast stays provably tiny. Shared with the persisted-index
    * search path ([[IvfIndex]]). */
  private[llm] def probeCells(probes: DataFrame, cdf: DataFrame,
      nprobe: Int): DataFrame = {
    val wc = Window.partitionBy(col("q_id"))
      .orderBy(col("c_cos").desc, col("ck"))
    probes.crossJoin(broadcast(cdf))
      .withColumn("c_cos", centroidCosine(col("q_emb"), col("q_nsq")))
      .withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("q_nsq"), col("ck"))
  }

  /** Deterministic IVF model shared by the top-k probe path and the
    * cluster-balanced sampler: the final inverted lists (vec_id, emb,
    * nsq, ck) plus the centroid table (ck, cvec, c_nsq). */
  private[llm] def ivfModel(s: SparkSession, d: String, k: Int,
      iters: Int): (DataFrame, DataFrame) = {
    import s.implicits._
    require(k >= 1 && iters >= 0,
      s"ivfModel: need k >= 1, iters >= 0; got k=$k iters=$iters")
    val n = normed(s, d).cache()

    def centDf(cents: Seq[(Int, Seq[Double])]): DataFrame =
      cents.toDF("ck", "cvec")
        .withColumn("c_nsq", dot(col("cvec"), col("cvec")))

    def assign(cdf: DataFrame): DataFrame = assignCells(n, cdf)

    // init = the k lowest SURVIVING vec_ids, renumbered 0..k-1 in vec_id
    // order — the oracle's c0 CTE replays exactly this (rank + limit),
    // so a dropped zero-norm id or sparse ids cannot desync the two
    var cents: Seq[(Int, Seq[Double])] =
      n.orderBy(col("vec_id")).limit(k)
        .select(col("emb")).collect().toSeq
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0)) }
    (1 to iters).foreach { _ =>
      val assigned = assign(centDf(cents))
      val updated = assigned.join(n, Seq("vec_id"))
        .select(col("ck"), posexplode(col("emb")).as(Seq("pos", "v")))
        .groupBy(col("ck"), col("pos"))
        // exact-decimal mean (Tables.avgExact shape): the decimal sum is
        // order-independent, so the centroids — hence the whole fixed
        // 2-iteration Lloyd loop — are deterministic and oracle-replayable
        .agg((sum(col("v").cast(DecimalType(20, 10))).cast(DoubleType) /
          count(lit(1))).as("c"))
        .groupBy(col("ck"))
        .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("ps"))
        .select(col("ck"), transform(col("ps"), p => p.getField("c")).as("cvec"))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
      // empty cells keep their previous centroid
      val byCk = updated.toMap
      cents = cents.map { case (k, c) => (k, byCk.getOrElse(k, c)) }
    }

    val cdf = centDf(cents)
    (n.join(assign(cdf), Seq("vec_id")), cdf)
  }

  /** Registry surface: the oracle-pinned parameterization. */
  private def ivfTopk(s: SparkSession, d: String): DataFrame =
    ivf(s, d, k = 8, iters = 2, nprobe = 1)

  /** Multi-probe probe set: each probe row fans out to its own bucket
    * plus the `planes` Hamming-1 flips (one sign flip per plane — at the
    * registry's planes=4 the SQL twin is [[multiProbePSql]]'s
    * `[0,1,2,4,8]` XOR masks; change both together). Candidates carry
    * exactly one bucket each and the probe buckets are distinct, so no
    * (probe, candidate) pair repeats and the downstream join needs no
    * dedup. */
  private def multiProbeQ(n: DataFrame, withLabel: Boolean,
      planes: Int = 4): DataFrame = {
    val flips = array((lit(0L) +: (0 until planes).map(p => lit(1L << p))): _*)
    val keep = Seq(col("q_id"), col("q_emb"), col("q_nsq")) ++
      (if (withLabel) Seq(col("label").as("q_label")) else Nil)
    n.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("nsq").as("q_nsq"), col("label"), col("bucket"))
      .withColumn("flip", explode(flips))
      .select(keep :+ col("bucket").bitwiseXOR(col("flip")).as("bucket"): _*)
  }

  /** Multi-probe LSH: the classic recall knob that needs NO extra tables
    * or planes. `AnnRecallSpec` asserts recall ≥ the single-bucket
    * `ann_lsh_topk`. */
  private def lshMultiprobe(s: SparkSession, d: String): DataFrame =
    lshTopkAt(s, d, planes = 4, multiProbe = true)

  /** Hard-negative mining for contrastive training: per probe, the top-5
    * most-similar vectors carrying a DIFFERENT label — the lookalikes a
    * metric-learning objective gains the most from. Same multi-probe
    * bucket set, cross-label predicate before the re-rank window.
    * NULL-label rows never pair (<> is null-rejecting in both engines,
    * mirrored in the oracle). */
  private def hardNegatives(s: SparkSession, d: String): DataFrame = {
    val n = normed(s, d).join(buckets(s, d), Seq("vec_id"))
    rerank(n, multiProbeQ(n, withLabel = true), "bucket",
      keep = col("label") =!= col("q_label"))
  }

  /** Cluster-balanced diversity sample: assign every vector to its IVF
    * cell, then take a fixed per-cell quota in salted-hash order — the
    * curation move that keeps a corpus's TAIL clusters represented
    * instead of letting head clusters dominate a uniform sample. Hash
    * order (not vec_id order) so the draw is unbiased w.r.t. ingestion
    * order yet fully deterministic for the oracle. At 100 TB the cell
    * count k grows with the corpus, so the per-cell window parallelizes
    * with the data; the rank ≤ quota filter is a WindowGroupLimit (no
    * full sort per cell). */
  private def clusterDiverse(s: SparkSession, d: String): DataFrame = {
    val (lists, _) = ivfModel(s, d, k = 8, iters = 2)
    val w = Window.partitionBy(col("ck")).orderBy(col("skey"), col("vec_id"))
    lists
      .withColumn("skey", Dedup.h48(concat(lit("divsamp:"),
        col("vec_id").cast(StringType))))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 25)
      .select(col("vec_id"), col("ck"), col("rank"))
      .orderBy(col("ck"), col("rank"))
  }

  /** The full LSH pipeline is deterministic (seeded md5 planes,
    * exact-decimal projections, cosine rounded through DECIMAL(10,4)), so
    * unlike most ANN implementations it is oracle-expressible end-to-end:
    * the same 4-plane bucketing + in-bucket exact re-rank in DuckDB.
    * CTE chain shared by the single-bucket and multi-probe oracles. */
  private val lshCtes =
    s"""WITH x AS (
      |  SELECT vec_id,
      |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(20,10)) AS vd,
      |    generate_subscripts(embedding, 1) AS pos
      |  FROM embeddings
      |  WHERE len(list_filter(embedding, v -> v IS NULL)) = 0),
      |proj AS (
      |  SELECT vec_id, p,
      |    SUM(vd * (CASE WHEN substring(md5(concat(p, ':', pos)), 1, 1)
      |          SIMILAR TO '[89a-f]' THEN 1 ELSE -1 END)) AS proj
      |  FROM x CROSS JOIN (SELECT unnest(range(4)) AS p)
      |  GROUP BY vec_id, p),
      |bkt AS (
      |  SELECT vec_id,
      |    CAST(SUM(CASE WHEN proj > 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS bucket
      |  FROM proj GROUP BY vec_id),
      |n AS (
      |  SELECT e.vec_id, e.label, CAST(embedding AS DOUBLE[]) AS emb,
      |    ${Dedup.guardedNsq} AS nsq,
      |    b.bucket
      |  FROM embeddings e JOIN bkt b ON e.vec_id = b.vec_id
      |  WHERE ${Dedup.guardedNsq} > 0)""".stripMargin

  private val lshTopkTail =
    """SELECT q_id, neighbor_id,
      |  CAST(CAST(cos AS DECIMAL(10,4)) AS DOUBLE) AS cos_sim, rn
      |FROM (SELECT *, CAST(ROW_NUMBER() OVER (
      |        PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
      |      FROM p)
      |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin

  private val lshTopkSql =
    s"""$lshCtes,
      |p AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
      |    list_inner_product(q.emb, c.emb) / (sqrt(q.nsq) * sqrt(c.nsq)) AS cos
      |  FROM n q JOIN n c ON q.vec_id < 5 AND q.bucket = c.bucket
      |    AND q.vec_id <> c.vec_id)
      |$lshTopkTail""".stripMargin

  /** Multi-probe pair CTE shared by the plain and hard-negative oracles:
    * each probe meets candidates in its own bucket OR any Hamming-1 flip
    * of it — the `[0,1,2,4,8]` XOR masks mirror [[multiProbeQ]]'s
    * `flips` array (change both together). */
  private def multiProbePSql(extraPred: String): String =
    s"""p AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
      |    list_inner_product(q.emb, c.emb) / (sqrt(q.nsq) * sqrt(c.nsq)) AS cos
      |  FROM n q
      |  CROSS JOIN (SELECT unnest([0, 1, 2, 4, 8]) AS f) fl
      |  JOIN n c ON q.vec_id < 5 AND xor(q.bucket, CAST(f AS BIGINT)) = c.bucket
      |    AND q.vec_id <> c.vec_id$extraPred)""".stripMargin

  private val lshMultiprobeSql =
    s"$lshCtes,\n${multiProbePSql("")}\n$lshTopkTail"

  private val hardNegativesSql =
    s"$lshCtes,\n${multiProbePSql(" AND q.label <> c.label")}\n$lshTopkTail"

  /** The fixed 2-iteration Lloyd loop IS SQL-expressible once centroid
    * means are exact-decimal (order-independent): init = the 8 lowest
    * surviving vec_ids renumbered 0..7 (the engine's rule), two
    * assign+update rounds (argmax cosine, ties to the lower centroid id —
    * same `max(struct(cos, -ck))` rule as the engine), empty cells keep
    * the previous centroid, then probe the final inverted lists. */
  private val ivfAssignCtes =
    s"""WITH x AS (
      |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
      |         generate_subscripts(embedding, 1) AS pos
      |  FROM embeddings
      |  WHERE len(list_filter(embedding, v -> v IS NULL)) = 0),
      |n AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
      |    ${Dedup.guardedNsq} AS nsq
      |  FROM embeddings
      |  WHERE ${Dedup.guardedNsq} > 0),
      |c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS ck,
      |         emb AS cvec
      |       FROM (SELECT vec_id, emb FROM n ORDER BY vec_id LIMIT 8)),
      |a1 AS (
      |  SELECT vec_id, ck FROM (
      |    SELECT n.vec_id, c.ck,
      |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
      |        list_inner_product(n.emb, c.cvec) /
      |          (sqrt(n.nsq) * sqrt(list_inner_product(c.cvec, c.cvec))) DESC,
      |        c.ck) AS rn
      |    FROM n CROSS JOIN c0 c) WHERE rn = 1),
      |u1 AS (
      |  SELECT a.ck, x.pos,
      |    CAST(SUM(CAST(x.v AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS c
      |  FROM a1 a JOIN x ON a.vec_id = x.vec_id GROUP BY a.ck, x.pos),
      |c1 AS (
      |  SELECT c0.ck, COALESCE(u.cvec, c0.cvec) AS cvec
      |  FROM c0 LEFT JOIN (SELECT ck, list(c ORDER BY pos) AS cvec
      |                     FROM u1 GROUP BY ck) u USING (ck)),
      |a2 AS (
      |  SELECT vec_id, ck FROM (
      |    SELECT n.vec_id, c.ck,
      |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
      |        list_inner_product(n.emb, c.cvec) /
      |          (sqrt(n.nsq) * sqrt(list_inner_product(c.cvec, c.cvec))) DESC,
      |        c.ck) AS rn
      |    FROM n CROSS JOIN c1 c) WHERE rn = 1),
      |u2 AS (
      |  SELECT a.ck, x.pos,
      |    CAST(SUM(CAST(x.v AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS c
      |  FROM a2 a JOIN x ON a.vec_id = x.vec_id GROUP BY a.ck, x.pos),
      |c2 AS (
      |  SELECT c1.ck, COALESCE(u.cvec, c1.cvec) AS cvec
      |  FROM c1 LEFT JOIN (SELECT ck, list(c ORDER BY pos) AS cvec
      |                     FROM u2 GROUP BY ck) u USING (ck)),
      |a3 AS (
      |  SELECT vec_id, ck FROM (
      |    SELECT n.vec_id, c.ck,
      |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
      |        list_inner_product(n.emb, c.cvec) /
      |          (sqrt(n.nsq) * sqrt(list_inner_product(c.cvec, c.cvec))) DESC,
      |        c.ck) AS rn
      |    FROM n CROSS JOIN c2 c) WHERE rn = 1),
      |lst AS (SELECT n.vec_id, n.emb, n.nsq, a3.ck FROM n JOIN a3 USING (vec_id))""".stripMargin

  private val ivfTopkSql =
    s"""$ivfAssignCtes,
      |pr AS (SELECT vec_id AS q_id, emb AS q_emb, nsq AS q_nsq, ck
      |       FROM lst WHERE vec_id < 5),
      |p AS (
      |  SELECT pr.q_id, c.vec_id AS neighbor_id,
      |    list_inner_product(pr.q_emb, c.emb) /
      |      (sqrt(pr.q_nsq) * sqrt(c.nsq)) AS cos
      |  FROM lst c JOIN pr ON c.ck = pr.ck AND pr.q_id <> c.vec_id)
      |$lshTopkTail""".stripMargin

  /** Per-cell quota in salted-hash order over the SAME final assignment
    * (`lst`) — the 48-bit '0x'-prefixed md5 key mirrors the engine's
    * conv(md5)/16→10 sample key bit-for-bit. */
  private val clusterDiverseSql =
    s"""$ivfAssignCtes
      |SELECT vec_id, ck, rank FROM (
      |  SELECT vec_id, ck, CAST(ROW_NUMBER() OVER (PARTITION BY ck
      |      ORDER BY CAST('0x'||substring(md5('divsamp:'||CAST(vec_id AS VARCHAR)),1,12)
      |        AS BIGINT), vec_id) AS BIGINT) AS rank
      |  FROM lst)
      |WHERE rank <= 25 ORDER BY ck, rank""".stripMargin

  /** HLL approximate distinct (Spark-native approx_count_distinct, rsd 2%)
    * alongside the exact count — the raw surface for `AnnRecallSpec`. */
  private[llm] def hllDistinctRaw(s: SparkSession, d: String): DataFrame =
    Dedup.words(T.documents(s, d))
      .groupBy(col("lang"))
      .agg(approx_count_distinct(col("word"), 0.02).as("approx_words"),
        countDistinct(col("word")).as("exact_words"))

  /** Registry surface: exact count graded by the oracle; `acd_ok` asserts
    * the HLL++ estimate sits within 10% of exact. */
  private def hllDistinct(s: SparkSession, d: String): DataFrame =
    hllDistinctRaw(s, d)
      .select(col("lang"), col("exact_words"),
        (abs(col("approx_words").cast(DoubleType) - col("exact_words").cast(DoubleType)) /
          col("exact_words").cast(DoubleType) <= 0.10).as("acd_ok"))
      .orderBy(col("lang"))

  private val hllDistinctSql =
    """WITH wrd AS (
      |  SELECT doc_id, lang, word FROM (
      |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
      |    FROM documents) WHERE word <> '')
      |SELECT lang, COUNT(DISTINCT word) AS exact_words, TRUE AS acd_ok
      |FROM wrd GROUP BY lang ORDER BY lang""".stripMargin

  override val defs: Seq[(String, QueryDef)] = Seq(
    "ann_lsh_topk"           -> QueryDef(lshTopk, Some(lshTopkSql)),
    "ann_lsh_multiprobe"     -> QueryDef(lshMultiprobe, Some(lshMultiprobeSql)),
    "ann_hard_negatives"     -> QueryDef(hardNegatives, Some(hardNegativesSql)),
    "ann_ivf_topk"           -> QueryDef(ivfTopk, Some(ivfTopkSql)),
    "sample_cluster_diverse" -> QueryDef(clusterDiverse, Some(clusterDiverseSql)),
    "hll_distinct"           -> QueryDef(hllDistinct, Some(hllDistinctSql)),
  )
}
