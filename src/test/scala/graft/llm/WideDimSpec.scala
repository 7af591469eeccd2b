package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** Wide-embedding stress: the LSH/IVF/centroid family is exercised at
  * dim 1024 — a realistic model width, far beyond the fixture's dim 64 —
  * so the plane-matrix guard's "supports dims ≤ 4096" claim is tested by
  * a dimension the standard fixtures never reach, and the guard itself
  * is shown to fire (not silently truncate) past 4096. */
class WideDimSpec extends SparkSuite {
  import spark.implicits._

  private lazy val wideDir = WideEmb.dir(spark)

  test("lshInput admits dim-1024 vectors without tripping the 4096 guard") {
    val n = Dedup.lshInput(spark, wideDir).count()
    assert(n == 200L)
  }

  test("ann_lsh_buckets at dim 1024: one bucket per vector, matches the HOF fold") {
    val got = SparkEntry.queries("ann_lsh_buckets")(spark, wideDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 200)
    // independent recomputation through the interpreted HOF formulation
    // the codegen'd LshProject replaced — full-dim cross-check
    val hof = graft.core.Tables.embeddings(spark, wideDir)
      .select(col("vec_id"), typedLit(Dedup.lshDirs).as("dirs"), col("embedding"))
      .selectExpr("vec_id",
        """aggregate(sequence(0, 7), CAST(0 AS BIGINT), (acc, p) ->
          |  acc + IF(
          |    aggregate(
          |      zip_with(embedding,
          |        slice(element_at(dirs, p + 1), 1, size(embedding)),
          |        (v, dr) -> CAST(CAST(v AS DOUBLE) AS DECIMAL(20,10)) * dr),
          |      CAST(0 AS DECIMAL(38,10)),
          |      (a, x) -> CAST(a + x AS DECIMAL(38,10))) > 0,
          |    shiftleft(CAST(1 AS BIGINT), p), CAST(0 AS BIGINT))) AS b""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == hof)
  }

  test("ann_ivf_topk at dim 1024: 5 probes x top-5, self excluded") {
    val rows = SparkEntry.queries("ann_ivf_topk")(spark, wideDir).collect()
    assert(rows.length == 25)
    assert(rows.forall(r => r.getAs[Long]("q_id") != r.getAs[Long]("neighbor_id")))
    assert(rows.forall(r => math.abs(r.getAs[Double]("cos_sim")) <= 1.0001))
  }

  test("emb_centroid_stats at dim 1024: one row per label") {
    val rows = SparkEntry.queries("emb_centroid_stats")(spark, wideDir).collect()
    assert(rows.length == 10)
  }

  test("emb_covariance at dim 1024: full upper triangle, Cauchy-Schwarz holds") {
    // the Gramian aggregate path — dim 1024 was impossible under the
    // former 512-capped pair explode; 200 fixed-dim vectors → the full
    // 1024·1025/2 upper triangle
    val rows = SparkEntry.queries("emb_covariance")(spark, wideDir).collect()
    assert(rows.length == 1024 * 1025 / 2)
    val cov = rows.map(r =>
      (r.getAs[Int]("j"), r.getAs[Int]("k")) -> r.getAs[Double]("cov")).toMap
    // diagonal variances non-negative, off-diagonals bounded by them
    assert((0 until 1024).forall(j => cov((j, j)) >= 0.0))
    assert(cov.forall { case ((j, k), c) =>
      c * c <= cov((j, j)) * cov((k, k)) * (1.0 + 1e-9) + 1e-12 })
  }

  test("emb_top_pc at dim 1024: one row per dim, unit-norm iterate") {
    val rows = SparkEntry.queries("emb_top_pc")(spark, wideDir).collect()
    assert(rows.length == 1024)
    val norm = math.sqrt(rows.map(r => {
      val p = r.getAs[Double]("pc"); p * p }).sum)
    // v9 re-normalizes every round; floor-rounding moves the norm by at
    // most ~dim·1e-9
    assert(math.abs(norm - 1.0) < 1e-5, s"norm $norm")
  }

  test("dim past the plane matrix fails loudly, never truncates") {
    val wide = Seq((0L, Array.fill(Dedup.MaxEmbeddingDim + 100)(1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val dir = graft.core.Fixtures.path("dimOver")
    wide.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val ex = intercept[Exception] {
      Dedup.lshInput(spark, dir)
        .select(Dedup.lshBucket(8).as("b")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("LSH plane matrix")), ex.toString)
  }
}
