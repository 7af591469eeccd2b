package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** SCALING.md's SRP plane-count rule, proven instead of asserted (the
  * MinhashScaleSpec treatment for the embedding-cell families):
  * `dedup_embedding_cosine`, `dedup_semdedup` and `emb_knn_graph` all
  * block candidate pairs on (label, SRP-bucket) cells, so their cost is
  * Σ cell² — at a FIXED plane count cells grow linearly with the corpus
  * and the pair join goes quadratic. The deployment rule on
  * [[Dedup.lshDirsOf]]: planes ≈ log2(corpus / target cell size), which
  * keeps cells bounded while signed-random-projection theory keeps
  * near-duplicate recall high (a pair at angle θ collides per plane with
  * probability 1 − θ/π, so tiny-angle near-dups survive even 12+
  * planes).
  *
  * Corpus: 10× the sf0.01 fixture's vector count (5000 vs 500), built as
  * 2500 known near-duplicate pairs — twin = base with one coordinate
  * nudged by 0.01 (‖base‖ ≈ 4.6, so θ ≈ 0.002 rad and expected recall
  * ≈ 1 − 12·θ/π ≈ 0.99 at 12 planes). Components are md5-derived —
  * no RNG, the grade never flakes. */
class SrpScaleSpec extends SparkSuite {
  import spark.implicits._

  private val nPairs = SrpScaleSpec.NPairs

  private lazy val corpus: DataFrame = spark.range(0L, nPairs.toLong)
    // static fn: the suite itself must not ship with the closure
    .flatMap((k: java.lang.Long) => SrpScaleSpec.pairOf(k.longValue))
    .toDF("vec_id", "embedding")
    .repartition(32)

  private def bucketed(planes: Int): DataFrame =
    corpus.select(col("vec_id"),
      graft.functions.LshProject.bucket(col("embedding"),
        Dedup.lshDirsOf(planes), planes).as("bucket"))

  /** Fraction of planted near-dup pairs still sharing a bucket. */
  private def recallAt(planes: Int): Double = {
    val b = bucketed(planes)
    val hits = b.filter(col("vec_id") % 2 === 0)
      .select((col("vec_id") / 2).as("k"), col("bucket").as("ba"))
      .join(b.filter(col("vec_id") % 2 === 1)
        .select(((col("vec_id") - 1) / 2).as("k"), col("bucket").as("bb")),
        Seq("k"))
      .filter(col("ba") === col("bb"))
      .count()
    hits.toDouble / nPairs
  }

  /** Σ cell² — the candidate-pair cost the (label, bucket) self-join
    * actually pays (label omitted: one label is the worst case). */
  private def sumCellSq(planes: Int): Long =
    bucketed(planes).groupBy(col("bucket")).count()
      .agg(sum(col("count") * col("count"))).collect()(0).getLong(0)

  test("corpus-scaled planes hold near-dup recall at 10x the fixture") {
    // rule: planes = ceil(log2(5000 / ~1)) ≈ 12 → 4096 cells
    assert(recallAt(12) >= 0.95,
      "recall collapsed under corpus-scaled plane count")
  }

  test("corpus-scaled planes keep the pair-join cost linear, not quadratic") {
    val fixedCost = sumCellSq(4) // the fixture pin, held while data 10x'd
    val ruledCost = sumCellSq(12)
    // at planes=4 the 16 cells hold ~312 vectors each → Σ cell² ≈ N²/16
    // ≈ 1.6M; at ruled planes cells are O(1) → Σ cell² is O(N). The gap
    // is the quadratic blow-up the rule exists to prevent.
    assert(fixedCost > 50L * ruledCost,
      s"expected a quadratic gap: fixed-plane cost $fixedCost vs ruled $ruledCost")
    // absolute bound: ruled cells stay person-sized — Σ cell² within a
    // small constant of the corpus (pure-linear would be ≈ 2N with every
    // twin pair sharing a 2-cell)
    assert(ruledCost <= 20L * 2 * nPairs,
      s"ruled-plane cells not bounded: sum(cell^2) = $ruledCost")
  }

  test("the prefix-plane property: raising planes never re-buckets the prefix") {
    // a deployment that raises planes with its corpus refines existing
    // cells instead of reshuffling them: bucket@4 = bucket@12 mod 2^4
    val b4 = bucketed(4).withColumnRenamed("bucket", "b4")
    val b12 = bucketed(12).withColumnRenamed("bucket", "b12")
    val mismatches = b4.join(b12, Seq("vec_id"))
      .filter(col("b4") =!= (col("b12") % lit(16L))).count()
    assert(mismatches == 0L, s"$mismatches vectors re-bucketed in the prefix")
  }
}

object SrpScaleSpec {
  val NPairs = 2500 // 5000 vectors = 10x the sf0.01 embeddings table
  private val Dim = 64

  /** Deterministic component in [−1, 1): 6 md5 bytes → uniform long. */
  private def comp(k: Long, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"v$k:$j".getBytes("UTF-8"))
    val bits = (0 until 6).foldLeft(0L)((a, i) => (a << 8) | (h(i) & 0xffL))
    bits.toDouble / (1L << 47) - 1.0
  }

  def pairOf(k: Long): Seq[(Long, Seq[Double])] = {
    val base = Array.tabulate(Dim)(j => comp(k, j))
    val twin = base.clone(); twin(7) += 0.01
    Seq((2 * k, base.toSeq), (2 * k + 1, twin.toSeq))
  }
}
