package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** SCALING.md ceiling #1, proven instead of asserted: the MinHash band
  * space (`modulus`) must scale with corpus size. The hot-band df cap is
  * a skew guard — but once docs approach the modulus, EVERY band value
  * is shared by ~docs/modulus documents, the cap trims the entire
  * candidate set, and recall collapses silently. The deployment rule on
  * [[Dedup.minhashSigOf]]: keep expected band df = docs/modulus well
  * under the cap (a prime ≥ ~100 × corpus doc count).
  *
  * Corpus here: 10× the sf0.01 fixture's doc count (5000 docs vs 500),
  * built as 2500 known near-duplicate pairs (40 words, one word swapped
  * → 5-shingle Jaccard ≈ 0.86, per-pair catch probability
  * 1-(1-J)^8 ≈ 1 under 8 bands of size 1). Deterministic by index — no
  * RNG, so the grade never flakes. */
class MinhashScaleSpec extends SparkSuite {
  import spark.implicits._

  private val nPairs = 2500 // 5000 docs = 10x the sf0.01 documents table

  /** doc 2k and 2k+1 share 39 of 40 words (position 20 swapped); word
    * vocabulary is pair-private so cross-pair shingle collisions are
    * impossible by construction. */
  private lazy val corpus = spark.range(0, nPairs.toLong)
    .flatMap { k =>
      val base = (0 until 40).map(j => s"p${k}w$j")
      val twin = base.updated(20, s"p${k}X")
      Seq((2 * k, base.mkString(" ")), (2 * k + 1, twin.mkString(" ")))
    }
    .toDF("doc_id", "text")
    .repartition(32)

  private def recallAt(modulus: Long): Double = {
    val pairs = Dedup.minhashPairsOf(corpus, bands = 8, modulus = modulus,
        maxBandDf = Dedup.GradedMaxBandDf)
      .filter(col("doc_b") === col("doc_a") + 1 &&
        (col("doc_a") % 2) === 0)
      .count()
    pairs.toDouble / nPairs
  }

  test("corpus-scaled modulus holds recall at 10x the fixture's doc count") {
    // 1000003 ≈ 200x the corpus: expected band df ≈ 0.005, the cap only
    // ever trims true skew — near-dup recall stays ≈ 1
    assert(recallAt(1000003L) >= 0.95,
      "recall collapsed under a corpus-scaled band space")
  }

  test("a saturated band space destroys recall: the modulus must scale") {
    // modulus 101 ≪ corpus: each band's MIN concentrates on the handful
    // of smallest residues (min of ~36 draws from 0..100), those values
    // go hot far past the df cap, and the cap deletes the bulk of the
    // candidate set instead of trimming skew. Recall craters — the
    // failure the scaling rule exists to prevent. (Measured: already at
    // modulus 1009 ≈ corpus/5 recall has dropped to ~0.75 from the
    // hot-smallest-residue effect; 101 makes the collapse decisive.)
    assert(recallAt(101L) < 0.5,
      "saturated band space unexpectedly held recall — re-check the rule")
  }
}
