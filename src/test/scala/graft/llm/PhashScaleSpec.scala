package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** SCALING.md's phash band-space rule, proven instead of asserted (the
  * MinhashScaleSpec treatment for image dedup): `multimodal_phash_pairs`
  * blocks on exact band values, so the per-band value space (2^bandBits)
  * must scale with the image count — once images approach
  * cap × 2^bandBits, every band value goes hot, the hot-band cap deletes
  * the whole candidate set, and recall collapses silently. The
  * deployment rule on [[Multimodal.phashPairsOf]]: bandBits ≥
  * log2(100 × images).
  *
  * Corpus: 10× the phash fixture's image count (1500 signatures vs 150),
  * built as 750 known near-duplicate pairs — twin = base signature with
  * 3 bits flipped (within the Hamming-12 grading radius; 3 flips < 4
  * bands guarantees a clean shared 16-bit band by pigeonhole). Signatures
  * are md5-derived — no RNG, the grade never flakes. Works on the
  * signature table directly: the banding under test is downstream of the
  * BMP decode, which has its own specs. */
class PhashScaleSpec extends SparkSuite {
  import spark.implicits._

  private val nPairs = PhashScaleSpec.NPairs

  private lazy val sigs: DataFrame = spark.range(0L, nPairs.toLong)
    // static fn: the suite itself must not ship with the closure
    .flatMap((k: java.lang.Long) => PhashScaleSpec.pairOf(k.longValue))
    .toDF("doc_id", "b0", "b1", "b2", "b3")
    .repartition(32)

  private def recallAt(bandBits: Int): Double = {
    val found = Multimodal.phashPairsOf(sigs, bandBits,
        cap = 50L, hammingMax = 12L)
      .filter(col("doc_b") === col("doc_a") + 1 && col("doc_a") % 2 === 0)
      .count()
    found.toDouble / nPairs
  }

  test("corpus-scaled band width holds recall at 10x the fixture") {
    // 16-bit bands over 1500 images: E[band df] = 1500/65536 ≈ 0.023 —
    // the cap only ever trims true skew, and 3 flips < 4 bands
    // guarantees a clean shared band: recall is exactly 1
    assert(recallAt(16) >= 0.95,
      "recall collapsed under a corpus-scaled band space")
  }

  test("a saturated band space destroys recall: the band width must scale") {
    // 4-bit bands: 16 values per band, E[df] = 1500/16 ≈ 94 > the 50
    // cap — every value goes hot, the cap deletes the candidate set
    // instead of taming skew, and recall craters. The same failure mode
    // MinhashScaleSpec pins for the minhash modulus.
    assert(recallAt(4) < 0.5,
      "saturated band space unexpectedly held recall — re-check the rule")
  }
}

object PhashScaleSpec {
  val NPairs = 750 // 1500 signatures = 10x the 150-image phash fixture

  /** Deterministic 64-bit signature from md5; twin = 3 planted flips
    * (bits 5, 23, 41 — three DIFFERENT 16-bit bands, the worst case for
    * pigeonhole blocking: only one clean band remains). */
  def pairOf(k: Long): Seq[(Long, Long, Long, Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"img$k".getBytes("UTF-8"))
    val sig = (0 until 8).foldLeft(0L)((a, i) => (a << 8) | (h(i) & 0xffL))
    val twin = sig ^ (1L << 5) ^ (1L << 23) ^ (1L << 41)
    def words(s: Long, id: Long) =
      (id, s & 0xffffL, (s >>> 16) & 0xffffL, (s >>> 32) & 0xffffL,
        (s >>> 48) & 0xffffL)
    Seq(words(sig, 2 * k), words(twin, 2 * k + 1))
  }
}
