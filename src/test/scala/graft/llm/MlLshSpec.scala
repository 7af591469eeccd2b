package graft.llm

import graft.{SparkEntry, SparkSuite}

/** Spark ML MinHashLSH (seeded) must re-find the fixture's planted
  * near-duplicates that exact shingle-Jaccard identifies, and be
  * deterministic across runs (SURVEY.md capability matrix row). */
class MlLshSpec extends SparkSuite {

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

  test("finds the exact-Jaccard near-dup pairs (jaccard >= 0.5)") {
    val exact = SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir)
      .collect()
      .filter(_.getAs[Double]("jaccard") >= 0.5)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val ml = pairs("dedup_minhash_ml")
    val missed = exact -- ml
    assert(missed.isEmpty, s"ML LSH missed planted near-dups: $missed")
  }

  test("deterministic across runs (fixed seed)") {
    assert(pairs("dedup_minhash_ml") == pairs("dedup_minhash_ml"))
  }
}
