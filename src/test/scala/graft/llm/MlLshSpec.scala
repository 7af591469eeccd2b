package graft.llm

import graft.{SparkEntry, SparkSuite}

/** Spark ML MinHashLSH (seeded) must re-find the fixture's planted
  * near-duplicates that exact shingle-Jaccard identifies, and be
  * deterministic across runs (SURVEY.md capability matrix row). */
class MlLshSpec extends SparkSuite {

  private def registryPairs(): Set[(Long, Long)] =
    SparkEntry.queries("dedup_minhash_ml")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

  test("raw candidates find the exact-Jaccard near-dup pairs (j >= 0.5)") {
    val exact = SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir)
      .collect()
      .filter(_.getAs[Double]("jaccard") >= 0.5)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val ml = MlLsh.minhashLshPairs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val missed = exact -- ml
    assert(missed.isEmpty, s"ML LSH missed planted near-dups: $missed")
  }

  test("registry query equals the exact j>=0.8 set with consistent dists") {
    val rows = SparkEntry.queries("dedup_minhash_ml")(spark, sfDir).collect()
    assert(rows.nonEmpty, "no >=0.8 near-dup pairs at this SF")
    assert(rows.forall(_.getAs[Boolean]("ml_dist_ok")),
      "ML distance drifted >0.1 from exact capped Jaccard")
    val exact08 = Dedup.jaccardPairs(spark, sfDir).collect()
      .filter(_.getAs[Double]("jaccard") >= 0.8)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(registryPairs() == exact08)
  }

  test("deterministic across runs (fixed seed)") {
    assert(registryPairs() == registryPairs())
  }
}
