package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.{Tables => T}

/** dedup_prefix_filter's lossless-recall contract: the prefix-filtered
  * join must return EXACTLY the pairs an exhaustive Jaccard ≥ 1/2 join
  * returns — on an adversarial synthetic corpus engineered to straddle
  * the threshold, and on the fixture corpus. The brute force here is an
  * independent driver-side fold over the raw shingle sets (exact integer
  * compare), not another DataFrame plan. */
class PrefixFilterSpec extends SparkSuite {

  /** Exhaustive qualifying pairs from collected (doc, shingle) rows. */
  private def bruteForce(docs: org.apache.spark.sql.DataFrame) = {
    val sets = Dedup.shingles(docs)
      .select(col("doc_id"), col("sh")).distinct()
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(1)).toSet).toMap
    val ids = sets.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = sets(ids(i)); b = sets(ids(j))
      inter = (a & b).size
      if 3 * inter >= a.size + b.size
    } yield (ids(i), ids(j), inter.toLong)).toSet
  }

  private def engine(docs: org.apache.spark.sql.DataFrame) =
    Dedup.prefixFilterPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("synthetic boundary corpus: prefix join == exhaustive join") {
    import spark.implicits._
    // 20 base docs of 20 unique words each; each base gets a mutated twin:
    // one substitution (Jaccard just ABOVE 1/2 — ~11/21) for even k, two
    // spread substitutions (well below — ~6/26) for odd k; the mutation
    // position sweeps the doc so edge effects (fewer covering shingles →
    // higher overlap) are exercised too
    val docs = (0 until 20).flatMap { k =>
      val base = (0 until 20).map(j => s"k${k}w$j")
      val mut =
        if (k % 2 == 0) base.updated(k % 20, s"mut${k}a")
        else base.updated(5, s"mut${k}a").updated(14, s"mut${k}b")
      Seq((2L * k, base.mkString(" "), "en"),
        (2L * k + 1, mut.mkString(" "), "en"))
    }.toDF("doc_id", "text", "lang")
    val want = bruteForce(docs)
    val got = engine(docs)
    assert(want.exists(p => p._1 % 2 == 0 && p._2 == p._1 + 1),
      "fixture bug: no qualifying twin pair — boundary not exercised")
    assert((0 until 20).exists(k =>
        !want.exists(p => p._1 == 2L * k && p._2 == 2L * k + 1)),
      "fixture bug: every twin qualifies — sub-threshold side not exercised")
    assert(got === want)
  }

  test("fixture corpus: prefix join == exhaustive join") {
    val docs = T.documents(spark, sfDir)
    val want = bruteForce(docs)
    val got = engine(docs)
    assert(want.nonEmpty, "fixture produced no qualifying pairs — vacuous")
    assert(got === want)
  }
}
