package graft.llm

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryGroup, Tables => T}

/** Spark ML MinHashLSH near-dup path (SURVEY.md capability matrix): the
  * library alternative to the hand-rolled md5 MinHash in [[Dedup]].
  * Deterministic under a fixed seed (hash coefficients) + HashingTF
  * (murmur3, stateless) — golden-testable, though not DuckDB-expressible
  * (rows-only for the oracle).
  *
  * Scale shape: approxSimilarityJoin only pairs rows that collide in a
  * hash band — the same bounded-candidates property as Dedup.minhashPairs,
  * delegated to the ML implementation.
  */
object MlLsh extends QueryGroup {

  def minhashLshPairs(s: SparkSession, d: String,
      maxJaccardDist: Double = 0.7): DataFrame = {
    val docsSh = Dedup.shingles(T.documents(s, d))
      .groupBy(col("doc_id")).agg(collect_set(col("sh")).as("shs"))
    val tf = new HashingTF()
      .setInputCol("shs").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(docsSh).filter(size(col("shs")) > 0)
    val mh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    val model = mh.fit(feat)
    model.approxSimilarityJoin(feat, feat, maxJaccardDist, "jaccard_dist")
      .select(
        col("datasetA.doc_id").as("doc_a"),
        col("datasetB.doc_id").as("doc_b"),
        round(col("jaccard_dist"), 4).as("jaccard_dist"))
      .filter(col("doc_a") < col("doc_b"))
      .orderBy(col("jaccard_dist"), col("doc_a"), col("doc_b"))
  }

  override val defs: Seq[(String, QueryDef)] = Seq(
    "dedup_minhash_ml" -> QueryDef((s, d) => minhashLshPairs(s, d)))
}
