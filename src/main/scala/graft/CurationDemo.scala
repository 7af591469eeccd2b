package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a user of the
  * engine actually runs, wired from the same oracle-graded operators the
  * registry exposes one-by-one.
  *
  *   1. FILTER   — `curate_gopher_rules` keep set (published rule battery)
  *   2. DEDUP    — `dedup_canonical` survivor per exact-duplicate group
  *   3. SELECT   — `sample_importance` top slice (DSIR domain fit)
  *   4. SPLIT    — `sample_hash_split` 90/5/5, a pure function of doc_id
  *   5. PACK     — per-split greedy sequence packing: deterministic
  *                 salted-hash order, running token prefix, bin = prefix
  *                 div seqLen (the two-phase `pack_sequences` shape on
  *                 the curated subset)
  *
  * Every stage is a narrow join on doc_id against an already-graded
  * relation, so the demo inherits each operator's scale story: the only
  * NEW shuffles here are the doc_id equi-joins (AQE-sized; at 100 TB the
  * keep-lists are small fractions of the corpus and broadcast) and the
  * per-split packing window (one exchange on the 3-value split key — at
  * real scale pack per (split, shard) exactly as pack_sequences
  * documents).
  */
object CurationDemo {

  final case class Result(selected: DataFrame, nDocs: Long, nGopherKept: Long,
      nSurvivors: Long, nSelected: Long)

  def run(spark: SparkSession, sfDir: String, seqLen: Long = 512L): Result = {
    val nDocs = graft.core.Tables.documents(spark, sfDir).count()
    val kept = SparkEntry.queries("curate_gopher_rules")(spark, sfDir)
      .filter(col("keep")).select(col("doc_id"), col("n_words"))
    val survivors = SparkEntry.queries("dedup_canonical")(spark, sfDir)
      .select(col("keep_doc").as("doc_id"), col("fp"))
    val scored = SparkEntry.queries("sample_importance")(spark, sfDir)
      .select(col("doc_id"), col("logw"))
    val splits = SparkEntry.queries("sample_hash_split")(spark, sfDir)
      .select(col("doc_id"), col("split"))
    val sel = kept.join(survivors, "doc_id")
      .join(scored, "doc_id")
      .join(splits, "doc_id")
    // stage-5 packing: salted-hash order (decoupled from every upstream
    // ordering), exclusive token prefix → fixed-capacity bin ids
    val packOrder =
      conv(substring(md5(concat(lit("pack:"), col("doc_id").cast("string"))),
        1, 12), 16, 10).cast("long")
    val w = Window.partitionBy(col("split"))
      .orderBy(packOrder, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = sel
      .withColumn("cum_tokens", sum(col("n_words")).over(w))
      .withColumn("bin",
        expr(s"(cum_tokens - n_words) div $seqLen").cast("long"))
      .select(col("doc_id"), col("fp"), col("logw"), col("split"),
        col("n_words"), col("cum_tokens"), col("bin"))
    Result(packed, nDocs, kept.count(), survivors.count(), packed.count())
  }
}
