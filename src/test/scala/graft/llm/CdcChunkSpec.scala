package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** dedup_cdc_chunks' reason to exist: content-defined boundaries
  * RE-SYNCHRONIZE after an insertion, fixed-width boundaries never do.
  * One prepended word must leave most CDC chunk fingerprints shared
  * between original and edited doc, while the same edit leaves the
  * fixed-width chunking with (near-)zero shared fingerprints. */
class CdcChunkSpec extends SparkSuite {
  import spark.implicits._

  // long deterministic word stream; varied enough that ~1/16 of word
  // hashes hit the boundary condition
  private val baseWords = (0 until 400).map(i => s"tok${i * 7919 % 997}")

  private def fps(docs: org.apache.spark.sql.DataFrame): Map[Long, Set[String]] =
    Dedup.cdcChunks(docs).select(col("doc_id"), col("fp")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap

  test("one prepended word: CDC chunks re-sync, fixed-width chunks do not") {
    val docs = Seq(
      (1L, baseWords.mkString(" "), "en"),
      (2L, ("inserted" +: baseWords).mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")

    val cdc = fps(docs)
    val shared = cdc(1L) & cdc(2L)
    assert(cdc(1L).size > 10, s"only ${cdc(1L).size} chunks — stream too short")
    // all but the first chunk (the one the edit lands in) must match
    assert(shared.size >= cdc(1L).size - 2,
      s"CDC failed to re-sync: ${shared.size} of ${cdc(1L).size} shared")

    // the fixed-width strawman on the same corpus: every boundary shifts
    val fixed = docs
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("pos", "word")))
      .withColumn("cid", expr("CAST(pos AS BIGINT) div 16"))
      .groupBy(col("doc_id"), col("cid"))
      .agg(md5(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("word")))),
        x => x.getField("word")))).as("fp"))
      .select(col("doc_id"), col("fp")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    val fixedShared = fixed(1L) & fixed(2L)
    assert(fixedShared.size <= 1,
      s"fixed-width unexpectedly robust: ${fixedShared.size} shared")
  }

  test("identical docs share every chunk; disjoint docs share none") {
    val other = (0 until 400).map(i => s"alt${i * 104729 % 1009}")
    val docs = Seq(
      (1L, baseWords.mkString(" "), "en"),
      (2L, baseWords.mkString(" "), "en"),
      (3L, other.mkString(" "), "en")).toDF("doc_id", "text", "lang")
    val m = fps(docs)
    assert(m(1L) == m(2L))
    assert((m(1L) & m(3L)).isEmpty)
  }
}
