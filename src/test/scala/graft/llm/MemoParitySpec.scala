package graft.llm

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** The round-14 derived-relation memos claim VALUE IDENTITY with the
  * direct pipelines they replaced (doubles and decimals round-trip
  * parquet exactly; the hash/agg derivations are deterministic). This
  * suite pins that claim, so a future edit to a direct pipeline that
  * forgets the memo's layoutTag bump — or any parquet round-trip
  * surprise — fails here instead of in the driver's oracle gate.
  * sf0.001 keeps each comparison sub-second. */
class MemoParitySpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  /** Order-free multiset equality via sorted canonical rows. */
  private def assertSameRows(memo: DataFrame, direct: DataFrame): Unit = {
    val m = memo.collect().map(_.toString).sorted
    val x = direct.collect().map(_.toString).sorted
    assert(m.length == x.length,
      s"row counts differ: memo ${m.length} vs direct ${x.length}")
    assert(m.sameElements(x), {
      val diff = m.zip(x).find { case (a, b) => a != b }
      s"first differing row: $diff"
    })
  }

  test("ShingleHashMemo equals the inline shingle+h48 pipeline") {
    import org.apache.spark.sql.functions.col
    assertSameRows(
      Dedup.ShingleHashMemo.table(spark, d),
      Dedup.shingles(graft.core.Tables.documents(spark, d))
        .select(col("doc_id"), col("pos"), Dedup.h48(col("sh")).as("shh")))
  }

  test("DecontamMemo equals decontaminateDirect") {
    assertSameRows(
      Pipeline.DecontamMemo.table(spark, d),
      Pipeline.decontaminateDirect(spark, d))
  }

  test("ivfModel memo equals ivfModelDirect (lists and centroids)") {
    val (lists, cdf) = Ann.ivfModel(spark, d, k = 4, iters = 2)
    val (listsD, cdfD) = Ann.ivfModelDirect(spark, d, k = 4, iters = 2)
    assertSameRows(lists, listsD)
    assertSameRows(cdf, cdfD)
  }

  test("pqModel memo equals pqModelDirect (codes, codebook, grid)") {
    val (codes, cdf, dsub, nsub) = Ann.pqModel(spark, d, m = 4, ksub = 4,
      iters = 1)
    val (codesD, cdfD, dsubD, nsubD) = Ann.pqModelDirect(spark, d, m = 4,
      ksub = 4, iters = 1)
    assert(dsub == dsubD && nsub == nsubD,
      s"grid differs: ($dsub,$nsub) vs ($dsubD,$nsubD)")
    assertSameRows(codes, codesD)
    assertSameRows(cdf, cdfD)
  }

  test("bm25 score memo equals bm25ScoresDirect (exact decimals)") {
    assertSameRows(
      TextStats.bm25Scores(spark, d),
      TextStats.bm25ScoresDirect(spark, d))
  }

  test("DupCoverMemo equals its direct covered-positions derivation") {
    assertSameRows(
      Dedup.DupCoverMemo.positions(spark, d),
      Dedup.DupCoverMemo.positionsDirect(spark, d))
  }

  test("VerdictMemo equals curateVerdictDirect") {
    assertSameRows(
      Pipeline.VerdictMemo.table(spark, d),
      Pipeline.curateVerdictDirect(spark, d))
  }

  test("PhashPairsFixture equals the direct banded-Hamming derivation") {
    assertSameRows(
      spark.read.parquet(Multimodal.PhashPairsFixture.ensure(spark)),
      Multimodal.phashPairsDirect(spark))
  }

  test("unigram PieceScoresMemo equals the direct substring aggregation") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val wf = Dedup.words(graft.core.Tables.documents(spark, d))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    assertSameRows(
      Subword.PieceScoresMemo.table(spark, d),
      Subword.pieceScores(wf))
  }

  test("unigram Seg0Memo equals the direct broadcast-map DP") {
    assertSameRows(
      Subword.Seg0Memo.table(spark, d),
      Subword.seg0Direct(spark, d))
  }

  test("BPE MergesMemo equals the direct Sennrich loop") {
    assert(BpeTrain.MergesMemo.merges(spark, d) ==
      BpeTrain.learnDirect(spark, d))
  }

  test("EventsIndexMemo equals the direct two-phase indexing") {
    assertSameRows(
      graft.operators.MetricBatch.EventsIndexMemo.table(spark, d),
      graft.operators.MetricBatch.indexedEventsDirect(spark, d))
  }

  test("MinhashSigMemo equals the direct graded signature derivation") {
    assertSameRows(
      Dedup.MinhashSigMemo.table(spark, d),
      Dedup.minhashSigOf(graft.core.Tables.documents(spark, d),
        Dedup.GradedBands, Dedup.GradedModulus))
  }

  test("ClusterLabelsMemo equals the direct ccLabels fixed point") {
    assertSameRows(
      Dedup.ClusterLabelsMemo.labels(spark, d),
      Dedup.clusterLabelsDirect(spark, d))
  }

  test("JaccardPairsMemo equals jaccardPairsDirect") {
    assertSameRows(
      Dedup.JaccardPairsMemo.table(spark, d),
      Dedup.jaccardPairsDirect(spark, d))
  }

  test("KnnGraphMemo equals knnGraphDirect") {
    assertSameRows(
      Ann.KnnGraphMemo.edges(spark, d),
      Ann.knnGraphDirect(spark, d))
  }

  test("BigramCountsMemo equals its direct lead()-window derivation") {
    assertSameRows(
      TextStats.BigramCountsMemo.table(spark, d),
      TextStats.BigramCountsMemo.tableDirect(spark, d))
  }

  test("pcaModel memo equals pcaModelDirect (mean, v1, v2, scalars)") {
    val (mean, v1, v2, scalars) = EmbPca.pcaModel(spark, d)
    val (meanD, v1D, v2D, scalarsD) = EmbPca.pcaModelDirect(spark, d)
    assertSameRows(mean, meanD)
    assertSameRows(v1, v1D)
    assertSameRows(v2, v2D)
    assertSameRows(scalars, scalarsD)
  }

  test("MlLsh pairs memo equals minhashLshPairsDirect (registry 0.4)") {
    assertSameRows(
      MlLsh.minhashLshPairs(spark, d, maxJaccardDist = 0.4),
      MlLsh.minhashLshPairsDirect(spark, d, maxJaccardDist = 0.4))
  }

  test("TermFreqsMemo equals the inline termFreqs corpus derivation") {
    assertSameRows(
      TextStats.TermFreqsMemo.table(spark, d),
      TextStats.termFreqs(graft.core.Tables.documents(spark, d)))
  }

  test("Bm25ModelMemo equals bm25ModelDirect (dl, stats, df, qidf)") {
    val (dl, st, df, qidf) = TextStats.Bm25ModelMemo.parts(spark, d)
    val (dlD, stD, dfD, qidfD) = TextStats.bm25ModelDirect(spark, d)
    assertSameRows(dl, dlD)
    assertSameRows(st, stD)
    assertSameRows(df, dfD)
    assertSameRows(qidf, qidfD)
  }

  test("Bm25TopRanksMemo equals the direct rank window over the scores") {
    assertSameRows(
      TextStats.Bm25TopRanksMemo.table(spark, d),
      TextStats.topRanksDirect(spark, d))
  }

  test("LiftedPairsMemo equals liftedPairsDirect") {
    assertSameRows(
      graft.operators.Mining.LiftedPairsMemo.table(spark, d),
      graft.operators.Mining.liftedPairsDirect(spark, d))
  }
}
