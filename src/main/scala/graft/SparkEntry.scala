package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.QueryDef
import graft.lake.{CowQueries, LakeQueries}
import graft.operators.{Analytics, EventAnalytics, Extras, Functions, Merge, MetricBatch, Mining, Profiling, Relational}
import graft.llm.{Ann, BpeTrain, Dedup, EmbPca, EmbStats, GraphOps, MlLsh, Multimodal, Pipeline, Sketches, Subword, TextStats}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Ordered registry of every declared engine query (SURVEY.md §2B). */
  def registry: Seq[(String, QueryDef)] =
    Relational.defs ++ Functions.defs ++ Analytics.defs ++ Extras.defs ++
      Merge.defs ++ EventAnalytics.defs ++ MetricBatch.defs ++ Mining.defs ++ Profiling.defs ++
      Dedup.defs ++ GraphOps.defs ++ EmbStats.defs ++ TextStats.defs ++ Pipeline.defs ++ Ann.defs ++ MlLsh.defs ++
      Sketches.defs ++ BpeTrain.defs ++ EmbPca.defs ++ Subword.defs ++
      LakeQueries.defs ++ CowQueries.defs ++ Seq(
        // batched binary decode (stubbed codec); scalar projection with a
        // DuckDB replay of the stub arithmetic (ASCII payloads)
        "multimodal_decode" -> QueryDef((s, d) => Multimodal.decodedDigest(s, d),
          Some(Multimodal.decodedDigestSql)),
        // REAL codec paths: honest 24bpp-BMP / 8-bit-PCM-WAV parses of
        // generated real bytes; oracle re-parses the same bytes in SQL
        "multimodal_bmp" -> QueryDef((s, d) => Multimodal.bmpDecode(s, d),
          Some(Multimodal.bmpDecodeSql)),
        "multimodal_bmp_resize" -> QueryDef((s, d) => Multimodal.bmpResize(s, d),
          Some(Multimodal.bmpResizeSql)),
        "multimodal_bmp_hist" -> QueryDef((s, d) => Multimodal.bmpHist(s, d),
          Some(Multimodal.bmpHistSql)),
        "multimodal_bmp_edges" -> QueryDef((s, d) => Multimodal.bmpEdges(s, d),
          Some(Multimodal.bmpEdgesSql)),
        "multimodal_wav" -> QueryDef((s, d) => Multimodal.wavDecode(s, d),
          Some(Multimodal.wavDecodeSql)),
        "multimodal_wav_energy" -> QueryDef((s, d) => Multimodal.wavEnergy(s, d),
          Some(Multimodal.wavEnergySql)),
        "multimodal_wav_silence" -> QueryDef((s, d) => Multimodal.wavSilence(s, d),
          Some(Multimodal.wavSilenceSql)),
        "multimodal_y4m_frames" -> QueryDef((s, d) => Multimodal.y4mFrames(s, d),
          Some(Multimodal.y4mFramesSql)),
        "multimodal_y4m_scenes" -> QueryDef((s, d) => Multimodal.y4mScenes(s, d),
          Some(Multimodal.y4mScenesSql)),
        // image near-dup dedup: 8x8 aHash signatures over the real BMP
        // decode, then banded-Hamming pairs (the image simhash)
        "multimodal_phash" -> QueryDef((s, d) => Multimodal.phash(s, d),
          Some(Multimodal.phashSql)),
        "multimodal_phash_pairs" -> QueryDef((s, d) => Multimodal.phashPairs(s, d),
          Some(Multimodal.phashPairsSql)),
        "multimodal_phash_groups" -> QueryDef((s, d) => Multimodal.phashGroups(s, d),
          Some(Multimodal.phashGroupsSql)))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped aggregation (SURVEY.md §2B Q04). */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_groupagg_tpch1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) => name -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, QueryDef(_, Some(sql))) => name -> sql }.toMap
}
