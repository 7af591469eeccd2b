package graft.core

import org.apache.spark.sql.SparkSession

/** Storage cleanup between registry queries.
  *
  * Several pipelines pin executor storage for the life of a query:
  * `.cache()` on self-joined intermediates (Dedup.jaccardPairs,
  * Dedup.simhashPairs, Ann.ivfTopk) and `localCheckpoint()` on iterated
  * edges/labels (Dedup.dedupClusters, GraphOps.pageRank).
  * `spark.catalog.clearCache()` drops only the Dataset caches the
  * CacheManager knows about — localCheckpoint blocks live as persisted
  * RDDs outside it and stay pinned until the ContextCleaner happens to GC
  * the RDD reference. In a long-lived session running many queries
  * (Bench's 97-query loop, or a user composing pipelines) that leak
  * accumulates into GC pressure that can inflate later queries by an
  * order of magnitude.
  *
  * [[storage]] is the one-call fix: callers that materialize a registry
  * query should invoke it once the action completes.
  */
object Release {
  /** Drop every persisted block the last query left behind: Dataset
    * caches AND localCheckpoint RDDs (which `clearCache()` misses). */
  def storage(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }
}
