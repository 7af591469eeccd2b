package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index: the deterministic k-means model written once as
  * two parquet artifacts and searched many times —
  *
  *  - `centroids/`: the k×dim centroid table (tiny; broadcast at query
  *    time),
  *  - `assign/`: vec_id → cell, PARTITIONED BY the cell id.
  *
  * Searching `nprobe` cells filters the assignment scan to those cell
  * values, so partition pruning performs the inverted-list seek: each
  * query reads ~nprobe/k of the assignment data, not all of it. That is
  * the point of IVF at 100 TB — the Lloyd build cost is paid once, while
  * the registry's inline `ann_ivf_topk` (kept for oracle grading)
  * re-derives the model per run. Vectors themselves are NOT copied into
  * the index: the search re-joins the source embedding table by vec_id,
  * so the index stays small and the corpus remains the single source of
  * truth. Everything is deterministic, which is what lets `IvfIndexSpec`
  * assert search-over-index ≡ the inline oracle-graded query.
  *
  * Storage contract (the repo-wide one): `build` leaves the normalized-
  * embeddings cache from the Lloyd loop resident, and `search` caches the
  * constant-size probe-cell table so it is computed once, not twice. Run
  * `graft.core.Release.storage(spark)` between calls when composing
  * outside a Bench/Verify loop — the same rule every registry query
  * documents. */
object IvfIndex {

  /** Build and persist the model under `dir` (overwrites). */
  def build(s: SparkSession, d: String, dir: String, k: Int = 8,
      iters: Int = 2): Unit = {
    val (lists, cdf) = Ann.ivfModel(s, d, k, iters)
    cdf.write.mode("overwrite").parquet(s"$dir/centroids")
    lists.select(col("vec_id"), col("ck"))
      .write.mode("overwrite").partitionBy("ck").parquet(s"$dir/assign")
  }

  /** Out-of-sample assignment: map the vectors of source `d` to the
    * PERSISTED centroids without re-running Lloyd — the incremental path
    * when new corpus lands after the index was built. Exactly the
    * build-time argmax rule ([[Ann.assignCells]]), so re-assigning the
    * original corpus reproduces the stored lists bit-for-bit
    * (`IvfIndexSpec` asserts it); append the result to `assign/` to grow
    * the index, and re-run [[build]] only when drift warrants new
    * centroids. */
  def assign(s: SparkSession, d: String, dir: String): DataFrame = {
    val cdf = s.read.parquet(s"$dir/centroids")
    Ann.assignCells(Ann.normed(s, d), cdf)
  }

  /** Top-5 neighbors for probes 0..4 against the persisted index — the
    * same probe set, tie-breaks, and rounding as `ann_ivf_topk`. */
  def search(s: SparkSession, d: String, dir: String,
      nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"search: need nprobe >= 1; got $nprobe")
    val cdf = s.read.parquet(s"$dir/centroids")
    val n = Ann.normed(s, d)
    val probes = n.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("nsq").as("q_nsq"))
    // cached: the cell table is read twice (the literal collect below and
    // the rerank probe side) and the probes-scan + centroid cross-join +
    // window behind it should run once, not twice
    val cells = Ann.probeCells(probes, cdf, nprobe).cache()
    // constant-size collect (probes × nprobe cell ids): materializing the
    // wanted cells as literals is what lets the assignment scan prune
    // partitions on disk instead of reading every cell
    val wanted = cells.select("ck").distinct().collect().map(_.getInt(0)).toSeq
    val assign = s.read.parquet(s"$dir/assign")
      .where(col("ck").isin(wanted: _*))
    Ann.rerank(n.join(assign, Seq("vec_id")), cells, "ck")
  }
}
