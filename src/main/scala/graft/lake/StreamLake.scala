package graft.lake

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.streaming.CommitFiles

/** Streaming lakehouse ingest: an orders stream continuously grows the
  * z-ordered, manifest-carrying layout that [[ZLayout]] builds in batch —
  * the lake family's ingestion path, the way `StreamIvf` twins the batch
  * `IvfIndex` and `StreamMerge` twins `q47_merge_upsert`.
  *
  * Layout — append-only batches: `batch=<id>/fid=<f>/…` data files plus
  * `_manifest/batch=<id>/` stats rows (fid, n, ck/dy min/max), with
  * `_latest` naming the highest committed batch. Batch-first nesting is
  * what makes replay idempotent: a replayed batch OVERWRITES its own
  * `batch=<id>` root and `_manifest/batch=<id>` wholesale and re-flips
  * the same pointer; a replay after the flip short-circuits on the
  * pointer; a crash between write and flip leaves an uncommitted batch
  * dir every reader ignores (reads filter `batch <= _latest`) and the
  * replay overwrites. The checkpoint-lineage brand turns a
  * wiped-checkpoint restart into a loud failure (the StreamMerge rule).
  * An EMPTY batch still flips the pointer (the StreamIvf zero-norm
  * lesson): `partitionBy` writes no dirs for an empty frame, and readers
  * tolerate the gap by reading only what exists.
  *
  * Pruning gets FINER than the batch layout's, for free: manifest rows
  * are per (batch, fid), so a range predicate prunes at (batch, fid)
  * granularity — a fid whose extents only overlapped the predicate in
  * one ingest batch scans one batch's file, not every batch's. Compacting
  * batches back to the one-dir-per-fid form is [[ZLayout.write]] over
  * [[scanAll]] with a `CommitFiles.swapDir` (the q59 compaction shape);
  * not run inline here.
  *
  * Scale notes: per batch the work is one narrow projection + one hash
  * exchange on fid + a fid-count-bounded stats aggregate — no reads of
  * prior batches, no global state; the manifest stays one row per
  * (batch, fid), metadata-scale. */
object StreamLake {

  private def pointerPath(dir: String) = Paths.get(dir, "_latest")
  private def brandPath(dir: String) = Paths.get(dir, "_checkpoint")

  /** Highest committed batch, if any. */
  def latestVersion(dir: String): Option[Long] =
    CommitFiles.readPointer(pointerPath(dir))

  /** `batch=` children of `root` committed per `tableDir`'s pointer. */
  private def committedDirs(tableDir: String, root: String): Seq[String] =
    latestVersion(tableDir).toSeq.flatMap { v =>
      Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
        .collect { case f if f.isDirectory && f.getName.startsWith("batch=") &&
          f.getName.stripPrefix("batch=").toLong <= v => f.getPath }
        .sorted.toSeq
    }

  /** Ingest one micro-batch of orders rows. Safe to replay with the same
    * batchId. */
  def applyBatch(spark: SparkSession, dir: String, orders: DataFrame,
      batchId: Long, checkpoint: Option[String] = None): Unit = {
    checkpoint.map(CommitFiles.lineageId).foreach { ck =>
      CommitFiles.claimOrAssert(brandPath(dir), ck, "stream_lake")
    }
    if (latestVersion(dir).exists(_ >= batchId)) return
    val laid = ZLayout.ordersProjection(orders).persist()
    try {
      if (!laid.isEmpty) {
        laid.repartition(col("fid"))
          .sortWithinPartitions(col("fid"), col("zkey"))
          .write.mode("overwrite").partitionBy("fid")
          .parquet(s"$dir/batch=$batchId")
        laid.groupBy(col("fid"))
          .agg(count(lit(1)).as("n"),
            min(col("ck")).as("ck_min"), max(col("ck")).as("ck_max"),
            min(col("dy")).as("dy_min"), max(col("dy")).as("dy_max"))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/_manifest/batch=$batchId")
      }
      // empty batch: no dirs, but the pointer still advances — otherwise
      // the batch replays in full on every restart
      CommitFiles.atomicWrite(pointerPath(dir), batchId.toString)
    } finally laid.unpersist()
  }

  private val manifestSchema = StructType(Seq(
    StructField("fid", LongType), StructField("n", LongType),
    StructField("ck_min", LongType), StructField("ck_max", LongType),
    StructField("dy_min", LongType), StructField("dy_max", LongType),
    StructField("batch", LongType)))

  private val scanSchema = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("ck", LongType), StructField("dy", LongType),
    StructField("zkey", LongType), StructField("fid", LongType),
    StructField("batch", LongType)))

  private def emptyOf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Committed manifest rows, one per (batch, fid). Empty-but-committed
    * layouts (every batch was empty) read as an empty relation. */
  def manifest(spark: SparkSession, dir: String): DataFrame = {
    val dirs = committedDirs(dir, s"$dir/_manifest")
    if (dirs.isEmpty) emptyOf(spark, manifestSchema)
    else spark.read.option("basePath", s"$dir/_manifest").parquet(dirs: _*)
  }

  /** Every committed row (all batches), with batch/fid partition cols. */
  def scanAll(spark: SparkSession, dir: String): DataFrame = {
    require(latestVersion(dir).isDefined,
      s"stream_lake: nothing committed under $dir")
    val dirs = committedDirs(dir, dir)
    if (dirs.isEmpty) emptyOf(spark, scanSchema) // every batch was empty
    else spark.read.option("basePath", dir).parquet(dirs: _*)
  }

  /** Manifest-pruned scan at (batch, fid) granularity + the exact row
    * filter — same contract as [[ZLayout.prunedOrders]]. */
  def prunedOrders(spark: SparkSession, dir: String,
      ckLo: Long, ckHi: Long, dyLo: Long, dyHi: Long): DataFrame = {
    val sel = manifest(spark, dir)
      .filter(col("ck_max") >= ckLo && col("ck_min") <= ckHi &&
        col("dy_max") >= dyLo && col("dy_min") <= dyHi)
      // batch is a DISCOVERED partition column (int-inferred from the
      // dir names); cast both keys so the collect is type-stable
      .select(col("batch").cast("long"), col("fid").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val scan =
      if (sel.isEmpty) scanAll(spark, dir).limit(0)
      else spark.read.option("basePath", dir)
        .parquet(sel.map { case (b, f) => s"$dir/batch=$b/fid=$f" }: _*)
    scan.filter(col("ck").between(ckLo, ckHi) &&
      col("dy").between(dyLo, dyHi))
  }

  /** The streaming query: an orders stream → a continuously grown
    * pruned-scannable layout at `dir`. */
  def start(orders: DataFrame, dir: String, checkpoint: String): StreamingQuery =
    orders.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch.sparkSession, dir, batch, id, Some(checkpoint))
      }
      .start()
}

/** Deterministic 3-batch streamed ingest of orders (the SnapshotFixture
  * date cutoffs as batch boundaries), for the oracle-graded registry
  * query: a green row proves the streaming ingest + manifest + pruning
  * chain end-to-end against raw orders. */
object StreamLakeFixture extends graft.core.DerivedFixture("lake_stream", "orders") {
  override protected def build(s: SparkSession, dir: String, target: String): Unit = {
    val orders = graft.core.Tables.orders(s, dir)
    def ts(c: String) = lit(c).cast("timestamp")
    StreamLake.applyBatch(s, target,
      orders.filter(col("o_orderdate") < ts(SnapshotFixture.Cut0)), 0L)
    StreamLake.applyBatch(s, target,
      orders.filter(col("o_orderdate") >= ts(SnapshotFixture.Cut0) &&
        col("o_orderdate") < ts(SnapshotFixture.Cut1)), 1L)
    StreamLake.applyBatch(s, target,
      orders.filter(col("o_orderdate") >= ts(SnapshotFixture.Cut1)), 2L)
  }
}
