package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Merge

/** Streaming CDC apply: fold a stream of change rows (op ∈ U/I/D) into a
  * parquet table via `foreachBatch` + the batch [[Merge.applyChanges]]
  * core — the continuously-maintained twin of the oracle-graded
  * `q47_merge_upsert`.
  *
  * Exactly-once without a transactional table format: each micro-batch
  * writes a FULL new snapshot under `dir/v=<batchId>` and then flips a
  * pointer file by atomic rename. A replayed batch (restart after a crash
  * between write and flip) simply overwrites `v=<batchId>` and flips to
  * the same version — idempotent by construction, the classic
  * snapshot-plus-pointer pattern a lakehouse format internalizes.
  *
  * Scale notes: the merge itself is the broadcast-anti shape (base never
  * shuffles when the per-batch change set is small — the CDC regime); the
  * full-snapshot rewrite is the honest cost of exactly-once on plain
  * parquet and is how this demo stays self-contained — at real scale the
  * same foreachBatch body would target a format with row-level commits.
  */
object StreamMerge {

  private def pointerPath(dir: String) = Paths.get(dir, "_latest")

  /** Current table version, if any batch has committed. */
  def latestVersion(dir: String): Option[Long] = {
    val p = pointerPath(dir)
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** The committed table as of the last flipped pointer (empty base
    * semantics before the first commit are the caller's: see applyBatch). */
  def currentTable(spark: SparkSession, dir: String): Option[DataFrame] =
    latestVersion(dir).map(v => spark.read.parquet(s"$dir/v=$v"))

  /** One micro-batch: merge `changes` into the committed snapshot and
    * flip the pointer. Safe to replay with the same batchId. */
  def applyBatch(spark: SparkSession, dir: String, changes: DataFrame,
      key: String, batchId: Long): Unit = {
    // replay AFTER the pointer flip: the batch is already in the table —
    // merging it again would also read v=<batchId> while overwriting the
    // same path (Spark rejects self-overwrites). Committed = done.
    if (latestVersion(dir).exists(_ >= batchId)) return
    val base = currentTable(spark, dir)
      .getOrElse(changes.drop("op").limit(0))
    val merged = Merge.applyChanges(base, changes, key).drop("src")
    merged.write.mode("overwrite").parquet(s"$dir/v=$batchId")
    // pointer flip via temp-file + ATOMIC_MOVE: readers see either the
    // old version or the new one, never a torn pointer
    val tmp = Paths.get(dir, s"_latest.tmp.$batchId")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(tmp, batchId.toString)
    Files.move(tmp, pointerPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The streaming query: a change stream with an `op` column → a
    * continuously merged parquet table at `dir`. */
  def start(changes: DataFrame, key: String, dir: String,
      checkpoint: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // deletes of never-seen keys and multi-row batches are fine: the
        // merge core treats the batch as one change set
        applyBatch(batch.sparkSession, dir, batch, key, id)
      }
      .start()

  /** Convenience for specs: committed rows keyed for comparison. */
  def snapshot(spark: SparkSession, dir: String, key: String): Map[Long, Seq[Any]] =
    currentTable(spark, dir) match {
      case None => Map.empty
      case Some(df) =>
        df.collect().map { r =>
          r.getLong(r.fieldIndex(key)) -> r.toSeq
        }.toMap
    }
}
