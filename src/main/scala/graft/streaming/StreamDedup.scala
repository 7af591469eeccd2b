package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One incoming document on the ingest stream. */
case class DocEvent(ts: Timestamp, docId: Long, text: String)

/** Streaming exact deduplication — the ingest-time guard in front of the
  * batch dedup family (llm/Dedup.scala): drop copies of a document as they
  * arrive instead of paying for them downstream.
  *
  * State is the crux at 100 TB/day: keying raw text would hold the corpus
  * in the state store, so the key is the same md5 content fingerprint the
  * batch q30 pipeline groups on (normalized whitespace, lowercased), and
  * `dropDuplicatesWithinWatermark` bounds retention — a fingerprint's
  * state is dropped once the watermark passes it, so state size tracks
  * the dedup horizon (watermark delay × arrival rate), not corpus size.
  * The trade is explicit: a copy arriving after the horizon re-emits,
  * which the downstream batch dedup (exact groups over the lake) catches.
  */
object StreamDedup {

  /** Same normalization as the batch fingerprint (Dedup q30): collapse
    * whitespace, trim, lowercase, md5. */
  def fingerprinted(docs: DataFrame): DataFrame =
    docs.withColumn("fp",
      graft.core.Tables.textFingerprint(col("text")))

  /** One surviving copy per fingerprint within the watermark horizon
    * (across batches the earlier batch wins; within a micro-batch the
    * survivor is arbitrary, as with batch dropDuplicates). Output keeps
    * the original columns plus the fingerprint. */
  def dedupStream(docs: Dataset[DocEvent], delay: String = "10 minutes"): DataFrame =
    fingerprinted(docs.toDF())
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("fp")
}
