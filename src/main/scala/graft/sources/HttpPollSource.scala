package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** One poll of the metric endpoint: `poll()` returns the next
  * observation `(epochSec, payloadJson)`, or None when nothing new is
  * available this tick. Implementations are driver-side only — fetched
  * rows travel to executors inside the input partitions, so a transport
  * never needs to be serializable. */
trait MetricTransport extends AutoCloseable {
  def poll(): Option[(Long, String)]

  /** Restart hook: `n` observations were already committed by a previous
    * incarnation of this stream — a seekable transport (a recorded
    * capture) skips them so they are not re-served under new offsets. A
    * live feed cannot seek and ignores this (its fresh observations ARE
    * new data; the fast-forward just renumbers them correctly). */
  def seek(n: Long): Unit = {}
  override def close(): Unit = {}
}

/** Default transport: replays a recorded JSONL capture (the offline
  * stand-in for the live endpoint — same file format as [[ReplaySource]]).
  * Returns None once the capture is exhausted. */
final class ReplayTransport(path: String) extends MetricTransport {
  private val rows = ReplaySource.readAll(path)
  private var i = 0
  override def poll(): Option[(Long, String)] = synchronized {
    if (i >= rows.length) None
    else { val r = rows(i); i += 1; Some(r) }
  }
  /** The capture is seekable: a checkpointed restart resumes AFTER the
    * committed prefix instead of silently re-serving it under new
    * offsets (exactly-once across restarts as long as the capture file
    * only ever grows). A capture SHORTER than the committed offset
    * breaks that contract — the file was replaced or truncated — and
    * clamping would re-serve its tail under fresh offsets, the exact
    * silent duplication seek exists to prevent; fail loudly instead. */
  override def seek(n: Long): Unit = synchronized {
    if (n > rows.length) throw new IllegalStateException(
      s"replay transport: cannot seek to committed offset $n — the capture " +
        s"at $path holds only ${rows.length} observations; it was replaced " +
        "or truncated since the checkpoint was written. Restore the " +
        "original capture or start a fresh checkpoint")
    i = n.toInt
  }
}

/** Live transport: GET the metrics JSON from `url` (the reference polls
  * the YARN ResourceManager's `/ws/v1/cluster/metrics`,
  * /root/reference/scripts/custom-metrics.sh:7). The observation
  * timestamp is the poll time, exactly like the reference's `date`-based
  * tick. Non-200 responses fail loudly — a silent None would look like
  * "no new data" and mask a dead endpoint. */
final class HttpTransport(url: String, timeoutMs: Long = 10000L,
    clock: () => Long = () => System.currentTimeMillis() / 1000L)
  extends MetricTransport {
  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs)).build()
  override def poll(): Option[(Long, String)] = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200) throw new IllegalStateException(
      s"metric endpoint $url returned HTTP ${resp.statusCode()}")
    Some((clock(), resp.body()))
  }
}

/** DataSourceV2 micro-batch source that POLLS a [[MetricTransport]] once
  * per trigger — the Structured-Streaming-native form of the reference's
  * `cron + curl` loop (/root/reference/scripts/setup-custom-metrics.sh:24:
  * every 30 s; pair this source with a 30 s ProcessingTime trigger).
  *
  * Options: `transport` = `replay` (default; needs `path`) | `http`
  * (needs `url`, optional `timeoutMs`).
  *
  * Offsets count observations. Fetched rows are buffered on the driver
  * and shipped inside the input partitions; the buffer is trimmed at
  * every commit, so driver memory holds only the uncommitted tail. Like
  * Spark's own socket source, live observations are NOT replayable after
  * the buffer is gone: a recovery that reaches past the retained tail
  * fails loudly instead of silently re-polling different data — replay
  * the recorded capture (the `replay` transport) for exact reruns. A
  * checkpointed RESTART of a replay-transport query seeks the capture to
  * the committed offset first, so nothing is re-served (exactly-once as
  * long as the capture file only grows); a live-transport restart simply
  * renumbers fresh observations from the committed offset.
  */
class HttpPollSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplaySource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new HttpPollTable(() => HttpPollSource.transportFor(opts))
  }
}

object HttpPollSource {
  private[sources] def transportFor(opts: CaseInsensitiveStringMap): MetricTransport =
    opts.getOrDefault("transport", "replay") match {
      case "replay" =>
        val path = opts.get("path")
        require(path != null, "transport=replay needs option 'path'")
        new ReplayTransport(path)
      case "http" =>
        val url = opts.get("url")
        require(url != null, "transport=http needs option 'url'")
        new HttpTransport(url, opts.getLong("timeoutMs", 10000L))
      case other => throw new IllegalArgumentException(
        s"unknown transport '$other' (expected replay | http)")
    }
}

private class HttpPollTable(mk: () => MetricTransport)
  extends Table with SupportsRead {
  override def name(): String = "http_poll"
  override def schema(): StructType = ReplaySource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = ReplaySource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new HttpPollMicroBatchStream(mk())
    }
}

private case class PollOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

private class HttpPollMicroBatchStream(transport: MetricTransport)
  extends MicroBatchStream with SupportsAdmissionControl {
  // uncommitted tail of the stream: buf(i) is observation (base + i)
  private val buf = ArrayBuffer.empty[(Long, String)]
  private var base = 0L

  override def initialOffset(): Offset = PollOffset(0L)

  // SupportsAdmissionControl is load-bearing for restarts, not rate
  // limiting: for a plain MicroBatchStream the engine polls latestOffset()
  // BEFORE it ever hands us a checkpointed offset, so a fresh observation
  // would be numbered from base=0 and collide with committed indices. This
  // overload receives the restored start offset FIRST — the only hook
  // where a restart fast-forward can run ahead of the first poll.
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = synchronized {
    val s = start.asInstanceOf[PollOffset].index
    // clean restart: nothing polled yet, so adopt the committed index as
    // the new base and let fresh observations continue the numbering.
    // A seekable transport (recorded capture) additionally skips the
    // committed prefix so already-delivered observations are not
    // re-served as new offsets; a live transport ignores the seek.
    // Once polls exist the base is pinned — an uncommitted-batch replay
    // then fails loudly in planInputPartitions.
    if (buf.isEmpty && s > base) { base = s; transport.seek(s) }
    transport.poll().foreach(buf += _) // one poll per trigger, cron-style
    PollOffset(base + buf.length)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def deserializeOffset(json: String): Offset = PollOffset(json.toLong)

  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[PollOffset].index
    if (e > base) {
      // planInputPartitions bounds every served batch to the retained
      // tail, so a commit past it can only be the fast-forwarded restart
      // case (buf empty); the drop below then drops nothing fresh
      buf.dropInPlace(math.min(e - base, buf.length.toLong).toInt)
      base = e
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[PollOffset].index,
      end.asInstanceOf[PollOffset].index)
    if (e <= s) return Array.empty
    synchronized {
      // both bounds checked: s < base is a replay below the trimmed tail,
      // e past the buffer is a restart asking for observations this
      // process never polled — serving an empty slice for either would
      // silently commit data loss
      if (s < base || e > base + buf.length) throw new IllegalStateException(
        s"http_poll: recovery asked for observations [$s,$e) but this " +
          s"process retains only [$base,${base + buf.length}) — live polls " +
          "are not replayable; rerun from a recorded capture " +
          "(transport=replay) for exact recovery")
      val rows = buf.slice((s - base).toInt, (e - base).toInt).toArray
      Array(PollPartition(rows))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val it = partition.asInstanceOf[PollPartition].rows.iterator
      new PartitionReader[InternalRow] {
        private var current: (Long, String) = _
        override def next(): Boolean =
          if (it.hasNext) { current = it.next(); true } else false
        override def get(): InternalRow =
          InternalRow(current._1 * 1000000L, UTF8String.fromString(current._2))
        override def close(): Unit = ()
      }
    }

  override def stop(): Unit = transport.close()
}

private case class PollPartition(rows: Array[(Long, String)])
  extends InputPartition
