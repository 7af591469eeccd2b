package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2 micro-batch streaming source (SURVEY.md §7.3's
  * stretch goal, replacing the reference's cron+curl poll loop,
  * /root/reference/scripts/setup-custom-metrics.sh:24): replays a JSONL
  * file of `{"ts": <epochSec>, "payload": "<json>"}` records as a
  * rate-limited stream — `maxRowsPerBatch` rows per micro-batch.
  *
  * Demonstrates the full `TableProvider → SupportsRead(MICRO_BATCH_READ) →
  * MicroBatchStream → InputPartition → PartitionReader` stack; offsets are
  * plain row indices, so the source is replayable/checkpointable (the
  * engine re-reads any [start, end) slice on recovery).
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft.sources.ReplaySource")
  *   .option("path", file).option("maxRowsPerBatch", "10").load()
  * }}}
  */
class ReplaySource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplaySource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties) // DSv2 contract
    new ReplayTable(opts.get("path"),
      Option(opts.get("maxRowsPerBatch")).map(_.toInt).getOrElse(10))
  }
}

object ReplaySource {
  val schema: StructType = StructType(Seq(
    StructField("ts", TimestampType), StructField("payload", StringType)))

  /** (epochSec, payload) parsed from one JSONL line — driver side, tiny.
    * The ts key is matched outside escaped-quote context so a payload
    * containing `\"ts\":` cannot shadow the real field. */
  private val tsRe = """(?<!\\)"ts"\s*:\s*(\d+)""".r

  /** Format contract, asserted not assumed: `payload` must be the LAST
    * key on the line (the replay-fixture writer's layout) — the extractor
    * takes everything after its colon, so a trailing key would be
    * swallowed into the payload and silently nulled by the downstream
    * from_json. A general JSON producer needs a real parser here; the
    * loud check keeps the modeling shortcut honest. */
  private[sources] def parseLine(line: String): (Long, String) = {
    val ts = tsRe.findFirstMatchIn(line)
      .getOrElse(throw new IllegalArgumentException(
        s"replay line missing numeric ts: ${line.take(80)}"))
      .group(1).toLong
    val pKey = line.indexOf("\"payload\"")
    require(pKey >= 0, s"replay line missing payload: ${line.take(80)}")
    val pColon = line.indexOf(':', pKey)
    val raw = line.substring(pColon + 1).trim.stripSuffix("}").trim
    require(payloadIsLast(raw),
      s"replay line has keys after payload (payload must be last): ${line.take(80)}")
    // unescaping applies to the quoted-string form only; a raw JSON-object
    // payload passes through verbatim (its inner escapes belong to the
    // downstream from_json)
    val unquoted = if (raw.startsWith("\""))
      raw.stripPrefix("\"").stripSuffix("\"")
        .replace("\\\"", "\"").replace("\\\\", "\\")
    else raw
    (ts, unquoted)
  }

  /** Index of the first unescaped quote at/after `from` — one preceded by
    * an EVEN number of backslashes (a single-char lookbehind would let
    * `abc\\"` slip through: that quote follows the second char of an
    * escaped backslash, yet it IS a real closing quote). -1 if none. */
  private def unescapedQuote(s: String, from: Int): Int = {
    var i = from
    while (i < s.length) {
      if (s(i) == '"') {
        var b = i - 1
        while (b >= 0 && s(b) == '\\') b -= 1
        if ((i - 1 - b) % 2 == 0) return i
      }
      i += 1
    }
    -1
  }

  /** The swallowed-trailing-key failure mode: a well-formed payload is
    * either a quoted string or a JSON object, and in both forms the value
    * must extend to the line's closing brace — a value that closes earlier
    * (`..."}, "other": 1`) means keys follow the payload. Scanned, not
    * regex-matched: a quoted `\", \"x\":` inside either form is payload
    * content, not a trailing key. */
  private[sources] def payloadIsLast(raw: String): Boolean = raw.headOption match {
    case Some('"') => unescapedQuote(raw, 1) == raw.length - 1
    case Some('{') =>
      var depth = 0
      var i = 0
      while (i < raw.length) {
        raw(i) match {
          case '"' =>
            val close = unescapedQuote(raw, i + 1)
            if (close < 0) return false // unterminated string literal
            i = close
          case '{' => depth += 1
          case '}' =>
            depth -= 1
            if (depth == 0) return i == raw.length - 1
          case _ =>
        }
        i += 1
      }
      false // unbalanced braces: the payload never closes
    case _ => false // contract: payload is a quoted string or a JSON object
  }

  private[sources] def readAll(path: String): IndexedSeq[(Long, String)] =
    scala.io.Source.fromFile(path).getLines()
      .filter(_.trim.nonEmpty).map(parseLine).toIndexedSeq
}

private class ReplayTable(path: String, maxRowsPerBatch: Int)
  extends Table with SupportsRead {
  override def name(): String = s"replay($path)"
  override def schema(): StructType = ReplaySource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = ReplaySource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ReplayMicroBatchStream(path, maxRowsPerBatch)
    }
}

private case class ReplayOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

private class ReplayMicroBatchStream(path: String, maxRowsPerBatch: Int)
  extends MicroBatchStream with SupportsTriggerAvailableNow {
  private lazy val rows = ReplaySource.readAll(path)
  private var availableNowTarget: Option[Long] = None

  override def initialOffset(): Offset = ReplayOffset(0L)

  // Admission control: the engine asks how far it MAY read from `start`
  // this batch — the rate limit lives here, so every trigger mode
  // (ProcessingTime, AvailableNow, Once) sees the same batching.
  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(maxRowsPerBatch)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ReplayOffset].index
    val hardEnd = availableNowTarget.getOrElse(rows.length.toLong)
    ReplayOffset(math.min(hardEnd, s + maxRowsPerBatch))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(rows.length.toLong)

  override def reportLatestOffset(): Offset = ReplayOffset(rows.length.toLong)

  override def deserializeOffset(json: String): Offset =
    ReplayOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ReplayOffset].index
    val e = end.asInstanceOf[ReplayOffset].index
    if (e <= s) Array.empty
    else Array(ReplayPartition(path, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[ReplayPartition]
      new PartitionReader[InternalRow] {
        private val slice = ReplaySource.readAll(p.path)
          .slice(p.start.toInt, p.end.toInt).iterator
        private var current: (Long, String) = _
        override def next(): Boolean =
          if (slice.hasNext) { current = slice.next(); true } else false
        override def get(): InternalRow =
          InternalRow(current._1 * 1000000L, UTF8String.fromString(current._2))
        override def close(): Unit = ()
      }
    }
}

private case class ReplayPartition(path: String, start: Long, end: Long)
  extends InputPartition
