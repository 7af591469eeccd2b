package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md extension list): image/audio/video
  * payloads are opaque `binary` columns with typed metadata; decode /
  * feature-extract / frame-sample run partition-batched so a real codec
  * would amortize per-batch model/library setup — the Scala analogue of a
  * batched pandas UDF.
  *
  * The codec itself is STUBBED (this container has no image/audio
  * libraries): `decodeStub` is a deterministic fake that "parses" a
  * 4-byte width/height header. Everything around it — schema, encoders,
  * partition batching, feature shape — is real and tested.
  */
object Multimodal {

  /** An opaque media payload with typed metadata. */
  final case class MediaRow(doc_id: Long, media: Array[Byte], format: String)

  final case class Decoded(
      doc_id: Long, format: String, width: Int, height: Int,
      n_frames: Int, features: Array[Double])

  /** STUB decode — deterministic fake in place of a real codec.
    * "Header": bytes 0-1 → width, bytes 2-3 → height (big-endian),
    * frame count from payload length. A real implementation would call
    * the codec here and nothing else changes. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    def u(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else 0
    val w = (u(0) << 8 | u(1)) % 1920 + 1
    val h = (u(2) << 8 | u(3)) % 1080 + 1
    val frames = bytes.length % 24 + 1
    (w, h, frames)
  }

  /** STUB feature extraction: 16-bin byte histogram, L1-normalized —
    * stands in for an embedding/feature model, with the real batch shape. */
  def byteHistogram(bytes: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    bytes.foreach(b => bins((b & 0xff) / 16) += 1.0)
    val n = math.max(bytes.length, 1).toDouble
    bins.map(_ / n)
  }

  /** Frame-sample: every k-th 16-byte "frame" of the payload. */
  def frameSample(bytes: Array[Byte], every: Int): Array[Array[Byte]] =
    bytes.grouped(16).zipWithIndex
      .collect { case (frame, i) if i % every == 0 => frame }
      .toArray

  /** STUB resize: nearest-neighbor downsample of the payload treated as a
    * row-major byte "image" — deterministic index arithmetic in place of a
    * real scaler; output is always targetW*targetH bytes. */
  def resizeStub(bytes: Array[Byte], srcW: Int, srcH: Int,
      targetW: Int, targetH: Int): Array[Byte] = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val out = new Array[Byte](targetW * targetH)
    var y = 0
    while (y < targetH) {
      val sy = y.toLong * srcH / targetH
      var x = 0
      while (x < targetW) {
        val sx = x.toLong * srcW / targetW
        val idx = sy * srcW + sx
        out(y * targetW + x) =
          if (idx < bytes.length) bytes(idx.toInt) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  /** Partition-batched decode: one pass per partition, codec setup
    * amortized per batch (the `mapInPandas` batch shape). */
  def decode(ds: Dataset[MediaRow]): Dataset[Decoded] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      // real codecs would initialize here, once per partition-batch
      rows.map { r =>
        val (w, h, f) = decodeStub(r.media)
        Decoded(r.doc_id, r.format, w, h, f, byteHistogram(r.media))
      }
    }
  }

  /** Documents' text bytes as stand-in media payloads. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"),
        col("text").cast(org.apache.spark.sql.types.BinaryType).as("media"),
        lit("fake/raw").as("format"))
      .as[MediaRow]
  }

  /** End-to-end: payloads → batched decode → typed metadata + features. */
  def decodedTable(spark: SparkSession, dir: String): DataFrame =
    decode(mediaFromDocuments(spark, dir))
      .toDF()
      .withColumn("feat_sum",
        aggregate(col("features"), lit(0.0), (a, x) => a + x))
      .orderBy(col("doc_id"))

  /** Registry-facing projection of [[decodedTable]]: scalar columns only —
    * the driver's result hasher can't canonicalize array columns — and
    * every column oracle-expressible. The stub decode is integer
    * arithmetic on payload bytes, and the generated documents are pure
    * ASCII at every scale factor (byte i == codepoint of char i+1), so
    * DuckDB replays width/height/frames from `ascii(substring(...))` and
    * the histogram's support size from distinct `codepoint/16` bins —
    * keeping the mapPartitions decode AND byteHistogram load-bearing in
    * the hash compare instead of rows-only. */
  def decodedDigest(spark: SparkSession, dir: String): DataFrame =
    decode(mediaFromDocuments(spark, dir))
      .toDF()
      .select(col("doc_id"), col("format"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames").cast("long").as("n_frames"),
        size(filter(col("features"), x => x > 0.0)).cast("long")
          .as("feat_nonzero"))
      .orderBy(col("doc_id"))

  /** DuckDB replay of [[decodedDigest]] (see its ASCII-payload note). */
  val decodedDigestSql: String =
    """SELECT doc_id, 'fake/raw' AS format,
      |  CAST((ascii(substring(text,1,1))*256 + ascii(substring(text,2,1)))
      |       % 1920 + 1 AS BIGINT) AS width,
      |  CAST((ascii(substring(text,3,1))*256 + ascii(substring(text,4,1)))
      |       % 1080 + 1 AS BIGINT) AS height,
      |  CAST(length(text) % 24 + 1 AS BIGINT) AS n_frames,
      |  CAST(CASE WHEN length(text) = 0 THEN 0
      |       ELSE len(list_distinct(list_transform(string_split(text, ''),
      |            c -> ascii(c)//16))) END AS BIGINT) AS feat_nonzero
      |FROM documents ORDER BY doc_id""".stripMargin
}
