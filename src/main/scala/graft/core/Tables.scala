package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loaders + oracle-determinism helpers.
  *
  * All fixture tables (TESTDATA.md) are parquet; money/ratio doubles are
  * cast to fixed-precision decimals at scan time so aggregation is exact
  * and hash-stable vs the DuckDB oracle (SURVEY.md §7.4). Decimal scales
  * are chosen so products/sums stay inside DECIMAL(38,_) in BOTH engines
  * (DuckDB errors out past width 38 on multiply; Spark silently loses
  * precision) — see SURVEY.md §2B design rules.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** THE exact-dup fingerprint: md5 over whitespace-normalized, lowered
    * text. One definition for every consumer (batch q30/canonical,
    * streaming ingest dedup, incremental ingest, curation verdict) —
    * oracle mirror is `md5(lower(trim(regexp_replace(text, '\s+', ' ',
    * 'g'))))`; a drifting copy would silently desync dedup decisions. */
  def textFingerprint(c: Column): Column =
    md5(lower(trim(regexp_replace(c, "\\s+", " "))))

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** events.parquet's `ts` encoding is the driver's choice and has already
    * changed once between fixture generations (TIMESTAMP(NANOS) → µs), so
    * this loader is schema-ADAPTIVE: it scans the footer schema and
    * normalizes whatever it finds to a micros TimestampType. The reference
    * stream source is likewise schema-on-read every tick
    * (reference scripts/custom-metrics.sh:10-11 — jq never assumes a field
    * encoding). Handled encodings:
    *   - TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so the
    *     legacy nanosAsLong conf surfaces it as LongType; ns div 1000 is
    *     lossless (fixture timestamps are µs-aligned) and matches DuckDB's
    *     TIMESTAMP_NS→TIMESTAMP semantics.
    *   - timestamp[us] without tz → Spark reads TIMESTAMP_NTZ; cast to
    *     TimestampType under the UTC session (all entrypoints pin
    *     spark.sql.session.timeZone=UTC) yields instants identical to
    *     DuckDB's read of the same file.
    *   - timestamp[us] with tz → already TimestampType; pass through.
    * Anything else fails loudly — a silent mis-decode would poison 20+
    * downstream operators.
    *
    * SIDE EFFECT, deliberate: the nanosAsLong conf stays set on the
    * session — it must hold at SCAN time (lazy evaluation), so restoring
    * it after this call would break the returned DataFrame. It only
    * affects nanos-unit columns; every other encoding reads identically
    * with it on, so the blast radius inside this engine is zero. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    val ts = raw.schema("ts").dataType match {
      case LongType         => timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType => col("ts").cast(TimestampType)
      case TimestampType    => col("ts")
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other; expected nanos-as-long, " +
        "TIMESTAMP_NTZ, or TIMESTAMP — fixture schema drifted again?")
    }
    raw.withColumn("ts", ts)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Money-sized double → DECIMAL(12,4). Values < 1e8; scale 4 is ≥ 2
    * digits beyond the generated data's 2-decimal precision, so the
    * rounding mode of the cast can never be exercised at a tie. */
  def dec(c: Column): Column = c.cast(DecimalType(12, 4))

  /** Ratio-sized double (discount/tax ∈ [0,1]) → DECIMAL(6,4); small
    * width keeps decimal products ≤ 38 digits in DuckDB. */
  def decr(c: Column): Column = c.cast(DecimalType(6, 4))

  /** Exact deterministic mean: decimal sum (exact, order-independent)
    * cast to double (well-defined nearest), divided by the count (IEEE
    * division — bit-identical in any engine). Mirrors the SQL
    * `CAST(SUM(CAST(x AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*)`. */
  def avgExact(c: Column): Column =
    sum(dec(c)).cast(DoubleType) / count(lit(1))

  /** Unscaled-long view of a non-negative exactly-2-decimal double at
    * scale log10(pow): (x·pow + 0.5)::long — three codegen-primitive
    * ops per row where the decimal cast paid a Double.toString +
    * BigDecimal parse. Identical integer under the same data contract
    * the decimal casts rely on (values non-negative and exactly
    * 2-decimal, so the +0.5 floor IS HALF_UP and a tie is never
    * exercised). */
  def unscaled(c: Column, pow: Int): Column =
    (c * pow + lit(0.5d)).cast(LongType)

  /** Exact double of an unscaled-long SUM back at scale log10(pow):
    * one exact decimal division (the quotient's true scale is below
    * the result scale, so nothing rounds) then ONE correctly-rounded
    * cast — bit-identical to casting the exact decimal sum, valid past
    * 2^53 where a double division of the raw long would double-round.
    * Runs once per GROUP, never per row. */
  def unscaledToDouble(c: Column, pow: Int): Column =
    (c.cast(DecimalType(20, 0)) / lit(pow).cast(DecimalType(10, 0)))
      .cast(DoubleType)
}
