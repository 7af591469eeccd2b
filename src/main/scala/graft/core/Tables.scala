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
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as long (legacy conf), then convert to a
    * micros TimestampType via integer division — the fixture's timestamps
    * are µs-aligned (verified: all ns%1000==0), so this is lossless and
    * matches DuckDB's TIMESTAMP_NS→TIMESTAMP semantics.
    *
    * SIDE EFFECT, deliberate: the conf stays set on the session — it must
    * hold at SCAN time (lazy evaluation), so restoring it after this call
    * would break the returned DataFrame. Any later read of a DIFFERENT
    * nanos-timestamp parquet in the same session will also see LongType
    * instead of the reader error; no other fixture table has nanos
    * columns, so inside this engine the blast radius is zero. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events").withColumn("ts",
      timestamp_micros(expr("ts div 1000")))
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
}
