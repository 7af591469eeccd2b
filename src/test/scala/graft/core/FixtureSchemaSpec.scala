package graft.core

import org.apache.spark.sql.types._

import graft.SparkSuite

/** Fixture-drift canary (round-8 task 5 from the round-7 verdict).
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed an encoding once (events.ts: TIMESTAMP(NANOS) → timestamp[us],
  * which silently broke 23 queries in round 7). This suite pins the
  * name+type contract of every fixture table AS SPARK READS IT, and fails
  * with a per-column diff when the environment shifts — turning the next
  * silent regeneration into a one-line red with the drift spelled out.
  *
  * `ts`/date-like columns are pinned to a SET of accepted encodings (the
  * ones `Tables.events` adapts between); everything else is exact.
  */
class FixtureSchemaSpec extends SparkSuite {

  /** Accepted types per column. Single-element = exact contract;
    * multi-element = the loader is schema-adaptive across these. */
  private val tsEncodings: Set[DataType] =
    Set(LongType, TimestampNTZType, TimestampType)
  private def exact(t: DataType): Set[DataType] = Set(t)

  private val expected: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> exact(IntegerType), "r_name" -> exact(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> exact(IntegerType), "n_name" -> exact(StringType),
      "n_regionkey" -> exact(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> exact(LongType), "c_name" -> exact(StringType),
      "c_nationkey" -> exact(IntegerType), "c_acctbal" -> exact(DoubleType),
      "c_mktsegment" -> exact(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> exact(LongType), "s_name" -> exact(StringType),
      "s_nationkey" -> exact(IntegerType), "s_acctbal" -> exact(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> exact(LongType), "p_name" -> exact(StringType),
      "p_brand" -> exact(StringType), "p_type" -> exact(StringType),
      "p_size" -> exact(IntegerType), "p_retailprice" -> exact(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> exact(LongType), "o_custkey" -> exact(LongType),
      "o_orderstatus" -> exact(StringType),
      "o_totalprice" -> exact(DoubleType),
      // date-like: the generator has emitted µs timestamps; a date32 or
      // string regen would also be survivable but flag it for review
      "o_orderdate" -> tsEncodings,
      "o_orderpriority" -> exact(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> exact(LongType), "l_partkey" -> exact(LongType),
      "l_suppkey" -> exact(LongType), "l_linenumber" -> exact(IntegerType),
      "l_quantity" -> exact(DoubleType),
      "l_extendedprice" -> exact(DoubleType),
      "l_discount" -> exact(DoubleType), "l_tax" -> exact(DoubleType),
      "l_returnflag" -> exact(StringType),
      "l_linestatus" -> exact(StringType),
      "l_shipdate" -> tsEncodings),
    "events" -> Seq(
      "event_id" -> exact(LongType),
      "ts" -> tsEncodings, // Tables.events adapts across exactly these
      "user_id" -> exact(LongType), "event_type" -> exact(StringType),
      "value" -> exact(DoubleType), "props" -> exact(StringType)),
    "documents" -> Seq(
      "doc_id" -> exact(LongType), "text" -> exact(StringType),
      "lang" -> exact(StringType), "source" -> exact(StringType),
      "n_chars" -> exact(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> exact(LongType),
      "embedding" -> exact(ArrayType(FloatType, containsNull = true)),
      "label" -> exact(IntegerType))
  )

  private def diffTable(name: String, dir: String): Seq[String] = {
    // same conf Tables.events sets: a future nanos regen must read as
    // long here exactly as the loader would see it
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val actual = spark.read.parquet(s"$dir/$name.parquet").schema
    val exp = expected(name)
    val actualMap = actual.fields.map(f => f.name -> f.dataType).toMap
    val expNames = exp.map(_._1)
    val missing = expNames.filterNot(actualMap.contains)
      .map(c => s"$name.$c: MISSING (expected one of ${expected(name).toMap.apply(c).mkString("/")})")
    val extra = actual.fieldNames.filterNot(expNames.contains)
      .map(c => s"$name.$c: UNEXPECTED new column (${actualMap(c)})")
    val mismatched = exp.collect {
      case (c, ok) if actualMap.contains(c) && !ok.contains(actualMap(c)) =>
        s"$name.$c: got ${actualMap(c).simpleString}, accepted " +
          ok.map(_.simpleString).mkString("{", ", ", "}")
    }
    missing ++ extra ++ mismatched
  }

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"fixture schemas at $sf match the engine's contract") {
      val dir = s"/root/testdata/$sf"
      assume(new java.io.File(dir).isDirectory, s"$dir absent on this host")
      val drift = expected.keys.toSeq.sorted.flatMap(diffTable(_, dir))
      assert(drift.isEmpty,
        "FIXTURE DRIFT — the driver regenerated /root/testdata with a " +
        "new schema; adapt the graft.core.Tables loader(s):\n  " +
        drift.mkString("\n  "))
    }
  }
}
