package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, QueryGroup, Tables => T}

/** Scalar-function surface of the inventory (SURVEY.md §2B Q20–Q27): string,
  * date/time, math, conditional/null, array (incl. higher-order), map, JSON
  * and generator expressions — all codegen'd built-ins, no UDFs.
  *
  * Oracle-parity notes (empirically pinned against DuckDB 1.0):
  *  - DuckDB `regexp_replace` needs the 'g' flag to match Spark's
  *    replace-all semantics.
  *  - Spark's `dayofweek` is 1=Sunday; DuckDB's is 0=Sunday → `+1`.
  *  - Transcendental results (ln/log10) are rounded through DECIMAL(18,6):
  *    a 1-ulp libm divergence cannot cross a rounding boundary at that
  *    scale for the fixture's value range.
  *  - Int-ish outputs are cast BIGINT on both sides (Spark's length/instr
  *    return INT, DuckDB's return BIGINT).
  */
object Functions extends QueryGroup {
  import T.{dec, avgExact}

  // ---- Q20: string functions over part (R10/R11 semantics incl.) -------
  private def q20(s: SparkSession, d: String): DataFrame =
    T.part(s, d).select(
      col("p_partkey"),
      upper(col("p_name")).as("up"),
      lower(col("p_brand")).as("lo"),
      trim(concat(lit(" "), col("p_name"), lit(" "))).as("tr"),
      substring(col("p_name"), 1, 5).as("sub"),
      length(col("p_name")).cast(LongType).as("len"),
      concat_ws("-", col("p_brand"), col("p_type")).as("cw"),
      // split + take-nth-from-end — the reference's ruby split('"')[-2]
      // idiom (/root/reference/scripts/custom-metrics.sh:8)
      try_element_at(split(col("p_name"), " "), lit(-2)).as("m2"),
      regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1).as("rex"),
      // regex trim-last-letter — the reference's sed AZ→region idiom
      // (/root/reference/scripts/setup-custom-metrics.sh:14)
      regexp_replace(col("p_type"), "[A-Z]$", "").as("rtrim"),
      regexp_replace(col("p_name"), "[aeiou]", "*").as("rrep"),
      col("p_name").like("%re%").as("lk"),
      lpad(col("p_brand"), 10, "0").as("lp"),
      expr("replace(p_name, 'small', 'tiny')").as("rep"),
      instr(col("p_name"), "ring").cast(LongType).as("ins"))
      .orderBy(col("p_partkey"))

  private val q20Sql =
    """SELECT p_partkey,
      |  upper(p_name) AS up, lower(p_brand) AS lo,
      |  trim(concat(' ', p_name, ' ')) AS tr,
      |  substring(p_name, 1, 5) AS sub,
      |  CAST(length(p_name) AS BIGINT) AS len,
      |  concat_ws('-', p_brand, p_type) AS cw,
      |  string_split(p_name, ' ')[-2] AS m2,
      |  regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS rex,
      |  regexp_replace(p_type, '[A-Z]$', '') AS rtrim,
      |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS rrep,
      |  (p_name LIKE '%re%') AS lk,
      |  lpad(p_brand, 10, '0') AS lp,
      |  replace(p_name, 'small', 'tiny') AS rep,
      |  CAST(strpos(p_name, 'ring') AS BIGINT) AS ins
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---- Q21: date/time functions over orders -----------------------------
  private def q21(s: SparkSession, d: String): DataFrame =
    T.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast(LongType).as("yr"),
      month(col("o_orderdate")).cast(LongType).as("mo"),
      dayofmonth(col("o_orderdate")).cast(LongType).as("dom"),
      dayofweek(col("o_orderdate")).cast(LongType).as("dow"),
      date_trunc("month", col("o_orderdate")).as("mstart"),
      date_add(col("o_orderdate"), 30).as("dadd"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast(TimestampType))
        .cast(LongType).as("ddiff"),
      to_date(col("o_orderdate")).as("td"),
      unix_timestamp(col("o_orderdate")).as("uts"),
      date_format(col("o_orderdate"), "yyyy-MM").as("fmt"))
      .orderBy(col("o_orderkey"))

  private val q21Sql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  CAST(month(o_orderdate) AS BIGINT) AS mo,
      |  CAST(day(o_orderdate) AS BIGINT) AS dom,
      |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mstart,
      |  CAST(o_orderdate AS DATE) + 30 AS dadd,
      |  CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS ddiff,
      |  CAST(o_orderdate AS DATE) AS td,
      |  CAST(epoch_ms(o_orderdate)//1000 AS BIGINT) AS uts,
      |  strftime(o_orderdate, '%Y-%m') AS fmt
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---- Q21b: grouped counts by month (date_trunc rollup) ----------------
  private def q21b(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("mstart"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast(DoubleType).as("sum_price"))
      .orderBy(col("mstart"))

  private val q21bSql =
    """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mstart, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1 ORDER BY mstart""".stripMargin

  // ---- Q22: math functions over part ------------------------------------
  // R9 emulation (bc-style truncating division) is exercised separately by
  // the BcDiv expression spec; here the oracle-checked surface is the exact
  // math ops plus scale-controlled transcendentals.
  private def q22(s: SparkSession, d: String): DataFrame =
    T.part(s, d).select(
      col("p_partkey"),
      col("p_retailprice").cast(DecimalType(12, 2)).cast(DoubleType).as("rnd"),
      floor(col("p_retailprice")).cast(LongType).as("flr"),
      ceil(col("p_retailprice")).cast(LongType).as("cl"),
      abs(col("p_retailprice") - 950.0).as("ab"),
      (col("p_size") % 7).cast(LongType).as("md"),
      pow(col("p_size"), 2).as("pw"),
      sqrt(col("p_size").cast(DoubleType)).as("sq"),
      // round through DECIMAL(18,6) to absorb the libm 1-ulp tail, then
      // export as double (decimal→double is identical in both engines)
      log(col("p_size") + 1).cast(DecimalType(18, 6)).cast(DoubleType).as("lg"),
      log10(col("p_size") + 1).cast(DecimalType(18, 6)).cast(DoubleType).as("l10"),
      greatest(col("p_retailprice"), lit(1000.0)).as("gr"),
      least(col("p_size"), lit(20)).cast(LongType).as("le"),
      signum(col("p_retailprice") - 1000.0).cast(LongType).as("sg"))
      .orderBy(col("p_partkey"))

  private val q22Sql =
    """SELECT p_partkey,
      |  CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS rnd,
      |  CAST(floor(p_retailprice) AS BIGINT) AS flr,
      |  CAST(ceil(p_retailprice) AS BIGINT) AS cl,
      |  abs(p_retailprice - 950.0) AS ab,
      |  CAST(p_size % 7 AS BIGINT) AS md,
      |  pow(p_size, 2) AS pw,
      |  sqrt(CAST(p_size AS DOUBLE)) AS sq,
      |  CAST(CAST(ln(p_size + 1) AS DECIMAL(18,6)) AS DOUBLE) AS lg,
      |  CAST(CAST(log10(p_size + 1) AS DECIMAL(18,6)) AS DOUBLE) AS l10,
      |  greatest(p_retailprice, 1000.0) AS gr,
      |  CAST(least(p_size, 20) AS BIGINT) AS le,
      |  CAST(sign(p_retailprice - 1000.0) AS BIGINT) AS sg
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---- Q23: conditional / null functions --------------------------------
  private def q23(s: SparkSession, d: String): DataFrame =
    T.customer(s, d)
      .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .select(
        col("c_custkey"), col("o_orderkey"),
        when(col("o_totalprice") > 300000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("tier"),
        coalesce(col("o_orderstatus"), lit("NONE")).as("st"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("nf"),
        coalesce(col("o_orderpriority"), lit("X")).as("nv"),
        when(col("c_acctbal") > 5000, "hi").otherwise("lo").as("iff"),
        col("c_acctbal") <=> col("o_totalprice") as "nse")
      .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)

  private val q23Sql =
    """SELECT c_custkey, o_orderkey,
      |  CASE WHEN o_totalprice > 300000 THEN 'big'
      |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS tier,
      |  coalesce(o_orderstatus, 'NONE') AS st,
      |  nullif(c_mktsegment, 'BUILDING') AS nf,
      |  coalesce(o_orderpriority, 'X') AS nv,
      |  CASE WHEN c_acctbal > 5000 THEN 'hi' ELSE 'lo' END AS iff,
      |  (c_acctbal IS NOT DISTINCT FROM o_totalprice) AS nse
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin

  // ---- Q24: array + higher-order functions over embeddings --------------
  // Folds run left-to-right from a 0.0 seed in both engines (Spark
  // `aggregate`, DuckDB `list_reduce`), so double results are bit-equal.
  private def q24(s: SparkSession, d: String): DataFrame =
    T.embeddings(s, d).select(
      col("vec_id"),
      size(col("embedding")).cast(LongType).as("dim"),
      // try_element_at: DuckDB list indexing yields NULL out of bounds,
      // and ANSI element_at would THROW on an empty/1-element vector —
      // try_ aligns the engines on degenerate rows (EdgeCaseSpec)
      try_element_at(col("embedding"), lit(1)).cast(DoubleType).as("first"),
      try_element_at(sort_array(col("embedding")), lit(2)).cast(DoubleType)
        .as("second_smallest"),
      size(filter(col("embedding"), x => x > 0)).cast(LongType).as("npos"),
      aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))
        .cast(DecimalType(18, 6)).cast(DoubleType).as("ssq"),
      aggregate(slice(col("embedding"), 1, 8), lit(0.0),
        (acc, x) => acc + x.cast(DoubleType))
        .cast(DecimalType(18, 6)).cast(DoubleType).as("head_sum"))
      .orderBy(col("vec_id"))

  private val q24Sql =
    """SELECT vec_id,
      |  CAST(len(embedding) AS BIGINT) AS dim,
      |  CAST(embedding[1] AS DOUBLE) AS first,
      |  CAST(list_sort(embedding)[2] AS DOUBLE) AS second_smallest,
      |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS npos,
      |  CAST(CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |    (a, b) -> a + b) AS DECIMAL(18,6)) AS DOUBLE) AS ssq,
      |  CAST(CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |    list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))),
      |    (a, b) -> a + b) AS DECIMAL(18,6)) AS DOUBLE) AS head_sum
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ---- Q25: map functions + map explode ---------------------------------
  // Shape note (the board's worst sweep ratio, 8.2× at 10× data — still
  // sublinear): this operator's OUTPUT is corpus-sized by definition
  // (2 rows per event), so there is no aggregation to push map-side —
  // the plan is a narrow map + generator plus ONE range exchange for the
  // presentation sort, and the sweep cost is that sort over 2·|events|
  // rows (probe at sf1: ~40 % sort, ~60 % explode+materialize). At
  // 100 TB the global ORDER BY is the piece a real pipeline drops
  // (partition-local output order), not the explode.
  private def q25(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .select(col("event_id"),
        map(lit("type"), col("event_type"),
            lit("uid"), col("user_id").cast(StringType)).as("m"))
      .select(col("event_id"),
        element_at(col("m"), "type").as("mtype"),
        array_join(map_keys(col("m")), ",").as("mkeys"),
        explode(col("m")))
      .orderBy(col("event_id"), col("key"))

  private val q25Sql =
    """WITH e AS (SELECT event_id,
      |    MAP{'type': event_type, 'uid': CAST(user_id AS VARCHAR)} AS m
      |  FROM events)
      |SELECT * FROM (
      |  SELECT event_id, m['type'][1] AS mtype,
      |    array_to_string(map_keys(m), ',') AS mkeys,
      |    unnest(map_entries(m), recursive:=true)
      |  FROM e) ORDER BY event_id, key""".stripMargin

  // ---- Q26: JSON path extraction (R8 semantics) -------------------------
  // 'k BIGINT' + TRY_CAST, not 'k INT' + CAST: a k past 2³¹ would
  // overflow to null on the Spark side only, and a non-numeric k would
  // null on Spark but ERROR the oracle — both latent divergences while
  // the fixture keeps k in 0..16, both closed by widening and TRY_CAST
  private def q26(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .select(
        get_json_object(col("props"), "$.k").as("kstr"),
        expr("from_json(props, 'k BIGINT').k").as("kint"))
      .groupBy(col("kstr"), col("kint"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("kint"))

  private val q26Sql =
    """SELECT json_extract_string(props, '$.k') AS kstr,
      |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS kint,
      |  COUNT(*) AS n
      |FROM events GROUP BY kstr, kint ORDER BY kint""".stripMargin

  // ---- Q27: generator (explode) → word counts ---------------------------
  private def q27(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(50)

  private val q27Sql =
    """SELECT word, COUNT(*) AS cnt FROM (
      |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |WHERE word <> ''
      |GROUP BY word ORDER BY cnt DESC, word LIMIT 50""".stripMargin

  override val defs: Seq[(String, QueryDef)] = Seq(
    "q20_string_funcs" -> QueryDef(q20, Some(q20Sql)),
    "q21_date_funcs"   -> QueryDef(q21, Some(q21Sql)),
    "q21b_month_agg"   -> QueryDef(q21b, Some(q21bSql)),
    "q22_math_funcs"   -> QueryDef(q22, Some(q22Sql)),
    "q23_conditional"  -> QueryDef(q23, Some(q23Sql)),
    "q24_array_hof"    -> QueryDef(q24, Some(q24Sql)),
    "q25_map_explode"  -> QueryDef(q25, Some(q25Sql)),
    "q26_json_extract" -> QueryDef(q26, Some(q26Sql)),
    "q27_word_explode" -> QueryDef(q27, Some(q27Sql)),
  )
}
