package graft.plans

import graft.{SparkEntry, SparkSuite}
import graft.core.{Tables => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Correctness + plan shape for the native as-of join
  * (plans/AsOfJoin.scala): synthetic edge cases and a brute-force oracle
  * on the real events fixture, both run through BOTH physical paths
  * (shuffled sort-merge and stats-picked broadcast), plus the plan shapes
  * the 100 TB design depends on. */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def asof(l: DataFrame, r: DataFrame) =
    AsOfJoin.asofJoin(l, r, Seq("k"), Seq("rk"), "ts", "rts")

  /** Run `body` with the broadcast threshold pinned (-1 forces the
    * sort-merge exec; default picks broadcast for tiny right sides). */
  private def withThreshold[A](v: String)(body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, v)
    try body finally spark.conf.set(key, old)
  }

  private def checkSemantics(): Unit = {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 25L, "c"),
      (2L, 5L, "d"), (3L, 9L, "e"))
      .toDF("k", "ts", "tag")
    val r = Seq((1L, 10L, 1.0), (1L, 19L, 2.0), (1L, 30L, 3.0),
      (2L, 6L, 4.0))
      .toDF("rk", "rts", "v")
    val got = asof(l, r).select("tag", "v").as[(String, Option[Double])]
      .collect().toMap
    // a: tie at ts=10 is inclusive; b: 19 <= 20; c: 30 > 25 keeps 19;
    // d: right ts 6 > 5 → no match; e: key 3 absent → no match
    assert(got === Map("a" -> Some(1.0), "b" -> Some(2.0),
      "c" -> Some(2.0), "d" -> None, "e" -> None))

    val ln = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "b"),
      (Some(1L), None, "c")).toDF("k", "ts", "tag")
    val rn = Seq((Some(1L), Some(5L), 1.0), (None, Some(1L), 9.0),
      (Some(1L), None, 8.0)).toDF("rk", "rts", "v")
    val gotN = asof(ln, rn).select("tag", "v").as[(String, Option[Double])]
      .collect().toMap
    assert(gotN === Map("a" -> Some(1.0), "b" -> None, "c" -> None))
  }

  test("sort-merge path: ties, latest-at-or-before, null semantics") {
    withThreshold("-1")(checkSemantics())
  }

  test("broadcast path: identical semantics") {
    checkSemantics() // tiny right side → stats pick BroadcastAsOfJoinExec
  }

  private def fixtureAsOf(): Map[Long, Option[Double]] = {
    val probes = T.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts").cast("long").as("ts"))
    val errs = T.events(spark, sfDir).where(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("v"))
      .select(col("user_id").as("rk"), col("ts").cast("long").as("rts"),
        col("v"))
    AsOfJoin.asofJoin(probes, errs, Seq("user_id"), Seq("rk"), "ts", "rts")
      .select("event_id", "v").as[(Long, Option[Double])].collect().toMap
  }

  test("both paths match the brute-force oracle on the events fixture") {
    val gotMerge = withThreshold("-1")(fixtureAsOf())
    val gotBcast = fixtureAsOf()

    val errs = T.events(spark, sfDir).where(col("event_type") === "error")
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("v"))
      .select(col("user_id"), col("ts").cast("long"), col("v"))
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val expected = T.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts").cast("long"))
      .as[(Long, Long, Long)].collect().map { case (id, u, ts) =>
        id -> errs.getOrElse(u, Array.empty[(Long, Long, Double)])
          .takeWhile(_._2 <= ts).lastOption.map(_._3)
      }.toMap
    assert(gotMerge.size === expected.size)
    assert(gotMerge === expected)
    assert(gotBcast === expected)
  }

  test("forced merge plan: co-partitioned sort-merge shape") {
    withThreshold("-1") {
      val p = SparkEntry.queries("q41_asof_native")(spark, sfDir)
      p.collect() // force AQE to finalize the real plan
      val s = p.queryExecution.executedPlan.toString
      assert(s.contains("AsOfJoin "), s) // plan strings strip the Exec suffix
      assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"), s)
      // one hash-cluster shuffle per side, sorted on (key, ts)
      assert(s.linesIterator.count(_.contains("hashpartitioning(")) >= 2, s)
      assert(s.contains("Sort ["), s)
    }
  }

  test("broadcast plan: probe side has no exchange and no sort") {
    val l = Seq((1L, 10L, "a")).toDF("k", "ts", "tag")
    val r = Seq((1L, 5L, 1.0)).toDF("rk", "rts", "v")
    val df = asof(l, r)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastAsOfJoin"), s)
    assert(s.contains("BroadcastExchange"), s)
    assert(!s.contains("hashpartitioning("), s)
    assert(!s.contains("Sort ["), s)
  }

  test("optimizer rule pushes key filters through the as-of join") {
    withThreshold("-1") {
      val probes = T.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("ts"))
      val errs = T.events(spark, sfDir).where(col("event_type") === "error")
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(col("value"), col("event_id")).as("v"))
        .select(col("user_id").as("rk"), col("ts").as("rts"), col("v"))
      val joined = AsOfJoin.asofJoin(probes, errs,
        Seq("user_id"), Seq("rk"), "ts", "rts")

      val filtered = joined.where(col("user_id") === 7)
      filtered.collect()
      val s = filtered.queryExecution.executedPlan.toString
      // the key predicate must reach BOTH parquet scans, not sit above the
      // join (AQE plan strings repeat the plan, hence >= 2)
      assert(s.linesIterator.count(l => l.contains("PushedFilters") &&
        l.contains("EqualTo(user_id,7)")) >= 2, s)

      // and filter-then-join ≡ join-then-filter
      val direct = AsOfJoin.asofJoin(
        probes.where(col("user_id") === 7),
        errs.where(col("rk") === 7), Seq("user_id"), Seq("rk"), "ts", "rts")
      assert(filtered.orderBy("event_id").collect().toSeq ===
        direct.orderBy("event_id").collect().toSeq)
    }
  }

  test("q41 registry query returns one row per event") {
    val df = SparkEntry.queries("q41_asof_native")(spark, sfDir)
    assert(df.count() === T.events(spark, sfDir).count())
  }
}
