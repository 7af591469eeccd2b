package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The lakehouse read path's proof obligations: manifest pruning reads
  * STRICTLY fewer files and loses NOTHING; time travel reads exactly the
  * committed version and fails loudly otherwise; derived fixtures
  * invalidate on source rewrite and never surface a partial build. */
class LakeSpec extends SparkSuite {
  import spark.implicits._

  /** Dense synthetic orders spanning BOTH clustered dimensions (64 ck
    * strata × 64 date strata — sf0.001's custkey range is too narrow to
    * exercise the ck half of the curve), laid out through the real
    * fixture machinery. */
  private lazy val layout: String = {
    val src = graft.core.Fixtures.path("lakespec_grid")
    val rows = (0 until 4096).map { i =>
      val ck = (i % 64).toLong * 1024L // ck bits 10-15 vary
      val day = (i / 64) * 32          // 64 dates across 1995-2000
      val ts = new java.sql.Timestamp((9131L + day) * 86400000L)
      (i.toLong, ck, if (i % 3 == 0) "O" else "F", i * 1.5, ts, "1-URGENT")
    }
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$src/orders.parquet")
    LakeFixture.ensure(spark, src)
  }

  test("manifest pruning reduces the files actually read") {
    val all = spark.read.parquet(layout)
    val pruned = ZLayout.prunedOrders(spark, layout, 2048L, 4095L, 9500L, 9800L)
    val allFiles = all.inputFiles.length
    val prunedFiles = pruned.inputFiles.length
    assert(prunedFiles > 0, "predicate matches data; scan must be non-empty")
    assert(prunedFiles < allFiles,
      s"pruning read $prunedFiles of $allFiles files — no skip happened")
    // the skip is real I/O avoidance, not a post-scan filter: the scan's
    // file list is the manifest subset — a 2-D window over a 64×64 grid
    // must skip the overwhelming majority of files
    assert(prunedFiles.toDouble / allFiles < 0.2,
      s"2-D selective predicate should skip most files ($prunedFiles/$allFiles)")
  }

  test("pruning is lossless: pruned scan == unpruned filter, row for row") {
    val pruned = ZLayout.prunedOrders(spark, layout, 2048L, 4095L, 9500L, 9800L)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    val full = spark.read.parquet(layout)
      .filter(col("ck").between(2048L, 4095L) && col("dy").between(9500L, 9800L))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
    assert(pruned.count() > 0, "the grid guarantees hits in this window")
  }

  test("an empty manifest selection yields an empty, schema-stable scan") {
    val none = ZLayout.prunedOrders(spark, layout, 2048L, 4095L, 1L, 2L)
    assert(none.count() == 0)
    assert(none.columns.contains("o_orderkey") && none.columns.contains("fid"))
  }

  test("local and distributed overlap planning select identical files and rows") {
    // the two-mode planner: default = collect-the-manifest local planning;
    // LocalPlanBytesKey=0 forces every manifest onto the Spark-job path —
    // both must compute the identical overlap set
    val local = ZLayout.prunedOrders(spark, layout, 2048L, 4095L, 9500L, 9800L)
    val localFiles = local.inputFiles.sorted.toSeq
    spark.conf.set(ZLayout.LocalPlanBytesKey, "0")
    try {
      val dist = ZLayout.prunedOrders(spark, layout, 2048L, 4095L, 9500L, 9800L)
      assert(dist.inputFiles.sorted.toSeq == localFiles,
        "planning modes disagree on the pruned file set")
      assert(dist.exceptAll(local).isEmpty && local.exceptAll(dist).isEmpty)
    } finally spark.conf.unset(ZLayout.LocalPlanBytesKey)
  }

  test("per-column manifest stats prune on a payload column") {
    // o_custkey is NOT a clustered dim; its stats prune because it rides
    // ck — the general Iceberg per-column capability
    val all = spark.read.parquet(layout).inputFiles.length
    val pruned = ZLayout.prunedOrdersBy(spark, layout,
      Seq(("o_custkey", 2048L, 4095L)))
    assert(pruned.count() > 0)
    assert(pruned.inputFiles.length < all,
      s"payload-column pruning read ${pruned.inputFiles.length} of $all files")
    val full = spark.read.parquet(layout)
      .filter(col("o_custkey").between(2048L, 4095L))
    assert(pruned.select(col("o_orderkey")).exceptAll(
      full.select(col("o_orderkey"))).isEmpty)
    assert(full.select(col("o_orderkey")).exceptAll(
      pruned.select(col("o_orderkey"))).isEmpty)
    // a range on a column with NO manifest stats is refused, not silently
    // unpruned (callers would believe they skipped I/O)
    val e = intercept[IllegalArgumentException] {
      ZLayout.prunedOrdersBy(spark, layout, Seq(("o_totalprice", 0L, 1L)))
    }
    assert(e.getMessage.contains("no manifest stats"), e.getMessage)
  }

  test("the planner handles a 200k-row manifest; both modes agree at that scale") {
    // the 100 TB datapoint: a 100 TB table at 1 GiB files is ~1e5
    // manifest rows — build 2e5 synthetic rows and run BOTH planning
    // modes over them (metadata only; no data files needed to plan)
    val dir = graft.core.Fixtures.path("lakespec_bigmanifest")
    graft.streaming.CommitFiles.rmTree(new java.io.File(dir))
    spark.range(200000).select(
        col("id").as("fid"), lit(1L).as("n"),
        (col("id") % 1000L).as("ck_min"), (col("id") % 1000L + 50L).as("ck_max"),
        (col("id") % 500L).as("dy_min"), (col("id") % 500L + 20L).as("dy_max"))
      .coalesce(2).write.parquet(s"$dir/_manifest")
    val ranges = Seq(("ck", 100L, 120L), ("dy", 40L, 60L))
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (local, tl) = timed(ZLayout.overlapFids(spark, dir, ranges))
    spark.conf.set(ZLayout.LocalPlanBytesKey, "0")
    val (dist, td) =
      try timed(ZLayout.overlapFids(spark, dir, ranges))
      finally spark.conf.unset(ZLayout.LocalPlanBytesKey)
    assert(local.nonEmpty && local == dist,
      s"modes disagree at 200k rows: local=${local.size} dist=${dist.size}")
    assert(local.size < 200000, "the predicate must actually prune")
    info(f"200k-row manifest: local plan $tl%.2f s, distributed plan $td%.2f s, " +
      s"${local.size} fids selected")
  }

  test("overlap planning modes agree on NULL stats rows (dropped, not crashed)") {
    // a unit whose stats column is all-null yields null min/max; SQL
    // comparison drops it in the Spark-job mode, so the driver-local
    // mode must drop it too instead of NPEing on getLong
    val dir = graft.core.Fixtures.path("lakespec_nullstats")
    graft.streaming.CommitFiles.rmTree(new java.io.File(dir))
    spark.range(3).select(
        col("id").as("fid"), lit(1L).as("n"),
        when(col("id") === 1L, lit(null)).otherwise(col("id") * 100L)
          .cast("long").as("ck_min"),
        when(col("id") === 1L, lit(null)).otherwise(col("id") * 100L + 50L)
          .cast("long").as("ck_max"))
      .coalesce(1).write.parquet(s"$dir/_manifest")
    val ranges = Seq(("ck", 0L, 1000L))
    val local = ZLayout.overlapFids(spark, dir, ranges)
    spark.conf.set(ZLayout.LocalPlanBytesKey, "0")
    val dist =
      try ZLayout.overlapFids(spark, dir, ranges)
      finally spark.conf.unset(ZLayout.LocalPlanBytesKey)
    assert(local == Seq(0L, 2L) && dist == local,
      s"null-stats row handling diverged: local=$local dist=$dist")
  }

  test("vacuum expires exactly the old committed versions, pointer-safely") {
    val dir = graft.core.Fixtures.path("lakespec_vacuum")
    graft.streaming.CommitFiles.rmTree(new java.io.File(dir))
    val orders = graft.core.Tables.orders(spark, sfDir).limit(30)
    for (v <- 0 to 2) orders.limit(10 * (v + 1)).write.parquet(s"$dir/v=$v")
    orders.limit(1).write.parquet(s"$dir/v=9") // in-flight: above the pointer
    graft.streaming.CommitFiles.atomicWrite(Paths.get(dir, "_latest"), "2")
    // crash debris from an "earlier" vacuum must be swept, not tripped on
    Files.createDirectories(Paths.get(dir, ".vacuum-v=7"))
    assert(TimeTravel.vacuum(dir, keepLast = 2) == Seq(0L))
    assert(!Files.exists(Paths.get(dir, ".vacuum-v=7")), "debris must be swept")
    assert(TimeTravel.versions(dir) == Seq(1L, 2L, 9L),
      "v=1, v=2 retained; the in-flight v=9 belongs to its writer")
    assert(TimeTravel.latestVersion(dir).contains(2L), "pointer never touched")
    val e = intercept[IllegalArgumentException] {
      TimeTravel.readVersion(spark, dir, 0L)
    }
    assert(e.getMessage.contains("not retained"), e.getMessage)
    assert(TimeTravel.readVersion(spark, dir, 2L).count() == 30)
    assert(intercept[IllegalArgumentException] {
      TimeTravel.readAsOf(spark, dir, 0L)
    }.getMessage.contains("nothing committed"),
      "as-of below the retention floor must refuse, not serve a gap")
    // keepLast must retain at least the pointer's target
    assert(intercept[IllegalArgumentException] {
      TimeTravel.vacuum(dir, keepLast = 0)
    }.getMessage.contains(">= 1"))
    // idempotent: nothing left to expire
    assert(TimeTravel.vacuum(dir, keepLast = 2).isEmpty)
  }

  test("time travel reads the exact committed version; as-of takes the floor") {
    val snaps = SnapshotFixture.ensure(spark, sfDir)
    assert(TimeTravel.versions(snaps) == Seq(0L, 1L, 2L))
    assert(TimeTravel.latestVersion(snaps).contains(2L))
    val orders = graft.core.Tables.orders(spark, sfDir)
    def n(c: String) = orders
      .filter(col("o_orderdate") < lit(c).cast("timestamp")).count()
    assert(TimeTravel.readVersion(spark, snaps, 0L).count() == n(SnapshotFixture.Cut0))
    assert(TimeTravel.readVersion(spark, snaps, 1L).count() == n(SnapshotFixture.Cut1))
    assert(TimeTravel.readAsOf(spark, snaps, 1L).count() == n(SnapshotFixture.Cut1))
    // as-of above the head clamps to the latest committed version
    assert(TimeTravel.readAsOf(spark, snaps, 99L).count() == orders.count())
    val miss = intercept[IllegalArgumentException] {
      TimeTravel.readVersion(spark, snaps, 7L)
    }
    assert(miss.getMessage.contains("not retained") &&
      miss.getMessage.contains("0, 1, 2"),
      s"missing-version failure must name what IS retained: ${miss.getMessage}")
    val below = intercept[IllegalArgumentException] {
      TimeTravel.readAsOf(spark, snaps, -1L)
    }
    assert(below.getMessage.contains("nothing committed"))
    // an in-flight snapshot above the pointer (crash between write and
    // flip) must be refused, not served possibly torn
    orders.limit(1).write.mode("overwrite").parquet(s"$snaps/v=9")
    try {
      val torn = intercept[IllegalArgumentException] {
        TimeTravel.readVersion(spark, snaps, 9L)
      }
      assert(torn.getMessage.contains("not committed"), torn.getMessage)
      assert(TimeTravel.readAsOf(spark, snaps, 9L).count() == orders.count(),
        "as-of must clamp to the committed head, ignoring the torn dir")
    } finally graft.streaming.CommitFiles.rmTree(new java.io.File(s"$snaps/v=9"))
  }

  test("schema evolution: each snapshot serves its own schema; as-of reads merge") {
    val dir = graft.core.Fixtures.path("lakespec_evolve")
    graft.streaming.CommitFiles.rmTree(new java.io.File(dir))
    val orders = graft.core.Tables.orders(spark, sfDir).limit(20)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    orders.write.parquet(s"$dir/v=0")
    // v=1 ADDS a column (the additive evolution Iceberg/Delta allow
    // without rewrite); existing columns keep their types
    orders.withColumn("o_priority_rank",
      (col("o_orderkey") % 3).cast("long")).write.parquet(s"$dir/v=1")
    graft.streaming.CommitFiles.atomicWrite(Paths.get(dir, "_latest"), "1")
    val v0 = TimeTravel.readVersion(spark, dir, 0L)
    val v1 = TimeTravel.readVersion(spark, dir, 1L)
    assert(!v0.columns.contains("o_priority_rank"),
      "an old snapshot must not grow columns it was never written with")
    assert(v1.columns.contains("o_priority_rank"))
    assert(TimeTravel.readAsOf(spark, dir, 0L).columns.sameElements(v0.columns),
      "as-of must serve the selected version's schema, not the latest's")
    // the union-by-name read across the evolution boundary: old rows
    // surface the new column as null — the standard widened read
    val widened = v1.unionByName(
      v0.withColumn("o_priority_rank", lit(null).cast("long")))
    assert(widened.count() == 40)
    assert(widened.filter(col("o_priority_rank").isNull).count() == 20)
  }

  test("a rewritten source re-derives the layout and sweeps the stale one") {
    val src = graft.core.Fixtures.path("lakespec_src")
    def writeOrders(rows: Seq[(Long, Long, String, Double, java.sql.Timestamp, String)]): Unit =
      rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .coalesce(1).write.mode("overwrite").parquet(s"$src/orders.parquet")
    def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 00:00:00")
    writeOrders(Seq((1L, 10L, "O", 5.0, ts("1996-03-01"), "1-URGENT")))
    val p1 = LakeFixture.ensure(spark, src)
    assert(spark.read.parquet(p1).count() == 1)
    Thread.sleep(1100) // mtime granularity: the rewrite must be observable
    writeOrders(Seq(
      (1L, 10L, "O", 5.0, ts("1996-03-01"), "1-URGENT"),
      (2L, 20L, "F", 6.0, ts("1997-05-01"), "2-HIGH")))
    val p2 = LakeFixture.ensure(spark, src)
    assert(p2 != p1, "rewritten source must re-derive under a new fingerprint")
    assert(spark.read.parquet(p2).count() == 2)
    assert(!new java.io.File(p1).exists(),
      "the stale fingerprint dir must be swept, not leaked")
  }

  test("pre-migration root debris is reclaimed on first touch, not only on re-derive") {
    // fixtures written before the keyDir layout sit directly under the
    // root. The sweep contract (round 14): ONCE per JVM per root, and
    // only entries older than the grace window — so OLD debris present
    // at the JVM's first touch of the root is reclaimed, while a fresh
    // directory (possibly a live concurrent writer's) survives.
    class Memo extends graft.core.DerivedFixture("lakespec_memo_root", "orders") {
      override protected def build(s: org.apache.spark.sql.SparkSession,
          dir: String, target: String): Unit =
        s.read.parquet(s"$dir/orders.parquet").write.parquet(target)
    }
    val src = graft.core.Fixtures.path("lakespec_src3")
    Seq((1L, 10L, "O", 5.0,
        java.sql.Timestamp.valueOf("1996-03-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$src/orders.parquet")
    val root = Paths.get(graft.core.Fixtures.path("lakespec_memo_root"))
    // old debris, planted BEFORE the JVM's first touch of this root
    val debris = root.resolve("0123456789abcdef-v0") // pre-keyDir naming
    Files.createDirectories(debris)
    Files.writeString(debris.resolve("part-old.parquet"), "old bytes")
    val old = System.currentTimeMillis() - 8L * 3600 * 1000
    assert(debris.toFile.setLastModified(old))
    val p = (new Memo).ensure(spark, src)
    assert(new java.io.File(p).exists())
    assert(!Files.exists(debris),
      "pre-migration root debris must be reclaimed on first touch")
    // fresh (grace-window) debris planted after the sweep survives the
    // next touch: the sweep must never race a live writer
    val fresh = root.resolve("fedcba9876543210-v0")
    Files.createDirectories(fresh)
    val p2 = (new Memo).ensure(spark, src)
    assert(p2 == p)
    assert(Files.exists(fresh),
      "a fresh non-keyDir entry must survive (grace window + once-per-JVM)")
  }

  test("a crashed (partial) build is never accepted as a complete fixture") {
    val src = graft.core.Fixtures.path("lakespec_src2")
    Seq((1L, 10L, "O", 5.0,
        java.sql.Timestamp.valueOf("1996-03-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$src/orders.parquet")
    val p = LakeFixture.ensure(spark, src)
    val keyDir = Paths.get(p).getParent
    // simulate a crash mid-build from ANOTHER session: a temp dir exists,
    // the final path does not — ensure() must rebuild and sweep the orphan
    graft.streaming.CommitFiles.rmTree(new java.io.File(p))
    val orphan = keyDir.resolve(".tmp-orphan")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-garbage.parquet"), "torn bytes")
    val p2 = LakeFixture.ensure(spark, src)
    assert(p2 == p && new java.io.File(p2).exists())
    assert(spark.read.parquet(p2).count() == 1)
    assert(!Files.exists(orphan), "orphaned staging dirs must be swept")
  }
}
