package graft.llm

import java.nio.file.Files

import graft.{SparkEntry, SparkSuite}

/** The persisted-index story: build once, search many, read only the
  * probed cells. Equality with the inline oracle-graded query is the
  * correctness gate; the partition-pruning assert is the scale gate. */
class IvfIndexSpec extends SparkSuite {

  test("search over the persisted index equals the inline ann_ivf_topk") {
    val dir = Files.createTempDirectory("graft_ivf_idx").toString
    IvfIndex.build(spark, sfDir, dir)
    val idx = IvfIndex.search(spark, sfDir, dir, nprobe = 1).collect().toSeq
    val inline = SparkEntry.queries("ann_ivf_topk")(spark, sfDir).collect().toSeq
    assert(idx == inline)
  }

  test("the assignment scan prunes to the probed cells' partitions") {
    val dir = Files.createTempDirectory("graft_ivf_idx_prune").toString
    IvfIndex.build(spark, sfDir, dir)
    val df = IvfIndex.search(spark, sfDir, dir, nprobe = 1)
    df.collect()
    val scan = df.queryExecution.executedPlan.toString.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("ck"))
    assert(scan.isDefined, "no partition filter on the assign scan:\n" +
      df.queryExecution.executedPlan.toString)
    // the filter must carry concrete cell literals — a catch-all like
    // isnotnull(ck#12) still reads every cell's partitions and must fail
    assert(scan.get.contains(" IN (") ||
      scan.get.matches(""".*ck#\d+\)?\s*=\s*\d+.*"""),
      s"partition filter carries no concrete cell literals: ${scan.get}")
  }

  test("compact self-heals every crash state a previous compact can leave") {
    val dir = Files.createTempDirectory("graft_ivf_idx_heal").toString
    IvfIndex.build(spark, sfDir, dir)
    val truth = IvfIndex.search(spark, sfDir, dir, nprobe = 2).collect().toSeq
    val live = java.nio.file.Paths.get(dir, "assign")
    val old = java.nio.file.Paths.get(dir, "assign_retiring")
    // crash BETWEEN the two swap renames: assign/ missing, retiring live
    Files.move(live, old)
    IvfIndex.compact(spark, dir)
    assert(IvfIndex.search(spark, sfDir, dir, nprobe = 2).collect().toSeq
      == truth, "heal lost rows after a mid-swap crash")
    // crash AFTER the swap but before cleanup: stale retiring + tmp dirs
    Files.createDirectories(old)
    Files.createDirectories(java.nio.file.Paths.get(dir, "assign_compacting"))
    IvfIndex.compact(spark, dir)
    assert(!Files.exists(old) &&
      !Files.exists(java.nio.file.Paths.get(dir, "assign_compacting")))
    assert(IvfIndex.search(spark, sfDir, dir, nprobe = 2).collect().toSeq
      == truth, "heal lost rows after a post-swap crash")
  }

  test("out-of-sample assign reproduces the stored lists bit-for-bit") {
    // the incremental-ingest contract: assigning the original corpus
    // against the persisted centroids must equal the build-time
    // assignment exactly — same argmax, same ties — or appended vectors
    // would land in different cells than a rebuild would put them
    val dir = Files.createTempDirectory("graft_ivf_idx_assign").toString
    IvfIndex.build(spark, sfDir, dir)
    val stored = spark.read.parquet(s"$dir/assign")
      .select("vec_id", "ck").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val fresh = IvfIndex.assign(spark, sfDir, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(fresh == stored)
  }

  test("lifecycle: append a drifted twin, compact, search the grown index, read staleness") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_ivf_idx_grow").toString
    IvfIndex.build(spark, sfDir, dir)

    // the original corpus quantizes exactly as well as at build time —
    // the staleness floor is an exact 0, not an approximate one
    assert(IvfIndex.staleness(spark, sfDir, dir) == 0.0)

    // a deterministic perturbed twin of the corpus: ids shifted past the
    // originals (the caller-owned uniqueness contract), every element
    // nudged by a position-dependent factor so directions actually drift
    val src = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val shift = src.agg(max("vec_id")).collect()(0).getLong(0) + 1L
    def perturb(c: org.apache.spark.sql.Column) =
      transform(c, (x, i) =>
        (x.cast("double") * (lit(1.0) + (i % 3 - 1).cast("double") * lit(0.05)))
          .cast("float"))
    val twin = src.select((col("vec_id") + shift).as("vec_id"),
      perturb(col("embedding")).as("embedding"), col("label"))
    val tdir = graft.core.Fixtures.path("ivf_twin")
    twin.write.mode("overwrite").parquet(s"$tdir/embeddings.parquet")
    val udir = graft.core.Fixtures.path("ivf_union")
    src.unionByName(twin).write.mode("overwrite")
      .parquet(s"$udir/embeddings.parquet")

    IvfIndex.append(spark, tdir, dir)

    def assignMap: Map[Long, Int] =
      spark.read.parquet(s"$dir/assign").select("vec_id", "ck").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def partFiles: Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$dir/assign"))
        .count(_.getName.endsWith(".parquet"))
    }

    val grown = assignMap
    // every original and every appended vector is indexed exactly once
    assert(grown.size > src.count() .toInt, s"append grew nothing: ${grown.size}")
    val before = partFiles
    IvfIndex.compact(spark, dir)
    assert(assignMap == grown, "compaction changed the assignment")
    assert(partFiles < before,
      s"compaction did not reduce files: $before -> $partFiles")

    // the drift check: at nprobe=k the probe set covers every cell, so
    // search over the GROWN index must equal brute-force top-k over the
    // union corpus — same re-rank, same rounding, same tie-breaks
    val got = IvfIndex.search(spark, udir, dir, nprobe = 8).collect().toSeq
    val truth = SparkEntry.queries("q31_cosine_topk")(spark, udir)
      .collect().toSeq
    assert(got == truth, "grown-index exhaustive search drifted from brute force")

    // the grown corpus drifted from the build-time centroids: the metric
    // must register it as a finite, non-negative, sane fraction
    val st = IvfIndex.staleness(spark, udir, dir)
    assert(st >= 0.0 && st < 0.5 && !st.isNaN, s"staleness out of range: $st")
  }

  test("nprobe=2 candidates are a superset: the best neighbor never worsens") {
    val dir = Files.createTempDirectory("graft_ivf_idx_np").toString
    IvfIndex.build(spark, sfDir, dir)
    def best(nprobe: Int): Map[Long, Double] =
      IvfIndex.search(spark, sfDir, dir, nprobe).collect()
        .filter(_.getAs[Long]("rn") == 1L)
        .map(r => r.getAs[Long]("q_id") -> r.getAs[Double]("cos_sim")).toMap
    val b1 = best(1)
    val b2 = best(2)
    assert(b1.nonEmpty)
    b1.foreach { case (q, c1) =>
      assert(b2(q) >= c1 - 1e-9, s"probe $q: nprobe=2 best ${b2(q)} < nprobe=1 $c1")
    }
  }
}
