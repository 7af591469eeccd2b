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
