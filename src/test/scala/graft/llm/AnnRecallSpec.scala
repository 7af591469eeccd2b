package graft.llm

import graft.{SparkEntry, SparkSuite}

/** ANN quality gates (SURVEY.md §5.2): the approximate paths must recover
  * most of the brute-force (q31) neighbors, and HLL distinct must sit
  * within its configured error of the exact count. */
class AnnRecallSpec extends SparkSuite {

  private def topkSet(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  lazy val truth: Map[Long, Set[Long]] = topkSet("q31_cosine_topk")

  test("IVF top-k: k-means coarse quantizer reaches recall >= 0.6 at nprobe=1") {
    val ivf = topkSet("ann_ivf_topk")
    val recalls = truth.map { case (q, t) =>
      ivf.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"IVF mean recall $mean (expected ~0.88 on sf0.001/sf0.01)")
  }

  test("LSH top-k: every probe returns candidates; hits are true neighbors' cosines") {
    val lsh = SparkEntry.queries("ann_lsh_topk")(spark, sfDir).collect()
    assert(lsh.nonEmpty)
    // rank-1 approximate neighbor should be in the brute-force top set for
    // at least some probes (16-bucket LSH is coarse by construction)
    val rank1 = lsh.filter(_.getAs[Long]("rn") == 1L)
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
    val hits = rank1.count { case (q, n) => truth.getOrElse(q, Set.empty).contains(n) }
    assert(hits >= 1, s"no rank-1 LSH hit in ${rank1.toSeq}")
  }

  test("parameterized IVF at dim 1024: k=32/nprobe=2 recall >= nprobe=1") {
    val wdir = WideEmb.dir(spark)
    val truthW = SparkEntry.queries("q31_cosine_topk")(spark, wdir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    def recall(nprobe: Int): Double = {
      val got = Ann.ivf(spark, wdir, k = 32, iters = 2, nprobe = nprobe)
        .collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
      val rs = truthW.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      rs.sum / rs.size
    }
    val r1 = recall(1)
    val r2 = recall(2)
    assert(r2 >= r1, s"nprobe=2 recall $r2 below nprobe=1 recall $r1")
    assert(r2 > 0.0, "nprobe=2 found no true neighbors at all")
  }

  test("planes=8 LSH (256 buckets) recall >= pinned planes=4 at a smaller candidate budget") {
    // the parameterization gate: raising the plane count with corpus size
    // is the LSH scale path, and it must not cost recall. On the
    // clustered dim-1024 fixture, planes=8 + Hamming-1 multi-probe scans
    // 9 of 256 buckets (~3.5% of the corpus) — barely half the candidate
    // budget of the registry-pinned planes=4 single bucket (1 of 16,
    // 6.25%) — and must still reach at least its recall. Everything is
    // seeded and deterministic, so these are exact replays, not noise.
    val cdir = WideEmb.clusteredDir(spark)
    val truthC = SparkEntry.queries("q31_cosine_topk")(spark, cdir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    def recallAt(planes: Int, multiProbe: Boolean): Double = {
      val got = Ann.lshTopkAt(spark, cdir, planes, multiProbe).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
      val rs = truthC.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      rs.sum / rs.size
    }
    val r4 = recallAt(4, multiProbe = false)
    val r8 = recallAt(8, multiProbe = true)
    assert(r8 >= r4, s"planes=8 multiprobe recall $r8 below planes=4 recall $r4")
    assert(r8 >= 0.5, s"planes=8 multiprobe recall $r8 unusably low")
  }

  private def meanRecall(got: Map[Long, Set[Long]]): Double = {
    val rs = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
    rs.sum / rs.size
  }

  test("multi-probe LSH: recall >= single-bucket LSH, candidates still bounded") {
    val single = meanRecall(topkSet("ann_lsh_topk"))
    val multi = meanRecall(topkSet("ann_lsh_multiprobe"))
    assert(multi >= single,
      s"multiprobe recall $multi below single-bucket recall $single")
    assert(multi > 0.0, "multiprobe found no true neighbors at all")
  }

  test("hard negatives: every mined pair crosses labels and looks similar") {
    val labels = graft.core.Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = SparkEntry.queries("ann_hard_negatives")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, nb) = (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))
      assert(labels(q) != labels(nb), s"same-label pair mined: $q -> $nb")
    }
    // 'hard' means a lookalike: a mined negative must out-rank at least
    // the bottom of the same probe's unfiltered top-k would... minimally,
    // ranks are dense per probe and cosines non-increasing
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rn"))
      assert(sorted.map(_.getAs[Long]("rn")).toSeq == (1L to sorted.length))
      val cs = sorted.map(_.getAs[Double]("cos_sim")).toSeq
      assert(cs == cs.sorted.reverse, s"cosines not non-increasing: $cs")
    }
  }

  test("cluster-diverse sample: per-cell quota honored, deterministic") {
    val rows = SparkEntry.queries("sample_cluster_diverse")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val perCell = rows.groupBy(_.getAs[Int]("ck")).view.mapValues(_.length).toMap
    assert(perCell.values.forall(_ <= 25), s"cell over quota: $perCell")
    // more than one cell must be represented — the whole point is that
    // the sample cannot collapse into the head cluster
    assert(perCell.size > 1, s"sample collapsed into ${perCell.keySet}")
    val again = SparkEntry.queries("sample_cluster_diverse")(spark, sfDir).collect()
    assert(rows.toSeq == again.toSeq, "sample not deterministic across runs")
  }

  test("HLL approx distinct within 10% of exact per language") {
    Ann.hllDistinctRaw(spark, sfDir).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_words").toDouble
      val exact = r.getAs[Long]("exact_words").toDouble
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"lang=${r.getAs[String]("lang")} approx=$approx exact=$exact")
    }
  }

  test("deterministic across runs: LSH buckets identical on re-execution") {
    val a = SparkEntry.queries("ann_lsh_buckets")(spark, sfDir).collect().toSeq
    val b = SparkEntry.queries("ann_lsh_buckets")(spark, sfDir).collect().toSeq
    assert(a == b)
  }
}
