package graft.llm

import graft.{SparkEntry, SparkSuite}

/** PQ/ADC quality and composition gates: the compressed-code ranking
  * must recover most true neighbors on a cluster-structured corpus (the
  * only corpus where ANN recall is a meaningful grade — AnnRecallSpec's
  * rule), and the IVF×PQ composition must degrade to plain PQ exactly
  * when the probe set covers every cell. */
class PqSpec extends SparkSuite {

  private def topkSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  test("PQ ADC shortlist contains the true neighbors on the clustered dim-1024 corpus") {
    val cdir = WideEmb.clusteredDir(spark)
    val truth = topkSet(SparkEntry.queries("q31_cosine_topk")(spark, cdir))
    // PQ's production role is the SHORTLIST stage: ADC ranks compressed
    // codes, an exact re-rank of the shortlist recovers the final order.
    // So the gate is containment — the exact top-5 must sit inside the
    // ADC top-50 — at a model-sized parameterization (m=16 subspaces,
    // 32-way codebooks, two Lloyd rounds), not rank-for-rank agreement
    // at the oracle-stability pins.
    val short50 = topkSet(Ann.pqAdc(spark, cdir, m = 16, ksub = 32,
      iters = 2, topk = 50))
    val fine5 = topkSet(Ann.pqAdc(spark, cdir, m = 16, ksub = 32,
      iters = 2, topk = 5))
    val containment = truth.map { case (q, t) =>
      short50.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
    val recall5 = truth.map { case (q, t) =>
      fine5.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
    val cMean = containment.sum / containment.size
    val rMean = recall5.sum / recall5.size
    info(s"shortlist-50 containment $cMean, direct recall@5 $rMean")
    assert(cMean >= 0.8, s"PQ shortlist-50 containment $cMean")
  }

  test("PQ model is deterministic: two independent builds rank identically") {
    val a = Ann.pqAdc(spark, sfDir).collect().toSeq
    val b = Ann.pqAdc(spark, sfDir).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("IVF x PQ with full probe coverage equals plain PQ ADC exactly") {
    // nprobe = k: every cell is probed, so the coarse pruning keeps all
    // candidates and the composition must reproduce the un-pruned scan
    val full = Ann.ivfPq(spark, sfDir, k = 8, nprobe = 8).collect().toSeq
    val plain = Ann.pqAdc(spark, sfDir).collect().toSeq
    assert(full == plain)
  }

  test("IVF x PQ at nprobe=1 scores only the probe's own cell members") {
    val pruned = Ann.ivfPq(spark, sfDir, k = 8, nprobe = 1).collect()
    assert(pruned.nonEmpty)
    // every rank list is still a valid 1..n prefix per probe
    val byQ = pruned.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (q, rs) =>
      val rns = rs.map(_.getAs[Long]("rn")).sorted.toSeq
      assert(rns == (1L to rns.size), s"probe $q ranks $rns")
    }
    // the IVF contract: at nprobe=1 each probe's candidates come from
    // ITS cell — a union-of-cells filter would leak cross-cell members
    val (lists, _) = Ann.ivfModel(spark, sfDir, 8, 2)
    val cell = lists.select(org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.col("ck")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    pruned.foreach { r =>
      val (q, n) = (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))
      assert(cell(n) == cell(q),
        s"probe $q (cell ${cell(q)}) scored $n from cell ${cell(n)}")
    }
  }
}
