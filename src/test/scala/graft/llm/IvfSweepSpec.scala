package graft.llm

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions.col

/** IVF at realistic nlist: the registry pins k=8 for oracle stability,
  * but a real corpus wants the cell count in the hundreds so each
  * inverted list stays a small fraction of the data. This sweep runs the
  * SAME parameterized Lloyd path (`Ann.ivfModel`) at k=64 and k=256 on
  * the 20k-vector dim-1024 clustered corpus — sf1-scale rows at a real
  * model dim — and gates recall@5 vs brute force at ≥ 0.9. Numbers are
  * recorded in SCALING.md; everything is deterministic, so these are
  * exact replays. */
class IvfSweepSpec extends SparkSuite {

  private def topk(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
    rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  test("k=64 and k=256 on 20k x dim-1024: recall@5 >= 0.9 at nprobe=4/8") {
    val d = WideEmb.bigClusteredDir(spark)
    val truth = topk(SparkEntry.queries("q31_cosine_topk")(spark, d).collect())

    def sweep(k: Int, nprobes: Seq[Int]): Map[Int, (Double, Double)] = {
      val t0 = System.nanoTime()
      val (lists, cdf) = Ann.ivfModel(spark, d, k = k, iters = 2)
      val cached = lists.cache()
      cached.count() // materialize the model once for all probe settings
      val buildSec = (System.nanoTime() - t0) / 1e9
      val out = nprobes.map { np =>
        val t1 = System.nanoTime()
        val probes = cached.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
            col("nsq").as("q_nsq"))
        val got = topk(Ann.rerank(cached,
          Ann.probeCells(probes, cdf, np), "ck").collect())
        val searchSec = (System.nanoTime() - t1) / 1e9
        val rs = truth.map { case (q, t) =>
          got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
        np -> (rs.sum / rs.size, searchSec)
      }.toMap
      cached.unpersist()
      info(f"k=$k build=${buildSec}%.1fs " + out.toSeq.sortBy(_._1)
        .map { case (np, (r, s)) => f"nprobe=$np recall=$r%.3f search=${s}%.1fs" }
        .mkString("  "))
      out
    }

    val r64 = sweep(64, Seq(1, 4))
    assert(r64(4)._1 >= 0.9, s"k=64/nprobe=4 recall ${r64(4)._1} below 0.9")
    assert(r64(4)._1 >= r64(1)._1, "raising nprobe lowered recall")

    val r256 = sweep(256, Seq(8))
    assert(r256(8)._1 >= 0.9, s"k=256/nprobe=8 recall ${r256(8)._1} below 0.9")
  }
}
