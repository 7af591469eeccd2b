package graft

import org.apache.spark.sql.functions.col

/** The composed retrieval pipeline must be deterministic, leak nothing
  * the curation stage dropped, and respect the packing budget — the
  * invariants that make the demo a usable template rather than a toy. */
class RagDemoSpec extends SparkSuite {

  private val sf001 = "/root/testdata/sf0.01"

  test("curate -> chunk -> index -> retrieve -> pack holds its invariants") {
    val out = graft.core.Fixtures.path("ragdemo_a")
    val r = RagDemo.run(spark, sf001, out)
    val ctx = r.contexts.collect()
    assert(ctx.nonEmpty && r.nKept > 0 && r.nChunks > r.nKept)

    // provenance: every retrieved chunk's source doc survived curation
    val kept = SparkEntry.queries("curate_verdict")(spark, sf001)
      .filter(col("keep")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    ctx.foreach { row =>
      assert(kept(row.getAs[Long]("doc_id")),
        s"retrieved chunk from a dropped doc: $row")
    }

    // budget: cumulative length bounded, and the pack keeps a rank
    // PREFIX (greedy fill, no holes)
    ctx.groupBy(_.getAs[Long]("q_doc")).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rn"))
      assert(sorted.last.getAs[Long]("cum_len") <= 600L, s"probe $q over budget")
      val rns = sorted.map(_.getAs[Long]("rn")).toSeq
      assert(rns == (1L to rns.size), s"probe $q pack is not a prefix: $rns")
    }

    // every probe got context
    assert(ctx.map(_.getAs[Long]("q_doc")).distinct.length == r.nProbes.toInt,
      "a probe retrieved nothing")

    // determinism: a second full run reproduces the contexts exactly
    val out2 = graft.core.Fixtures.path("ragdemo_b")
    val r2 = RagDemo.run(spark, sf001, out2)
    assert(r2.contexts.orderBy(col("q_doc"), col("rn")).collect().toSeq ==
      r.contexts.orderBy(col("q_doc"), col("rn")).collect().toSeq)
  }
}
