package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** `cc_min_labels` must compute exactly the fixed point of
  * `Dedup.ccLabels`' distributed min-label propagation: one (doc_id,
  * cluster=min id in component) row per node with an edge. Reference
  * here is a plain BFS union of the edge set. */
class CcLabelsSpec extends SparkSuite {

  private def viaExpr(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    edges.toDF("a", "b")
      .agg(collect_list(struct(col("a"), col("b"))).as("es"))
      .select(explode(CcMinLabels.of(col("es"))).as("lc"))
      .select(col("lc.doc_id"), col("lc.cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def viaBfs(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
      .withDefaultValue(Nil)
    edges.foreach { case (a, b) => adj(a) ::= b; adj(b) ::= a }
    val seen = scala.collection.mutable.Map.empty[Long, Long]
    adj.keys.toSeq.sorted.foreach { start =>
      if (!seen.contains(start)) {
        var comp = List(start)
        val q = scala.collection.mutable.Queue(start)
        seen(start) = -1
        while (q.nonEmpty) {
          val x = q.dequeue()
          adj(x).foreach { y =>
            if (!seen.contains(y)) { seen(y) = -1; comp ::= y; q += y }
          }
        }
        val lbl = comp.min
        comp.foreach(n => seen(n) = lbl)
      }
    }
    seen.toMap
  }

  test("hand case: two components, a chain and a triangle with dup edges") {
    val edges = Seq[(Long, Long)](
      (5L, 3L), (3L, 9L),            // chain 3-5-9 -> min 3
      (10L, 12L), (12L, 11L), (11L, 10L), (10L, 12L)) // triangle -> min 10
    val got = viaExpr(edges)
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("self-loops and directed duplicates keep min-label semantics") {
    val edges = Seq[(Long, Long)]((7L, 7L), (2L, 4L), (4L, 2L))
    assert(viaExpr(edges) == Map(7L -> 7L, 2L -> 2L, 4L -> 2L))
  }

  test("seeded random graphs match a BFS reference") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val n = 40 + rnd.nextInt(60)
      val edges = (1 to 120).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }
      assert(viaExpr(edges) == viaBfs(edges))
    }
  }

  test("empty edge array yields an empty labeling") {
    import spark.implicits._
    val out = Seq.empty[(Long, Long)].toDF("a", "b")
      .agg(collect_list(struct(col("a"), col("b"))).as("es"))
      .select(CcMinLabels.of(col("es")).as("ls"))
      .collect()
    assert(out.head.getSeq[Row](0).isEmpty)
  }
}
