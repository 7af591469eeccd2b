package graft.operators

import graft.{SparkEntry, SparkSuite}
import graft.core.{Tables => T}

/** Frequent-itemset mining vs an independent in-memory A-priori. */
class MiningSpec extends SparkSuite {

  // brute-force reference over the collected fixture (sf0.001 is tiny)
  private lazy val ref: (Long, Map[String, Long], Map[(String, String), Long]) = {
    import org.apache.spark.sql.functions._
    val rows = T.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(T.part(spark, sfDir).select(col("p_partkey"),
        concat_ws("/", col("p_brand"), col("p_type")).as("it")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("it")).collect()
    val baskets = rows.groupBy(_.getLong(0))
      .map { case (_, rs) => rs.map(_.getString(1)).toSet }.toSeq
    val n = baskets.size.toLong
    val supp = baskets.flatten.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val freq = supp.filter { case (_, c) => c * 50 >= n }
    val pairCnt = baskets
      .flatMap { b =>
        val f = b.filter(freq.contains).toSeq.sorted
        for (i <- f.indices; j <- i + 1 until f.size) yield (f(i), f(j))
      }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    (n, freq, pairCnt)
  }

  test("mine_pairs equals the in-memory A-priori reference") {
    val (n, freq, pairCnt) = ref
    val got = SparkEntry.queries("mine_pairs")(spark, sfDir).collect()
    val expTop = pairCnt.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.take(25)
    assert(got.length == expTop.size)
    got.zip(expTop).foreach { case (r, ((a, b), c)) =>
      assert(r.getAs[String]("item_a") == a && r.getAs[String]("item_b") == b)
      assert(r.getAs[Long]("pair_cnt") == c)
      assert(r.getAs[Long]("supp_a") == freq(a))
      assert(r.getAs[Long]("supp_b") == freq(b))
      assert(r.getAs[Double]("lift") ==
        (c * n).toDouble / (freq(a) * freq(b)).toDouble)
    }
  }

  test("A-priori invariants: pair support bounded by item supports") {
    val (n, freq, _) = ref
    val got = SparkEntry.queries("mine_pairs")(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b) = (r.getAs[String]("item_a"), r.getAs[String]("item_b"))
      assert(a < b) // canonical orientation, no mirrored duplicates
      // both members frequent (the prune is sound) and pair ≤ min(items)
      assert(freq.contains(a) && freq.contains(b))
      assert(r.getAs[Long]("pair_cnt") <=
        math.min(r.getAs[Long]("supp_a"), r.getAs[Long]("supp_b")))
      assert(r.getAs[Long]("supp_a") * 50 >= n)
    }
  }

  test("rules: confidence = pair/antecedent, both directions, ranked") {
    val got = SparkEntry.queries("mine_assoc_rules")(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Double]("conf") ==
        r.getAs[Long]("pair_cnt").toDouble / r.getAs[Long]("supp_ante").toDouble)
      assert(r.getAs[Double]("conf") > 0.0 && r.getAs[Double]("conf") <= 1.0)
    }
    val confs = got.map(_.getAs[Double]("conf"))
    assert(confs.zip(confs.tail).forall { case (x, y) => x >= y })
  }
}
