package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TopKFreqSpec extends SparkSuite {
  import spark.implicits._

  test("exact when capacity covers the key space") {
    val data = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c")
    val rows = data.toDF("w")
      .agg(TopKFreqAgg.topkFreq(col("w"), 2, 16).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.value"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("a", 30L, 0L), ("b", 20L, 0L)))
  }

  test("space-saving guarantees under eviction: presence + overestimate") {
    // skewed stream, capacity 4 << 20 distinct: heavy hitters with count
    // > N/capacity MUST be present, and their estimates must bracket the
    // true count: est - err <= true <= est
    val heavy = Seq.fill(500)("hot1") ++ Seq.fill(300)("hot2")
    val tail = (0 until 200).flatMap(i => Seq(s"cold$i"))
    val data = new scala.util.Random(11).shuffle(heavy ++ tail)
    val b = new SpaceSaving(4)
    data.foreach(v => b.add(v))
    val top = b.topK(4).map { case (v, c, e) => v -> (c, e) }.toMap
    assert(top.contains("hot1") && top.contains("hot2"), top)
    val n = data.size
    Seq("hot1" -> 500L, "hot2" -> 300L).foreach { case (v, truth) =>
      assert(truth > n / 4, "test setup: must be a guaranteed hitter")
      val (est, err) = top(v)
      assert(est >= truth && est - err <= truth, s"$v est=$est err=$err")
    }
  }

  test("merge keeps the guarantees (partial buffers combined)") {
    val b1 = new SpaceSaving(4)
    val b2 = new SpaceSaving(4)
    (1 to 100).foreach(_ => b1.add("x"))
    (1 to 60).foreach(_ => b2.add("x"))
    (1 to 80).foreach(_ => b2.add("y"))
    (0 until 50).foreach(i => (if (i % 2 == 0) b1 else b2).add(s"z$i"))
    b1.mergeIn(b2)
    val top = b1.topK(2).map { case (v, c, e) => v -> (c, e) }.toMap
    assert(top.contains("x") && top.contains("y"))
    assert(top("x")._1 >= 160L && top("x")._1 - top("x")._2 <= 160L)
    assert(top("y")._1 >= 80L && top("y")._1 - top("y")._2 <= 80L)
  }

  test("SQL registration and serialization across a real shuffle") {
    val data = (Seq.fill(40)("p") ++ Seq.fill(25)("q") ++
      (0 until 30).map(i => s"r$i"))
    data.toDF("w").repartition(8).createOrReplaceTempView("tkf_in")
    val rows = spark.sql(
      "SELECT topk_freq(w, 2, 64) AS tk FROM tkf_in")
      .select(explode(col("tk")).as("e"))
      .select(col("e.value"), col("e.est"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // capacity 64 > 32 distinct: exact despite 8-way partial buffers
    assert(rows.toSeq == Seq(("p", 40L), ("q", 25L)))
  }
}
