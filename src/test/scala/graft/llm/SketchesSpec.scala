package graft.llm

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.util.sketch.CountMinSketch

/** Sketch accuracy gates: the CMS must overestimate by at most εN with
  * high probability, and the HLL estimate must land near the exact count. */
class SketchesSpec extends SparkSuite {

  test("count-min sketch: point estimates bounded by eps * N") {
    val rows = Sketches.cmsRaw(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val exact = graft.core.Tables.events(spark, sfDir)
      .groupBy("event_type", "user_id").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val n = r.getAs[Long]("n_obs")
      val bytes = r.getAs[String]("cms_hex")
        .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      val sk = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      exact.collect { case ((`et`, uid), cnt) =>
        val est = sk.estimateCount(uid)
        assert(est >= cnt, s"CMS never underestimates: $et/$uid $est < $cnt")
        assert(est <= cnt + math.ceil(0.01 * n).toLong + 1,
          s"CMS overestimate beyond eps*N: $et/$uid est=$est cnt=$cnt n=$n")
      }
    }
  }

  test("datasketches HLL distinct within 5% of exact per language") {
    Sketches.hllRaw(spark, sfDir).collect().foreach { r =>
      val approx = r.getAs[Long]("hll_words").toDouble
      val exact = r.getAs[Long]("exact_words").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"lang=${r.getAs[String]("lang")} approx=$approx exact=$exact")
    }
  }

  test("sketches are deterministic across runs (mergeable, seeded)") {
    def snap(): Seq[String] =
      Sketches.cmsRaw(spark, sfDir).collect()
        .map(_.getAs[String]("cms_hex")).toSeq
    assert(snap() == snap())
  }

  test("registry accuracy flags are all true (what the oracle asserts)") {
    assert(SparkEntry.queries("sketch_cms")(spark, sfDir).collect()
      .forall(_.getAs[Boolean]("cms_ok")))
    assert(SparkEntry.queries("sketch_hll")(spark, sfDir).collect()
      .forall(_.getAs[Boolean]("hll_ok")))
    SparkEntry.queries("sketch_kmv_setops")(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Boolean]("union_ok") && r.getAs[Boolean]("inter_ok"),
        s"KMV bound flag false: $r")
    }
  }

  test("KMV set ops discriminate disjoint, partial, and identical overlaps") {
    // the sf fixture's user sets are identical across event types, so it
    // cannot show the estimator DISCRIMINATES — craft three regimes:
    // disjoint (a∩b=∅), half-overlap (a∩c=200 of 400), identical (a≡d)
    import spark.implicits._
    val dir = graft.core.Fixtures.path("kmv_events")
    val mk = (t: String, ids: Range) => ids.map(i =>
      (i.toLong, 1000000000L + i.toLong, i.toLong, t, 1.0,
        """{"k":1}"""))
    (mk("a", 0 until 400) ++ mk("b", 400 until 800) ++
      mk("c", 200 until 600) ++ mk("d", 0 until 400))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("sketch_kmv_setops")(spark, dir).collect()
      .map(r => (r.getAs[String]("ta"), r.getAs[String]("tb")) ->
        (r.getAs[Long]("exact_inter"), r.getAs[Double]("est_inter"),
          r.getAs[Boolean]("union_ok"), r.getAs[Boolean]("inter_ok"))).toMap
    assert(rows.values.forall(v => v._3 && v._4),
      s"KMV bound flag false on the crafted corpus: $rows")
    val (_, estAB, _, _) = rows(("a", "b"))   // disjoint
    val (_, estAC, _, _) = rows(("a", "c"))   // half overlap
    val (_, estAD, _, _) = rows(("a", "d"))   // identical
    assert(estAB < estAC && estAC < estAD,
      s"intersection estimates do not order with true overlap: " +
        s"disjoint=$estAB half=$estAC identical=$estAD")
  }
}
