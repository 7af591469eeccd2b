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
  }
}
