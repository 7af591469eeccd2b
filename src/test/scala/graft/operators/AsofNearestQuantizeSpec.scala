package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** Semantics of the round-5 additions: nearest-direction as-of (q54) and
  * symmetric int8 embedding quantization. */
class AsofNearestQuantizeSpec extends SparkSuite {

  test("q54: nearest beats forward/backward on |delta|; purchases resolve to self") {
    val rows = SparkEntry.queries("q54_asof_nearest")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // a purchase event's nearest purchase is itself (delta 0)
    val purchases = rows.filter(_.getAs[String]("event_type") == "purchase")
    assert(purchases.nonEmpty)
    assert(purchases.forall(r =>
      !r.isNullAt(r.fieldIndex("nearest_purchase_value"))))
    // users with no purchase at all yield null for every event
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.values.foreach { evs =>
      val hasPurchase = evs.exists(_.getAs[String]("event_type") == "purchase")
      if (!hasPurchase)
        assert(evs.forall(_.isNullAt(evs.head.fieldIndex("nearest_purchase_value"))))
    }
  }

  test("quantize_int8: range bounded, absmax element saturates, zero vector safe") {
    import spark.implicits._
    val rows = SparkEntry.queries("emb_quantize_int8")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qMin, qMax) = (r.getAs[Long]("q_min"), r.getAs[Long]("q_max"))
      assert(qMin >= -127L && qMax <= 127L)
      // the absmax element quantizes to exactly +-127, so every nonzero
      // vector saturates at least once
      if (r.getAs[Double]("scale") > 0) assert(r.getAs[Long]("n_sat") >= 1L)
    }
    // zero vector: scale 0, all-zero digest (guard path, not in fixture)
    val z = Seq((0L, Array(0.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val dir = graft.core.Fixtures.path("zerovec")
    z.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val zr = SparkEntry.queries("emb_quantize_int8")(spark, dir).head()
    assert(zr.getAs[Double]("scale") == 0.0 && zr.getAs[Long]("q_sum") == 0L
      && zr.getAs[Long]("n_sat") == 0L)
  }
}
