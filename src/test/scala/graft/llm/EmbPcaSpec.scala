package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Embedding covariance + top-PC power iteration (llm/EmbPca.scala):
  * the exact integer covariance must equal an independent in-memory
  * recompute, and the k-step iteration must actually recover the top
  * principal component (|cos| vs a long-run double-precision reference)
  * on a corpus WITH a dominant direction — the regime the operator
  * exists for. */
class EmbPcaSpec extends SparkSuite {

  /** Crafted corpus: 40 vectors in dim 6 = strong direction d1 with
    * ±noise on the others. λ1 ≫ λ2, so 8 rounds converge hard. */
  private def craftedDir(): String = {
    val sess = spark
    import sess.implicits._
    val d1 = Array(0.6f, 0.5f, 0.4f, 0.3f, 0.2f, 0.1f)
    val rng = new scala.util.Random(7)
    val rows = (0 until 40).map { i =>
      val scale = (rng.nextDouble() * 4 - 2).toFloat
      val v = d1.map(_ * scale)
      // small orthogonal-ish jitter
      val jit = Array.fill(6)((rng.nextDouble() * 0.1 - 0.05).toFloat)
      (i.toLong, v.zip(jit).map { case (a, b) => a + b }, i % 3)
    }
    val dir = graft.core.Fixtures.path("pca")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** Independent reference: quantize like the engine, exact integer
    * covariance, then 500 double-precision power iterations. */
  private def reference(dir: String): (Map[(Int, Int), Long], Array[Double]) = {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(f => math.floor(f.toDouble * 1e6 + 0.5).toLong))
    val dim = vecs.head.length
    val n = vecs.length.toLong
    val t = Array.ofDim[Long](dim)
    vecs.foreach(v => (0 until dim).foreach(j => t(j) += v(j)))
    val qm = t.map(tj => math.floor(tj.toDouble / n + 0.5).toLong)
    val cov = scala.collection.mutable.Map.empty[(Int, Int), Long]
    for (j <- 0 until dim; k <- j until dim) {
      var s = 0L
      vecs.foreach(v => s += v(j) * v(k))
      cov((j, k)) = s - qm(j) * t(k) - qm(k) * t(j) + n * qm(j) * qm(k)
    }
    // long-run power iteration in plain doubles on cov/n
    val c = Array.tabulate(dim, dim) { (j, k) =>
      cov((math.min(j, k), math.max(j, k))).toDouble / n
    }
    var v = Array.fill(dim)(1.0)
    (1 to 500).foreach { _ =>
      val w = Array.tabulate(dim)(j => (0 until dim).map(k => c(j)(k) * v(k)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / norm)
    }
    (cov.toMap, v)
  }

  test("exact covariance matches the independent integer recompute") {
    val dir = craftedDir()
    val (covRef, _) = reference(dir)
    val got = graft.SparkEntry.queries("emb_covariance")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == covRef, s"covariance mismatch")
  }

  test("top-PC recovered on a dominant-direction corpus; unit norm") {
    val dir = craftedDir()
    val (_, vRef) = reference(dir)
    val pc = graft.SparkEntry.queries("emb_top_pc")(spark, dir)
      .orderBy(col("pos")).collect().map(_.getDouble(2))
    val norm = math.sqrt(pc.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6, s"|pc| = $norm")
    val cos = math.abs(pc.zip(vRef).map { case (a, b) => a * b }.sum)
    assert(cos > 0.999, s"cos(pc, reference) = $cos")
  }

  test("remove_top_pc: projections center to ~0 and align on a dominant-direction corpus") {
    val dir = craftedDir()
    val rows = graft.SparkEntry.queries("emb_remove_top_pc")(spark, dir)
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 40)
    // centered data: projections sum to ~0 (exact up to mean rounding)
    val projSum = rows.map(_._1).sum
    assert(math.abs(projSum) < 0.01, s"sum proj = $projSum")
    // the corpus IS one direction + jitter: most vectors align hard
    val meanAbsCos = rows.map(r => math.abs(r._3)).sum / rows.length
    assert(meanAbsCos > 0.9, s"mean |cos| = $meanAbsCos")
    // |proj| can never exceed the centered norm
    rows.foreach { case (p, n, _) => assert(math.abs(p) <= n + 1e-9, s"($p, $n)") }
  }

  test("top-2 deflation recovers both directions of a two-direction corpus") {
    val sess = spark
    import sess.implicits._
    // two orthogonal planted directions with separated strengths
    val d1 = Array(1.0f, 1.0f, 0.0f, 0.0f, 0.0f, 0.0f).map(_ / math.sqrt(2).toFloat)
    val d2 = Array(0.0f, 0.0f, 1.0f, -1.0f, 0.0f, 0.0f).map(_ / math.sqrt(2).toFloat)
    val rng = new scala.util.Random(11)
    val rows = (0 until 60).map { i =>
      val a = (rng.nextDouble() * 4 - 2).toFloat          // strong
      val b = (rng.nextDouble() * 1.6 - 0.8).toFloat      // weaker
      val v = Array.tabulate(6)(j =>
        d1(j) * a + d2(j) * b + (rng.nextDouble() * 0.02 - 0.01).toFloat)
      (i.toLong, v, i % 2)
    }
    val dir = graft.core.Fixtures.path("pca2")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("emb_top_pc2")(spark, dir)
      .orderBy(col("pos")).collect()
    val pc1 = out.map(_.getDouble(1))
    val pc2 = out.map(_.getDouble(2))
    def cosWith(p: Array[Double], dd: Array[Float]) = {
      val dot = p.zip(dd).map { case (x, y) => x * y.toDouble }.sum
      math.abs(dot) / math.sqrt(p.map(x => x * x).sum)
    }
    assert(cosWith(pc1, d1) > 0.99, s"pc1 vs d1: ${cosWith(pc1, d1)}")
    assert(cosWith(pc2, d2) > 0.99, s"pc2 vs d2: ${cosWith(pc2, d2)}")
    val ortho = pc1.zip(pc2).map { case (a, b) => a * b }.sum
    assert(math.abs(ortho) < 0.02, s"pc1·pc2 = $ortho")
  }

  test("whiten_top2: unit variance and decorrelation in the top-2 basis") {
    val sess = spark
    import sess.implicits._
    // same two-direction shape as the deflation test, separate fixture
    val d1 = Array(1.0f, 1.0f, 0.0f, 0.0f, 0.0f, 0.0f).map(_ / math.sqrt(2).toFloat)
    val d2 = Array(0.0f, 0.0f, 1.0f, -1.0f, 0.0f, 0.0f).map(_ / math.sqrt(2).toFloat)
    val rng = new scala.util.Random(23)
    val rows = (0 until 80).map { i =>
      val a = (rng.nextDouble() * 4 - 2).toFloat
      val b = (rng.nextDouble() * 1.6 - 0.8).toFloat
      val v = Array.tabulate(6)(j =>
        d1(j) * a + d2(j) * b + (rng.nextDouble() * 0.02 - 0.01).toFloat)
      (i.toLong, v, i % 2)
    }
    val dir = graft.core.Fixtures.path("pcaw")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("emb_whiten_top2")(spark, dir).collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    assert(out.length == 80)
    // whitening's defining property: population variance ~1 on both axes
    def popVar(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    val (w1, w2) = (out.map(_._1), out.map(_._2))
    assert(math.abs(popVar(w1) - 1.0) < 0.15, s"var(w1) = ${popVar(w1)}")
    assert(math.abs(popVar(w2) - 1.0) < 0.15, s"var(w2) = ${popVar(w2)}")
    // decorrelated axes
    val m1 = w1.sum / w1.length
    val m2 = w2.sum / w2.length
    val corr = w1.zip(w2).map { case (x, y) => (x - m1) * (y - m2) }.sum /
      (w1.length * math.sqrt(popVar(w1) * popVar(w2)))
    assert(math.abs(corr) < 0.1, s"corr(w1, w2) = $corr")
    // w1 tracks the planted strong coefficient, vector by vector
    val aCoef = rows.map { case (_, v, _) =>
      v.zip(d1).map { case (x, dd) => x * dd.toDouble }.sum }.toArray
    val ma = aCoef.sum / aCoef.length
    val corA = w1.zip(aCoef).map { case (x, y) => (x - m1) * (y - ma) }.sum /
      (w1.length * math.sqrt(popVar(w1) * popVar(aCoef)))
    assert(math.abs(corA) > 0.999, s"corr(w1, planted a) = $corA")
  }

  test("degenerate constant embeddings yield the zero vector, not NaN") {
    val sess = spark
    import sess.implicits._
    val dir = graft.core.Fixtures.path("pcaconst")
    (0 until 5).map(i => (i.toLong, Array(1.0f, 1.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val pc = graft.SparkEntry.queries("emb_top_pc")(spark, dir)
      .collect().map(_.getDouble(2))
    assert(pc.toSeq == Seq(0.0, 0.0, 0.0), pc.toSeq)
  }
}
