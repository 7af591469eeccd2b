package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.GraftFunctions.bc_div
import graft.state.Scaling

/** Property-based tests (SURVEY.md §5.2 item 3) driven by ScalaCheck
  * directly: bc_div's truncation bound, dedup idempotence, cosine algebra,
  * and window-average linearity. */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  test("bc_div truncation bound: 0 <= a/b - bc_div(a,b,2) <= 0.01") {
    val rows = Gen.listOfN(200,
      Gen.zip(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(1L, 10000L))).sample.get
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), bc_div(col("a"), col("b"), 2).as("d"))
      .collect()
    got.foreach { r =>
      val (a, b, d) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val exact = a.toDouble / b.toDouble
      assert(exact - d >= -1e-9 && exact - d <= 0.01 + 1e-9,
        s"a=$a b=$b d=$d exact=$exact")
    }
  }

  test("property: exact dedup is idempotent (dropDuplicates twice = once)") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(0, 20))) { xs =>
      val df = xs.toDF("x")
      val once = df.dropDuplicates("x").collect().map(_.getInt(0)).sorted.toSeq
      val twice = df.dropDuplicates("x").dropDuplicates("x")
        .collect().map(_.getInt(0)).sorted.toSeq
      once == twice
    })
  }

  test("property: int8 quantization reconstructs within a half-step") {
    // |v - q*scale/127| <= scale/254 + eps for every element: the defining
    // bound of symmetric absmax quantization — violated if the scale, the
    // rounding, or the saturation logic drifts
    check(Prop.forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(-10000, 10000).map(_ / 100.0f))) { vs =>
      val scale = vs.map(v => math.abs(v.toDouble)).max
      Prop.propBoolean(scale > 0) ==> {
        val qs = vs.map(v => math.floor(v.toDouble * 127.0 / scale + 0.5).toLong)
        qs.zip(vs).forall { case (q, v) =>
          math.abs(q) <= 127 &&
            math.abs(v.toDouble - q * scale / 127.0) <= scale / 254.0 + 1e-9
        }
      }
    })
  }

  test("property: cos(v,v)=1 and cosine symmetry via dot_product") {
    import graft.functions.DotProduct.dot
    check(Prop.forAll(
      Gen.listOfN(16, Gen.chooseNum(-100, 100).map(_ / 10.0)),
      Gen.listOfN(16, Gen.chooseNum(-100, 100).map(_ / 10.0))) { (a, b) =>
      Prop.propBoolean(a.exists(_ != 0.0) && b.exists(_ != 0.0)) ==> {
        val df = Seq((a, b)).toDF("a", "b")
          .select(
            (dot(col("a"), col("a"))).as("aa"),
            (dot(col("a"), col("b"))).as("ab"),
            (dot(col("b"), col("a"))).as("ba"))
        val r = df.collect()(0)
        val selfCos = r.getDouble(0) /
          (math.sqrt(r.getDouble(0)) * math.sqrt(r.getDouble(0)))
        math.abs(selfCos - 1.0) < 1e-12 && r.getDouble(1) == r.getDouble(2)
      }
    })
  }

  test("property: window-average linearity — avg(c*x) = c*avg(x) over scaled events") {
    check(Prop.forAll(Gen.chooseNum(1, 9)) { c =>
      val base = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v")
      val a1 = base.groupBy("k").agg(avg(col("v") * c).as("m"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val a2 = base.groupBy("k").agg((avg(col("v")) * c).as("m"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      a1.keySet == a2.keySet &&
        a1.forall { case (k, v) => math.abs(v - a2(k)) < 1e-9 }
    })
  }

  test("property: shingle_ngrams equals a reference sliding window, any n") {
    // reference model: plain Scala tokenize + sliding — independent of both
    // the expression's byte-level loop and the HOF formulation it replaced
    def ref(text: String, n: Int): Seq[String] =
      text.split(" ").filter(_.nonEmpty).sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSeq
    val word = Gen.oneOf("a", "bb", "ccc", "δδ", "e-f", "", " ")
    val docGen = Gen.listOf(word).map(_.mkString(" "))
    check(Prop.forAll(docGen, Gen.chooseNum(1, 7)) { (doc, n) =>
      val got = Seq(doc).toDF("t")
        .select(graft.functions.Shingles.shingleNgrams(col("t"), n).as("s"))
        .as[Seq[String]].head()
      got == ref(doc, n)
    })
  }

  test("property: BMP encode/decode round-trips any dims and pixel function") {
    import graft.llm.Multimodal
    check(Prop.forAll(Gen.chooseNum(1, 24), Gen.chooseNum(1, 12),
      Gen.chooseNum(0, 255)) { (w, h, seed) =>
      val px = (x: Int, y: Int, c: Int) => (seed + x * 7 + y * 11 + c) % 256
      val d = Multimodal.decodeBmp(Multimodal.encodeBmp24(w, h, px))
      val expected = (for {
        y <- 0 until h; x <- 0 until w; c <- 0 until 3
      } yield px(x, y, c).toLong).sum
      d.width == w && d.height == h && d.px_sum == expected
    })
  }

  test("property: WAV encode/decode round-trips any format and samples") {
    import graft.llm.Multimodal
    check(Prop.forAll(Gen.chooseNum(1, 2), Gen.chooseNum(1, 48000),
      Gen.chooseNum(0, 200), Gen.chooseNum(0, 255)) { (ch, rate, n, seed) =>
      val s = (i: Int, c: Int) => (seed + i * 13 + c * 5) % 256
      val d = Multimodal.decodeWav(Multimodal.encodeWav8(ch, rate, n, s))
      val flat = for { i <- 0 until n; c <- 0 until ch } yield s(i, c).toLong
      d.channels == ch && d.sample_rate == rate && d.n_samples == n &&
        d.amp_sum == flat.sum &&
        d.amp_peak == (if (flat.isEmpty) 0L else flat.max) &&
        d.duration_ms == n.toLong * 1000 / rate
    })
  }

  test("property: scaling trace replay is prefix-consistent (determinism)") {
    check(Prop.forAll(Gen.listOfN(10, Gen.chooseNum(0, 100))) { avgs =>
      val events = avgs.zipWithIndex.map { case (a, i) =>
        Scaling.WindowAvg("j", 300L * (i + 1), a.toDouble) }
      val full = Scaling.run(Scaling.referenceRules,
        Scaling.referenceConstraints,
        Scaling.ClusterState(1, Map.empty), events)._2
      val (midSt, firstHalf) = Scaling.run(Scaling.referenceRules,
        Scaling.referenceConstraints,
        Scaling.ClusterState(1, Map.empty), events.take(5))
      val secondHalf = Scaling.run(Scaling.referenceRules,
        Scaling.referenceConstraints, midSt, events.drop(5))._2
      full == firstHalf ++ secondHalf
    })
  }
}
