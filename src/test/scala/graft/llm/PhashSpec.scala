package graft.llm

import graft.{SparkEntry, SparkSuite}
import graft.llm.Multimodal._

/** The image-dedup member of the multimodal family: an 8×8 average-hash
  * over the real BMP decode, then banded-Hamming near-dup pairs. The spec
  * grades the hash against an independent naive reimplementation, the
  * planted-group recall of the pairs query, and the banding/cap plan
  * properties that carry the 100 TB claim. */
class PhashSpec extends SparkSuite {

  /** Independent naive aHash: decode via a straight (x, y, c) pixel read
    * rather than phashOf's offset walk. BMP rows are stored bottom-up, so
    * stored row sy is image row h-1-sy — the signature samples STORED
    * order (the bmpResize convention), so the naive read flips y. */
  private def naiveHash(w: Int, h: Int,
      pixel: (Int, Int, Int) => Int): (Seq[Long], Long) = {
    val lum = for (i <- 0 until 64) yield {
      val sx = (i % 8) * w / 8
      val sy = (i / 8) * h / 8
      (0 until 3).map(c => pixel(sx, h - 1 - sy, c).toLong).sum
    }
    val total = lum.sum
    val bits = lum.map(l => l * 64 > total)
    val bands = (0 until 4).map { k =>
      (0 until 16).map(j => if (bits(16 * k + j)) 1L << j else 0L).sum
    }
    (bands, bits.count(identity).toLong)
  }

  test("phashOf matches a naive reimplementation across shapes") {
    for ((w, h) <- Seq((1, 1), (4, 3), (8, 8), (16, 5), (13, 7))) {
      val pixel = (x: Int, y: Int, c: Int) => (x * 31 + y * 17 + c * 7 + w) % 256
      val got = phashOf(encodeBmp24(w, h, pixel))
      val (bands, n) = naiveHash(w, h, pixel)
      assert(Seq(got.b0, got.b1, got.b2, got.b3) == bands, s"bands at ${w}x$h")
      assert(got.n_bits == n, s"n_bits at ${w}x$h")
      assert(Seq(got.b0, got.b1, got.b2, got.b3)
        .forall(b => b >= 0 && b <= 0xffffL), "bands stay 16-bit")
    }
  }

  test("flat image hashes to all-zero bits (nothing above the mean)") {
    val got = phashOf(encodeBmp24(5, 4, (_, _, _) => 99))
    assert(got.b0 == 0 && got.b1 == 0 && got.b2 == 0 && got.b3 == 0)
    assert(got.n_bits == 0)
  }

  test("identical images hash identically; a sparse stripe flip moves few bits") {
    val base = (x: Int, y: Int, c: Int) => (x * 53 + y * 11 + c) % 256
    val a = phashOf(encodeBmp24(12, 6, base))
    val b = phashOf(encodeBmp24(12, 6, base))
    assert(a == b)
    val flipped = phashOf(encodeBmp24(12, 6, (x, y, c) =>
      if ((x + y) % 9 == 0) 255 - base(x, y, c) else base(x, y, c)))
    val ham = Seq(a.b0 ^ flipped.b0, a.b1 ^ flipped.b1,
      a.b2 ^ flipped.b2, a.b3 ^ flipped.b3)
      .map(java.lang.Long.bitCount(_).toLong).sum
    assert(ham < 32, s"stripe flip moved $ham of 64 bits")
  }

  test("malformed payloads fail loudly") {
    intercept[IllegalArgumentException](phashOf(Array[Byte](1, 2, 3)))
    val ok = encodeBmp24(4, 4, (_, _, _) => 7)
    intercept[IllegalArgumentException](phashOf(ok.dropRight(8)))
  }

  test("registry phash query emits one signature per fixture image") {
    val rows = SparkEntry.queries("multimodal_phash")(spark, sfDir).collect()
    assert(rows.length == 150)
    assert(rows.forall(r =>
      (1 to 4).forall(i => r.getLong(i) >= 0 && r.getLong(i) <= 0xffffL)))
  }

  test("pairs query recalls planted within-group dups and respects the radius") {
    val rows = SparkEntry.queries("multimodal_phash_pairs")(spark, sfDir).collect()
    assert(rows.nonEmpty, "fixture must yield near-dup pairs")
    assert(rows.forall(_.getLong(2) <= PhashHammingMax))
    // planted structure: a healthy share of pairs joins two variants of
    // the same group (doc/3); band blocking may miss some and degenerate
    // signatures may add cross-group pairs, but the signal must dominate
    val within = rows.count(r => r.getLong(0) / 3 == r.getLong(1) / 3)
    assert(within * 2 > rows.length,
      s"within-group pairs $within of ${rows.length}")
    assert(within >= 20, s"planted recall too low: $within groups matched")
  }

  test("groups: components agree with pairs, canonical is the min member") {
    val pairs = SparkEntry.queries("multimodal_phash_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val groups = SparkEntry.queries("multimodal_phash_groups")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(groups.length == 150, "every fixture image is labeled")
    val cluster = groups.map(g => g._1 -> g._2).toMap
    // every near-dup pair landed in one component
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a, $b) split across clusters")
    }
    // the label IS the component min, and exactly that member is canonical
    groups.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._1).min == c, s"cluster $c not the min member")
      assert(members.count(_._3) == 1 && members.find(_._3).get._1 == c)
    }
    // planted structure: a healthy number of multi-image components
    val multi = groups.groupBy(_._2).count(_._2.length > 1)
    assert(multi >= 15, s"only $multi non-singleton components")
  }

  test("pairs plan is band-blocked: no cartesian, caps applied") {
    val df = SparkEntry.queries("multimodal_phash_pairs")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "phash pairs must join on band buckets, never all-pairs")
  }
}
