package graft.llm

import graft.{SparkEntry, SparkSuite}
import graft.llm.Multimodal._

/** The real-codec multimodal path: a genuine 24bpp BMP encoder/parser
  * pair — the spec proves the parser reads actual header/pixel bytes
  * (not metadata), rejects malformed payloads, and that the registry
  * query decodes the generated fixture end-to-end. */
class BmpSpec extends SparkSuite {

  test("encode/decode round-trip recovers dims and exact pixel sum") {
    for ((w, h) <- Seq((1, 1), (3, 2), (4, 4), (16, 8), (5, 7))) {
      val px = (x: Int, y: Int, c: Int) => (x * 7 + y * 11 + c * 3) % 256
      val bytes = encodeBmp24(w, h, px)
      val d = decodeBmp(bytes)
      assert(d.width == w && d.height == h && d.n_px == w.toLong * h)
      val expected = (for {
        y <- 0 until h; x <- 0 until w; c <- 0 until 3
      } yield px(x, y, c).toLong).sum
      assert(d.px_sum == expected, s"${w}x$h")
      assert(d.mean_px == expected.toDouble / (w * h * 3))
    }
  }

  test("parser reads the header, not assumptions: row padding skipped") {
    // width 3 -> row stride 12 with 3 padding bytes; poison the padding
    // and the pixel sum must NOT change
    val bytes = encodeBmp24(3, 2, (_, _, _) => 10)
    val poisoned = bytes.clone()
    poisoned(54 + 9) = 0x7f.toByte // first row's padding region
    poisoned(54 + 10) = 0x7f.toByte
    poisoned(54 + 11) = 0x7f.toByte
    assert(decodeBmp(poisoned).px_sum == decodeBmp(bytes).px_sum)
  }

  test("malformed payloads fail loudly") {
    intercept[IllegalArgumentException](decodeBmp(Array[Byte](1, 2, 3)))
    val bad = encodeBmp24(2, 2, (_, _, _) => 0)
    bad(28) = 8 // 8bpp — unsupported variant must be rejected
    intercept[IllegalArgumentException](decodeBmp(bad))
    val truncated = encodeBmp24(4, 4, (_, _, _) => 1).take(60)
    intercept[IllegalArgumentException](decodeBmp(truncated))
  }

  test("resize at the source dims is the identity: out_sum == px_sum") {
    // outW==w, outH==h makes X*w/outW == X exactly — every pixel is
    // sampled once, so the resize checksum must equal the full decode sum
    val bytes = encodeBmp24(ResizeW, ResizeH, (x, y, c) => (x * 9 + y * 4 + c) % 256)
    assert(resizeBmpSum(bytes, ResizeW, ResizeH).out_sum == decodeBmp(bytes).px_sum)
  }

  test("1x1 upsample replicates the single pixel into every sample") {
    val bytes = encodeBmp24(1, 1, (_, _, c) => c * 5) // channels 0,5,10
    val r = resizeBmpSum(bytes, ResizeW, ResizeH)
    assert(r.out_sum == ResizeW.toLong * ResizeH * 15)
  }

  test("downsample picks floor-mapped source pixels (stored row order)") {
    val (w, h) = (16, 8)
    val px = (x: Int, y: Int, c: Int) => (x * 13 + y * 31 + c * 5) % 256
    val bytes = encodeBmp24(w, h, px)
    // independent replay: stored row sy holds logical row h-1-sy
    val expected = (for {
      yy <- 0 until ResizeH; xx <- 0 until ResizeW; c <- 0 until 3
    } yield px(xx * w / ResizeW, h - 1 - (yy * h / ResizeH), c).toLong).sum
    assert(resizeBmpSum(bytes, ResizeW, ResizeH).out_sum == expected)
  }

  test("resize rejects malformed payloads") {
    intercept[IllegalArgumentException](
      resizeBmpSum(Array[Byte](1, 2, 3), ResizeW, ResizeH))
    intercept[IllegalArgumentException](
      resizeBmpSum(encodeBmp24(4, 4, (_, _, _) => 1).take(60), ResizeW, ResizeH))
  }

  test("registry resize query runs over the fixture end-to-end") {
    val rows = SparkEntry.queries("multimodal_bmp_resize")(spark, sfDir).collect()
    assert(rows.length == 200)
    assert(rows.forall(r => r.getLong(3) == ResizeW && r.getLong(4) == ResizeH))
    // doc 0: 1x1 image, channels c*5 -> per-sample sum 15, 12 samples
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getLong(5) == ResizeW.toLong * ResizeH * 15)
  }

  test("histogram counts every pixel channel once, padding excluded") {
    // width 3 -> 3 padding bytes per row; poison them and the histogram
    // must not change (the decode tail-sum trick would be fooled here)
    val bytes = encodeBmp24(3, 2, (x, y, c) => (x * 16 + y * 48 + c) % 256)
    val poisoned = bytes.clone()
    poisoned(54 + 9) = 0xff.toByte
    val h = bmpHistOf(bytes)
    assert(h.hist.toSeq == bmpHistOf(poisoned).hist.toSeq)
    assert(h.hist.sum == 3L * 2 * 3 && h.n_px == 6)
    // independent replay of the binning
    val exp = new Array[Long](16)
    for (y <- 0 until 2; x <- 0 until 3; c <- 0 until 3)
      exp(((x * 16 + y * 48 + c) % 256) >> 4) += 1
    assert(h.hist.toSeq == exp.toSeq)
  }

  test("histogram mode_bin is the first argmax") {
    // all pixels constant 0 -> bin 0 holds everything, mode 0
    assert(bmpHistOf(encodeBmp24(4, 4, (_, _, _) => 0)).mode_bin == 0)
    // constant 255 -> bin 15
    assert(bmpHistOf(encodeBmp24(4, 4, (_, _, _) => 255)).mode_bin == 15)
    // exact tie between bins 2 and 9 -> first wins
    val tie = bmpHistOf(encodeBmp24(2, 1, (x, _, _) => if (x == 0) 0x20 else 0x90))
    assert(tie.hist(2) == 3 && tie.hist(9) == 3 && tie.mode_bin == 2)
  }

  test("registry histogram query runs over the fixture end-to-end") {
    // long-form surface: (doc_id, bin, n, n_px, mode_bin), 16 rows per doc
    val rows = SparkEntry.queries("multimodal_bmp_hist")(spark, sfDir).collect()
    assert(rows.length == 200 * 16)
    // every doc's 16 bin counts sum to 3*n_px (3 channels per pixel)
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      assert(rs.map(_.getLong(2)).sum == 3 * rs.head.getLong(3),
        s"doc $doc bin counts don't cover the channel bytes")
      assert(rs.map(_.getLong(1)).sorted.toSeq == (0L until 16L),
        s"doc $doc missing bins")
    }
  }

  test("registry query decodes the generated BMP fixture") {
    val rows = SparkEntry.queries("multimodal_bmp")(spark, sfDir).collect()
    assert(rows.length == 200)
    // doc 0: 1x1 image, pixels (c*5 % 256) for c=0,1,2 -> sum 15
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getLong(1) == 1L && r0.getLong(2) == 1L)
    assert(r0.getLong(4) == 15L)
    assert(rows.forall(r => r.getLong(3) == r.getLong(1) * r.getLong(2)))
  }

  test("gradient energy: constructed steps land exactly") {
    // 3x2, intensity = channel sum; step of +30/channel along x, +60 along y
    val e = bmpEdgesOf(encodeBmp24(3, 2, (x, y, _) => x * 30 + y * 60))
    // I(x,y) = 3*(30x + 60y): gx deltas 90 (4 of them), gy deltas 180 (3)
    assert(e.gx_sum == 4 * 90 && e.gy_sum == 3 * 180 && e.max_grad == 180)
    assert(e.edge_energy == 900 && e.sharpness_q3 == 900 * 1000 / 6)
    // flat image: zero everywhere
    val f = bmpEdgesOf(encodeBmp24(4, 4, (_, _, _) => 77))
    assert(f.edge_energy == 0 && f.max_grad == 0 && f.sharpness_q3 == 0)
  }

  test("gradient energy: 1-wide and 1-tall images drop the missing axis") {
    val col1 = bmpEdgesOf(encodeBmp24(1, 5, (_, y, _) => y * 10))
    assert(col1.gx_sum == 0 && col1.gy_sum == 4 * 30)
    val row1 = bmpEdgesOf(encodeBmp24(5, 1, (x, _, _) => x * 10))
    assert(row1.gy_sum == 0 && row1.gx_sum == 4 * 30)
  }

  test("registry edges query: blur ordering and degenerate dims hold") {
    val rows = SparkEntry.queries("multimodal_bmp_edges")(spark, sfDir).collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) + r.getLong(3), "energy = gx + gy")
      assert(r.getLong(6) == r.getLong(4) * 1000 / r.getLong(1))
      // a single first difference can never exceed the 765 intensity range
      assert(r.getLong(5) <= 765L)
    }
    // degenerate dims appear: 1x1 images (both axes gone — ids ≡ 0 mod 16
    // always have h = 1 too) and 1-tall rows with live gx
    assert(rows.exists(r => r.getLong(2) == 0 && r.getLong(3) == 0))
    assert(rows.exists(r => r.getLong(3) == 0 && r.getLong(2) > 0))
  }
}
