package graft.llm

import graft.{SparkEntry, SparkSuite}
import graft.llm.Multimodal._

/** The video twin of BmpSpec/WavSpec: a genuine YUV4MPEG2 encoder/parser
  * pair — dims and fps are read from the actual parameter line, every
  * FRAME marker is validated, malformed payloads fail loudly, and the
  * registry frame-sample query runs the fixture end-to-end. */
class Y4mSpec extends SparkSuite {

  test("encode/sample round-trip: every-1 sampling sums all plane bytes") {
    val (w, h, fps, n) = (3, 2, 25, 4)
    val pix = (f: Int, t: Int) => (f * 19 + t * 7) % 256
    val s = sampleY4m(encodeY4m(w, h, fps, n, pix), 1)
    assert(s.width == w && s.height == h && s.fps == fps && s.n_frames == n)
    assert(s.n_sampled == n)
    val all = (for { f <- 0 until n; t <- 0 until 3 * w * h }
      yield pix(f, t).toLong).sum
    assert(s.sample_sum == all)
  }

  test("every-3 sampling takes frames 0,3,6,... only") {
    val (w, h, n) = (2, 2, 8)
    val pix = (f: Int, t: Int) => (f * 100 + t) % 256
    val s = sampleY4m(encodeY4m(w, h, 30, n, pix), 3)
    assert(s.n_frames == n && s.n_sampled == 3) // frames 0, 3, 6
    val exp = (for { f <- Seq(0, 3, 6); t <- 0 until 3 * w * h }
      yield pix(f, t).toLong).sum
    assert(s.sample_sum == exp)
  }

  test("zero-frame stream parses to empty sample, not a crash") {
    val s = sampleY4m(encodeY4m(4, 3, 24, 0, (_, _) => 0), 3)
    assert(s.n_frames == 0 && s.n_sampled == 0 && s.sample_sum == 0)
  }

  test("parser reads the header, not assumptions: dims from the text line") {
    // same byte count can encode 6x1 or 1x6 — dims must come from W/H
    val a = sampleY4m(encodeY4m(6, 1, 24, 2, (f, t) => f + t), 1)
    val b = sampleY4m(encodeY4m(1, 6, 24, 2, (f, t) => f + t), 1)
    assert(a.width == 6 && a.height == 1 && b.width == 1 && b.height == 6)
    assert(a.sample_sum == b.sample_sum) // identical plane bytes
  }

  test("malformed payloads fail loudly") {
    intercept[IllegalArgumentException](sampleY4m(Array[Byte](1, 2, 3), 3))
    val ok = encodeY4m(2, 2, 25, 3, (_, _) => 1)
    // corrupt the second frame's marker
    val hdrLen = ok.indexOf('\n'.toByte) + 1
    val bad = ok.clone()
    bad(hdrLen + (6 + 12)) = 'X'.toByte
    intercept[IllegalArgumentException](sampleY4m(bad, 3))
    // truncated mid-frame
    intercept[IllegalArgumentException](sampleY4m(ok.dropRight(5), 3))
    // non-444 chroma tag rejected
    val c420 = new String(ok, "ISO-8859-1").replace(" C444", " C420")
      .getBytes("ISO-8859-1")
    intercept[IllegalArgumentException](sampleY4m(c420, 3))
  }

  test("registry frame-sample query runs over the fixture end-to-end") {
    val rows = SparkEntry.queries("multimodal_y4m_frames")(spark, sfDir).collect()
    assert(rows.length == 200)
    // n_sampled == ceil(n_frames / 3) on every row
    assert(rows.forall(r => r.getLong(5) == (r.getLong(4) + 2) / 3))
    // doc 0: 1x1, 24 fps, 1 frame of bytes (t*3 % 256): 0+3+6 = 9
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getLong(1) == 1L && r0.getLong(2) == 1L && r0.getLong(3) == 24L)
    assert(r0.getLong(4) == 1L && r0.getLong(6) == 9L)
  }

  test("scene cuts: constructed jumps land at the exact frame indices") {
    // 2x2 C444, fb = 12 bytes/frame; per-frame constant pixels so
    // frame sums are value*12 and deltas are exact
    val vals = Array(0, 0, 100, 100, 0)
    val clip = encodeY4m(2, 2, 25, vals.length, (f, _) => vals(f))
    val sc = sceneY4m(clip)
    assert(sc.n_frames == 5 && sc.n_deltas == 4)
    // deltas: 0, 1200, 0, 1200; thr = 8*12 = 96
    assert(sc.n_cuts == 2 && sc.max_delta == 1200L)
    assert(sc.first_cut.contains(2L)) // first jump is INTO frame 2
  }

  test("scene cut threshold is strict: == CutPerByte/byte is not a cut") {
    // per-byte delta exactly 8 -> frame delta 96 == thr -> no cut;
    // per-byte 9 -> 108 > 96 -> cut
    val at = sceneY4m(encodeY4m(2, 2, 25, 2, (f, _) => f * 8))
    assert(at.n_cuts == 0 && at.first_cut.isEmpty && at.max_delta == 96L)
    val over = sceneY4m(encodeY4m(2, 2, 25, 2, (f, _) => f * 9))
    assert(over.n_cuts == 1 && over.first_cut.contains(1L) &&
      over.max_delta == 108L)
  }

  test("scene cuts: single-frame and empty clips have no deltas") {
    val one = sceneY4m(encodeY4m(3, 2, 24, 1, (_, t) => t))
    assert(one.n_frames == 1 && one.n_deltas == 0 && one.n_cuts == 0 &&
      one.max_delta == 0L && one.first_cut.isEmpty)
    val zero = sceneY4m(encodeY4m(3, 2, 24, 0, (_, _) => 0))
    assert(zero.n_frames == 0 && zero.n_deltas == 0 && zero.first_cut.isEmpty)
  }

  test("registry scene query: fixture carries real cuts, stats cohere") {
    val rows = SparkEntry.queries("multimodal_y4m_scenes")(spark, sfDir).collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val (nf, nd, nc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nd == math.max(0L, nf - 1), s"doc ${r.getLong(0)} deltas")
      assert(nc <= nd, "cuts bounded by deltas")
      if (nc > 0) {
        val fc = r.getLong(5)
        assert(fc >= 1 && fc <= nd, "first cut is a valid 1-based delta")
      } else assert(r.isNullAt(5), "cutless clip has NULL first_cut")
    }
    // the threshold must split the fixture non-trivially, both ways
    val withCuts = rows.count(_.getLong(3) > 0)
    assert(withCuts > 0 && withCuts < 200, s"degenerate fixture: $withCuts")
  }
}
