package graft.llm

import graft.{SparkEntry, SparkSuite}
import graft.llm.Multimodal._

/** The audio twin of BmpSpec: a genuine RIFF/8-bit-PCM encoder/parser
  * pair — header fields are read from actual bytes, malformed payloads
  * fail loudly, and the registry query decodes the fixture end-to-end. */
class WavSpec extends SparkSuite {

  test("encode/decode round-trip recovers format and exact amplitude stats") {
    for ((ch, rate, n) <- Seq((1, 8000, 1), (2, 16000, 25), (1, 24000, 50))) {
      val s = (i: Int, c: Int) => (i * 19 + c * 7) % 256
      val d = decodeWav(encodeWav8(ch, rate, n, s))
      assert(d.channels == ch && d.sample_rate == rate && d.n_samples == n)
      val flat = for { i <- 0 until n; c <- 0 until ch } yield s(i, c).toLong
      assert(d.amp_sum == flat.sum && d.amp_peak == flat.max)
      assert(d.duration_ms == n.toLong * 1000 / rate)
    }
  }

  test("zero-length clip parses to silence, not a crash") {
    val d = decodeWav(encodeWav8(1, 8000, 0, (_, _) => 0))
    assert(d.n_samples == 0 && d.amp_sum == 0 && d.amp_peak == 0 &&
      d.duration_ms == 0)
  }

  test("malformed payloads fail loudly") {
    intercept[IllegalArgumentException](decodeWav(Array[Byte](1, 2, 3)))
    val notPcm = encodeWav8(1, 8000, 4, (_, _) => 1)
    notPcm(20) = 3 // IEEE-float format tag — unsupported variant
    intercept[IllegalArgumentException](decodeWav(notPcm))
    val truncated = encodeWav8(2, 8000, 30, (_, _) => 1).take(50)
    intercept[IllegalArgumentException](decodeWav(truncated))
  }

  test("energy: constant-midpoint signal has exactly zero energy") {
    val d = wavEnergyOf(encodeWav8(1, 8000, 24, (_, _) => 128))
    assert(d.n_windows == 3 && d.energy_sum == 0 && d.energy_peak == 0)
    assert(d.peak_window == 0) // first argmax among all-zero windows
  }

  test("energy: constant offset gives W*ch*dev^2 per window; tail dropped") {
    // 2ch, 19 frames -> 2 full windows, 3 trailing frames ignored
    val d = wavEnergyOf(encodeWav8(2, 8000, 19, (_, _) => 138))
    assert(d.n_windows == 2)
    assert(d.energy_sum == 2L * EnergyWin * 2 * 100)
    assert(d.energy_peak == EnergyWin.toLong * 2 * 100)
    assert(d.peak_window == 0)
  }

  test("energy: independent replay of a ramp signal, first-argmax ties") {
    val (ch, n) = (2, 25)
    val s = (i: Int, c: Int) => (i * 19 + c * 7) % 256
    val d = wavEnergyOf(encodeWav8(ch, 8000, n, s))
    val wins = (0 until n / EnergyWin).map { j =>
      (for {
        i <- j * EnergyWin until (j + 1) * EnergyWin; c <- 0 until ch
      } yield { val v = s(i, c) - 128; v.toLong * v }).sum
    }
    assert(d.n_windows == wins.length && d.energy_sum == wins.sum)
    assert(d.energy_peak == wins.max && d.peak_window == wins.indexOf(wins.max))
  }

  test("energy: sub-window clip yields zero windows, sentinel peak index") {
    val d = wavEnergyOf(encodeWav8(1, 8000, EnergyWin - 1, (_, _) => 200))
    assert(d.n_windows == 0 && d.energy_sum == 0 && d.energy_peak == 0 &&
      d.peak_window == -1)
  }

  test("registry energy query runs over the fixture end-to-end") {
    val rows = SparkEntry.queries("multimodal_wav_energy")(spark, sfDir).collect()
    assert(rows.length == 200)
    // doc 0: mono, 10 samples of (i*17 % 256) -> one window over i=0..7
    val r0 = rows.find(_.getLong(0) == 0L).get
    val w0 = (0 until EnergyWin).map { i =>
      val v = (i * 17) % 256 - 128; v.toLong * v
    }.sum
    assert(r0.getLong(2) == 1L && r0.getLong(3) == w0 && r0.getLong(4) == w0)
    assert(r0.getLong(5) == 0L)
    // peak window is always a real index when any window exists
    assert(rows.forall(r => (r.getLong(2) == 0) == (r.getLong(5) == -1L)))
  }

  test("registry query decodes the generated WAV fixture") {
    val rows = SparkEntry.queries("multimodal_wav")(spark, sfDir).collect()
    assert(rows.length == 200)
    // doc 0: mono 8 kHz, 10 samples of (i*17 % 256)
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getLong(1) == 1L && r0.getLong(2) == 8000L && r0.getLong(3) == 10L)
    assert(r0.getLong(4) == (0 until 10).map(i => (i * 17) % 256).sum.toLong)
    // duration is floor(n*1000/rate) for every row
    assert(rows.forall(r => r.getLong(6) == r.getLong(3) * 1000 / r.getLong(2)))
  }

  test("silence runs: constructed pattern recovers exact run structure") {
    // mono: frames 0-2 silent(128), 3 loud, 4-5 silent, 6 loud, 7 silent
    // (160 deviates by exactly 32 — inclusive threshold keeps it silent)
    val pat = Array(128, 128, 128, 255, 130, 120, 0, 160)
    val s = wavSilenceOf(encodeWav8(1, 8000, pat.length, (i, _) => pat(i)))
    assert(s.n_frames == 8 && s.n_silent == 6)
    assert(s.n_runs == 3 && s.longest_run == 3 && s.lead_silence == 3)
    // threshold is inclusive: 128±32 silent, ±33 loud
    val edge = wavSilenceOf(encodeWav8(1, 8000, 2,
      (i, _) => if (i == 0) 128 + 32 else 128 + 33))
    assert(edge.n_silent == 1 && edge.lead_silence == 1 && edge.n_runs == 1)
  }

  test("silence runs: a stereo frame is silent only if EVERY channel is") {
    // ch0 always silent, ch1 loud on frame 1 -> frame 1 breaks the run
    val s = wavSilenceOf(encodeWav8(2, 8000, 3,
      (i, c) => if (c == 1 && i == 1) 255 else 128))
    assert(s.n_silent == 2 && s.n_runs == 2 && s.longest_run == 1)
    assert(s.lead_silence == 1)
  }

  test("silence runs: all-silent and no-silent clips hit the boundaries") {
    val all = wavSilenceOf(encodeWav8(1, 8000, 5, (_, _) => 128))
    assert(all.n_silent == 5 && all.n_runs == 1 && all.longest_run == 5 &&
      all.lead_silence == 5)
    val none = wavSilenceOf(encodeWav8(1, 8000, 5, (_, _) => 255))
    assert(none.n_silent == 0 && none.n_runs == 0 && none.longest_run == 0 &&
      none.lead_silence == 0)
  }

  test("registry silence query: fixture splits non-trivially") {
    val rows = SparkEntry.queries("multimodal_wav_silence")(spark, sfDir).collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val (nf, ns, nr, lg, ld) = (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))
      assert(ns <= nf && lg <= ns && ld <= lg, s"doc ${r.getLong(0)} bounds")
      assert((nr == 0) == (ns == 0), "runs iff silent frames")
      if (nr > 0) assert(ns <= nr * lg, "runs cover the silent frames")
    }
    val withLead = rows.count(_.getLong(6) > 0)
    assert(withLead > 0 && withLead < 200, s"degenerate lead split: $withLead")
  }
}
