package graft.llm

import graft.SparkSuite
import Multimodal._

/** Binary-column plumbing tests: the codec is a stub, the Spark-side
  * schema/batching/feature shape is real (SURVEY.md extension list). */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("decode stub: deterministic header parse + frame count") {
    val bytes = "hello multimodal world".getBytes("UTF-8")
    val (w, h, f) = decodeStub(bytes)
    assert((w, h, f) == decodeStub(bytes)) // deterministic
    assert(w >= 1 && w <= 1920 && h >= 1 && h <= 1080 && f >= 1)
  }

  test("byte histogram is an L1-normalized 16-bin feature vector") {
    val feats = byteHistogram("abcabc".getBytes("UTF-8"))
    assert(feats.length == 16)
    assert(math.abs(feats.sum - 1.0) < 1e-9)
  }

  test("frame sampling takes every k-th 16-byte frame") {
    val bytes = Array.tabulate[Byte](100)(_.toByte)
    val frames = frameSample(bytes, 2)
    assert(frames.length == 4) // 7 frames total, indices 0,2,4,6
    assert(frames(0).toSeq == bytes.slice(0, 16).toSeq)
  }

  test("resize stub: exact target shape, deterministic, degenerate-safe") {
    val img = Array.tabulate[Byte](64 * 48)(_.toByte)
    val small = resizeStub(img, 64, 48, 16, 12)
    assert(small.length == 16 * 12)
    assert(small.toSeq == resizeStub(img, 64, 48, 16, 12).toSeq)
    // upscale + short payload both stay in bounds
    assert(resizeStub(Array[Byte](1, 2), 64, 48, 8, 8).length == 64)
    intercept[IllegalArgumentException](resizeStub(img, 64, 48, 0, 5))
  }

  test("partition-batched decode: typed end-to-end over documents") {
    val out = decode(mediaFromDocuments(spark, sfDir)).collect()
    assert(out.nonEmpty)
    assert(out.forall(d => d.features.length == 16))
    assert(out.forall(d => d.width >= 1 && d.height >= 1 && d.n_frames >= 1))
    // re-run equality (no nondeterminism through mapPartitions)
    val again = decode(mediaFromDocuments(spark, sfDir)).collect()
    assert(out.map(_.doc_id).sorted.toSeq == again.map(_.doc_id).sorted.toSeq)
  }

  test("decodedTable query surface returns features + fold sum") {
    val df = Multimodal.decodedTable(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => math.abs(r.getAs[Double]("feat_sum") - 1.0) < 1e-9))
  }
}
