package graft.llm

import graft.{SparkEntry, SparkSuite}

/** Exact-integer Viterbi subword segmentation: the DP is graded against
  * brute-force enumeration of every segmentation, the packed-key tie
  * rule is pinned, and the corpus guard fails loudly. */
class SubwordSpec extends SparkSuite {
  import org.apache.spark.sql.functions._

  /** All segmentations of `w` into pieces of length 1..MaxPieceLen. */
  private def allSegs(w: String): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(Subword.MaxPieceLen, w.length)).flatMap { l =>
      allSegs(w.drop(l)).map(w.take(l) +: _)
    }

  test("DP equals brute-force best (max score, then fewest pieces)") {
    // adversarial score map: every substring scored by a hash-ish rule so
    // ties and inversions both occur
    def score(p: String): Long =
      (p.map(_.toInt).sum % 7) * 1000L + p.length
    for (w <- Seq("a", "ab", "abc", "abcab", "zzzzzz", "abcdefgh", "aaaaabbbbb")) {
      val key = Subword.segmentKey(w, score)
      val (gotScore, gotNp) = (key / 64L, 63L - key % 64L)
      val best = allSegs(w).map(seg => (seg.map(score).sum, seg.length.toLong))
        .max(Ordering.Tuple2(Ordering.Long, Ordering.Long.reverse))
      assert(gotScore == best._1, s"score for '$w'")
      assert(gotNp == best._2, s"pieces for '$w' (score ties pick fewest)")
    }
  }

  test("frequent long pieces win over characters") {
    // "the" scored high, letters low: one piece beats three
    def score(p: String): Long = if (p == "the") 5000L else 1L + p.length
    val key = Subword.segmentKey("the", score)
    assert(key / 64L == 5000L && 63L - key % 64L == 1L)
  }

  test("registry query: per-doc invariants at survey scale") {
    val rows = SparkEntry.queries("text_unigram_segment")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, np) = (r.getLong(1), r.getLong(2))
      assert(np >= nw, s"doc ${r.getLong(0)}: fewer pieces than words")
      if (nw == 0) assert(r.isNullAt(4), "wordless doc must have NULL ratio")
      else assert(r.getDouble(4) >= 1.0)
    }
  }

  test("segmentPieces reconstructs a path consistent with the DP key") {
    def score(p: String): Long = (p.map(_.toInt).sum % 11) * 1000L + p.length
    for (w <- Seq("a", "abcab", "abcdefgh", "zzzzzzzzzzzz")) {
      val key = Subword.segmentKey(w, score)
      val pieces = Subword.segmentPieces(w, score)
      assert(pieces.mkString("") == w, "pieces concatenate to the word")
      assert(pieces.forall(_.length <= Subword.MaxPieceLen))
      assert(pieces.map(score).sum == key / 64L, "path score == DP score")
      assert(pieces.length.toLong == 63L - key % 64L, "path length == DP count")
    }
  }

  test("EM round agrees with segment on round 0 and keeps invariants") {
    val seg = SparkEntry.queries("text_unigram_segment")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val em = SparkEntry.queries("unigram_em_round")(spark, sfDir).collect()
    em.foreach { r =>
      val (doc, nw) = (r.getLong(0), r.getLong(1))
      // round 0 of the EM query IS the segment query's result
      assert(r.getLong(2) == seg(doc)._1, s"np_r0 mismatch for doc $doc")
      assert(r.getLong(4) == seg(doc)._2, s"score_r0 mismatch for doc $doc")
      assert(r.getLong(3) >= nw, "round-1 pieces per word >= 1")
    }
  }

  test("sharded interval-DP equals the broadcast DP row-for-row") {
    // same semantics, different physical path (squaring join rounds, no
    // driver map): any divergence is a bug in the composition algebra
    def rows(name: String) =
      SparkEntry.queries(name)(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    assert(rows("unigram_segment_sharded") == rows("text_unigram_segment"))
  }

  test("pruned vocabulary coarsens monotonically and stays total") {
    val full = SparkEntry.queries("text_unigram_segment")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pruned = SparkEntry.queries("unigram_prune")(spark, sfDir).collect()
    assert(pruned.nonEmpty)
    pruned.foreach { r =>
      val (doc, nw, np) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (fnw, fnp) = full(doc)
      assert(nw == fnw, s"doc $doc: pruning must not drop words")
      // singles always survive, so segmentation stays total; losing
      // pieces can only split words into MORE pieces, never fewer
      assert(np >= fnp, s"doc $doc: pruned segmentation got finer")
      if (nw > 0) assert(np >= nw, s"doc $doc: under one piece per word")
    }
  }

  test("words beyond the DP unroll fail loudly, not silently truncate") {
    val sess = spark
    import sess.implicits._
    val dir = graft.core.Fixtures.path("subword_long")
    Seq((0L, "a" * (Subword.MaxWordLen + 1), "en", "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      SparkEntry.queries("text_unigram_segment")(spark, dir).collect()
    }
    assert(e.getMessage.contains("DP unroll"))
  }
}
