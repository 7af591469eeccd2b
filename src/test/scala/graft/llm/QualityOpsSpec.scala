package graft.llm

import graft.{SparkEntry, SparkSuite}

/** Semantic invariants for the round-5 quality/chunking operators —
  * properties the oracle's hash compare can't express (it checks equality
  * with DuckDB, not that the numbers MEAN what the operator claims). */
class QualityOpsSpec extends SparkSuite {

  test("chunk_documents: stride prefixes reconstruct every document exactly") {
    // Lossless-coverage property: chunks start every `stride` chars, so
    // concatenating the first `stride` chars of each chunk (all of the
    // last) must rebuild the original text — no dropped or duplicated
    // suffixes, for every doc including ones shorter than one chunk.
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = SparkEntry.queries("chunk_documents")(spark, sfDir)
      .select("doc_id", "chunk_id", "chunk_text").collect()
      .groupBy(_.getLong(0))
    assert(chunks.keySet == docs.keySet)
    val stride = Pipeline.chunkStride
    chunks.foreach { case (id, rows) =>
      val ordered = rows.sortBy(_.getLong(1)).map(_.getString(2))
      val rebuilt = ordered.dropRight(1).map(_.take(stride)).mkString + ordered.last
      assert(rebuilt == docs(id), s"doc $id: reconstruction mismatch")
    }
  }

  test("dedup_containment: containment dominates jaccard; inclusion beats symmetry") {
    val rows = SparkEntry.queries("dedup_containment")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cont, jac) = (r.getAs[Double]("containment"), r.getAs[Double]("jaccard"))
      // |A∩B|/min ≥ |A∩B|/union always — a violation means the two
      // denominators came from different shingle sets
      assert(cont >= jac - 1e-9, s"containment $cont < jaccard $jac in $r")
      assert(cont >= 0.7, r.toString)
      val contained = r.getAs[Long]("contained_doc")
      assert(contained == r.getAs[Long]("doc_a") || contained == r.getAs[Long]("doc_b"))
    }
  }

  test("dedup_containment: a quoted-whole document is caught only by containment") {
    // the operator's reason to exist, demonstrated on a constructed
    // inclusion (the standard fixture's near-dups are all perturbation-
    // shaped, so containment ≈ jaccard there): doc 2 sits verbatim at the
    // head of doc 1, whose 400 extra words dilute Jaccard below every
    // symmetric near-dup threshold while containment stays ≈ 1
    import org.apache.spark.sql.functions.{col, length}
    import spark.implicits._
    val short = (1 to 80).map(i => s"w$i").mkString(" ")
    val long = short + " " + (1 to 400).map(i => s"x$i").mkString(" ")
    val other = (1 to 80).map(i => s"z$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_containment").toString
    Seq((1L, long, "en", "web"), (2L, short, "en", "web"), (3L, other, "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("dedup_containment")(spark, dir).collect()
    assert(rows.length == 1, rows.mkString(";"))
    assert(rows.head.getAs[Long]("contained_doc") == 2L)
    assert(rows.head.getAs[Double]("containment") >= 0.95, rows.head.toString)
    assert(rows.head.getAs[Double]("jaccard") < 0.5, rows.head.toString)
  }

  test("sample_mix_temperature: keep fraction non-increasing in corpus share") {
    // τ = 0.5 means q_l ∝ √n_l, so keep_frac ∝ 1/√n_l: the MORE a
    // language dominates the corpus, the harder it is downsampled —
    // exactly inverse to a uniform sample. Deterministic math property,
    // no statistical tolerance needed.
    val counts = graft.core.Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fracs = SparkEntry.queries("sample_mix_temperature")(spark, sfDir)
      .select("lang", "keep_frac").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(fracs.nonEmpty)
    for {
      (la, fa) <- fracs; (lb, fb) <- fracs
      if counts(la) < counts(lb)
    } assert(fa >= fb - 1e-9,
      s"$la (n=${counts(la)}) keep_frac $fa < $lb (n=${counts(lb)}) $fb")
    // every language must survive the downsampling — the tail is the
    // point of temperature sampling
    assert(fracs.keySet == counts.keySet)
  }

  test("chunk_documents: consecutive chunks overlap by size - stride") {
    val rows = SparkEntry.queries("chunk_documents")(spark, sfDir)
      .select("doc_id", "chunk_id", "chunk_text").collect()
      .groupBy(_.getLong(0)).values
    val (size, stride) = (Pipeline.chunkSize, Pipeline.chunkStride)
    rows.foreach { rs =>
      val ordered = rs.sortBy(_.getLong(1)).map(_.getString(2))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          // a's tail past the stride point is b's head (when a is full)
          if (a.length == size)
            assert(a.drop(stride) == b.take(size - stride))
        case _ =>
      }
    }
  }

  test("text_collocations: a bigram can't outnumber either of its words") {
    val rows = SparkEntry.queries("text_collocations")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cab, ca, cb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cab <= math.min(ca, cb), r.toString)
      assert(r.getDouble(5) > 0, r.toString)
    }
    // returned in lift-descending order
    val lifts = rows.map(_.getDouble(5))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }

  test("text_perplexity: cross-entropy sits between 0 and ln(corpus tokens)") {
    // h = -(1/n)Σ ln p(w): each p(w) ≥ 1/N so every term ≤ ln N; and
    // p(w) ≤ 1 keeps h non-negative (0 only for a single-word corpus).
    val rows = SparkEntry.queries("text_perplexity")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalTokens = rows.map(_.getLong(1)).sum.toDouble
    val bound = math.log(totalTokens) + 1e-6
    rows.foreach { r =>
      val h = r.getDouble(2)
      assert(h >= 0 && h <= bound, s"h=$h outside [0, $bound]: $r")
    }
  }

  test("text_perplexity: all-common-words doc scores lower than hapax doc") {
    val sess = spark
    import sess.implicits._
    val dir = graft.core.Fixtures.path("ppl")
    Seq(
      (1L, "the the the the", "en", "s", 15L),
      (2L, "zzyzx qwfp vexq jumbl", "en", "s", 21L),
      (3L, "the the qwfp the", "en", "s", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val h = SparkEntry.queries("text_perplexity")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(h(1L) < h(3L) && h(3L) < h(2L), h.toString)
  }

  test("dedup_tf_cosine: cosines are in (0, 1] and exact duplicates hit 1") {
    val sess = spark
    import sess.implicits._
    val dir = graft.core.Fixtures.path("tfcos")
    // two exact duplicates + one near-dup + one unrelated doc; duplicated
    // words keep the vectors non-trivial
    val a = "alpha beta gamma delta epsilon zeta eta theta alpha beta"
    Seq(
      (1L, a, "en", "s", a.length.toLong),
      (2L, a, "en", "s", a.length.toLong),
      (3L, a.replace("theta", "iota"), "en", "s", a.length.toLong),
      (4L, "one two three four five six seven eight nine ten", "en", "s", 50L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("dedup_tf_cosine")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getDouble(3)
      assert(c > 0 && c <= 1.0 + 1e-12, r.toString)
    }
    val dup = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(dup.exists(r => math.abs(r.getDouble(3) - 1.0) < 1e-12), rows.mkString("\n"))
  }

  test("metric_anomaly: every flagged row exceeds the threshold with a full-enough window") {
    val rows = SparkEntry.queries("metric_anomaly")(spark, sfDir).collect()
    rows.foreach { r =>
      val n = r.getLong(4)
      assert(n >= 10 && n <= 20, r.toString)
      assert(math.abs(r.getDouble(6)) > 2.5, r.toString)
    }
  }

  test("text_bm25: ranks contiguous, scores non-increasing, probe never retrieves itself") {
    val rows = SparkEntry.queries("text_bm25")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_doc")).foreach { case (q, rs) =>
      assert(q % 100 == 7, s"probe $q not from the declared probe set")
      val sorted = rs.sortBy(_.getAs[Long]("rn"))
      assert(sorted.map(_.getAs[Long]("rn")).toSeq == (1L to sorted.length).toSeq,
        s"probe $q: ranks not contiguous")
      sorted.foreach { r =>
        assert(r.getAs[Long]("doc_id") != q, s"probe $q retrieved itself")
        val nt = r.getAs[Long]("n_terms")
        assert(nt >= 1 && nt <= 3, r.toString)
        assert(r.getAs[Double]("score") > 0, r.toString)
      }
      val scores = sorted.map(_.getAs[Double]("score"))
      scores.sliding(2).foreach {
        case Array(a, b) => assert(a >= b - 1e-12, s"probe $q: scores not sorted")
        case _ =>
      }
    }
  }

  test("text_bm25: a doc sharing all the probe's distinctive terms ranks first") {
    val sess = spark
    import sess.implicits._
    val dir = graft.core.Fixtures.path("bm25")
    // probe 107 (doc_id % 100 == 7) asks its top-3 tf-idf terms — the
    // distinctive zebra/quagga/okapi, never the everywhere-word "the"
    // (idf 0). Doc 1 matches all three, doc 2 one, docs 3-4 none.
    Seq(
      (107L, "zebra quagga okapi zebra quagga okapi the the", "en", "s", 46L),
      (1L, "zebra quagga okapi the and some filler words here", "en", "s", 49L),
      (2L, "zebra the unrelated text with other words", "en", "s", 41L),
      (3L, "the completely different document about nothing", "en", "s", 47L),
      (4L, "the another unrelated filler document entirely", "en", "s", 46L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("text_bm25")(spark, dir).collect()
    assert(rows.forall(_.getAs[Long]("q_doc") == 107L), rows.mkString(";"))
    val byRank = rows.sortBy(_.getAs[Long]("rn"))
    assert(byRank.head.getAs[Long]("doc_id") == 1L, rows.mkString(";"))
    assert(byRank.head.getAs[Long]("n_terms") == 3L, rows.mkString(";"))
    // docs without any query term never enter the candidate set
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L), rows.mkString(";"))
  }

  test("text_bigram_lm: natural word order scores better than a scramble") {
    // the property a unigram model cannot have: same bag of words,
    // different order, different score. Docs 1/2 share the identical
    // multiset; doc 1 repeats the corpus-frequent transitions, doc 2
    // scrambles them. The rest of the mini-corpus establishes the model.
    val sess = spark
    import sess.implicits._
    val natural = "the table the table the table the table"
    val scramble = "table table the the table the the table"
    val docs = Seq(
      (1L, natural, "en", "s1"),
      (2L, scramble, "en", "s1"),
      (3L, "the table the table", "en", "s1"),
      (4L, "the table holds rows", "en", "s1"),
      (5L, "x", "en", "s1") // single word: no bigrams, must be absent
    ).map { case (i, t, l, src) => (i, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = graft.core.Fixtures.path("bigramlm")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("text_bigram_lm")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!rows.contains(5L), rows)
    assert(rows(1L) < rows(2L),
      s"natural ${rows(1L)} should beat scramble ${rows(2L)}")
  }

  test("text_kneser_ney: matches an independent in-memory KN model") {
    val sess = spark
    import sess.implicits._
    val texts = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ate the fish"),
      (3L, "a dog sat on a log"),
      (4L, "the dog and the cat and the fish"),
      (5L, "one")) // single word: no bigrams, must be absent
    val docs = texts.map { case (i, t) => (i, t, "en", "s1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = graft.core.Fixtures.path("kneserney")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_kneser_ney")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // interpolated KN with D = 0.75, from first principles
    val docWords = texts.map { case (i, t) =>
      i -> t.split(" ").filter(_.nonEmpty).toSeq
    }.toMap
    val docBgs = docWords.view.mapValues(ws => ws.zip(ws.drop(1))).toMap
    val allBg = docBgs.values.flatten.toSeq
    val cb = allBg.groupBy(identity).view.mapValues(_.size).toMap
    val types = cb.keySet
    val ct1 = allBg.groupBy(_._1).view.mapValues(_.size).toMap
    val nt1 = types.groupBy(_._1).view.mapValues(_.size).toMap
    val nr2 = types.groupBy(_._2).view.mapValues(_.size).toMap
    val nb = types.size.toDouble
    def logp(bg: (String, String)): Double = {
      val d = 0.75
      math.log((cb(bg) - d) / ct1(bg._1) +
        (d * nt1(bg._1) / ct1(bg._1)) * (nr2(bg._2) / nb))
    }
    assert(!got.contains(5L), got)
    for ((doc, bgs) <- docBgs if bgs.nonEmpty) {
      val want = -bgs.map(logp).sum / bgs.size
      val (n, kn) = got(doc)
      assert(n == bgs.size, s"doc $doc bigram count")
      assert(math.abs(kn - want) < 1e-5, s"doc $doc: got $kn want $want")
    }
  }

  test("text_kneser_ney: diverse continuations beat glued ones") {
    // the KN signature no raw-frequency mixture has: 'z q' and 'z r'
    // have identical counts and context, but r follows many distinct
    // words while q is glued to z — continuation probability must make
    // the 'z r' doc strictly more probable (lower cross-entropy)
    val sess = spark
    import sess.implicits._
    val docs = Seq(
      (1L, "z q"), (2L, "z r"),
      (3L, "a r"), (4L, "b r"), (5L, "c r"))
      .map { case (i, t) => (i, t, "en", "s1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = graft.core.Fixtures.path("kneserney_cont")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("text_kneser_ney")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rows(2L) < rows(1L),
      s"diverse-context r ${rows(2L)} should beat glued q ${rows(1L)}")
  }
}
