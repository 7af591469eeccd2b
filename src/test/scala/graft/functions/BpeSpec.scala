package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Greedy-BPE tokenizer (functions/Bpe.scala): parity of the shipped
  * ascending-rank/delimited-string encoder against an INDEPENDENT classic
  * implementation — the Sennrich/GPT-2 min-rank loop over a token list
  * with a single left-to-right merge pass per round — on crafted words,
  * the full corpus vocabulary, and seeded random strings over the merge
  * alphabet. Plus the merges-table validity invariant the equivalence
  * proof rests on, and the SQL/Column expression surfaces. */
class BpeSpec extends SparkSuite {

  /** Reference: classic BPE encode. Repeatedly find the pair with the
    * lowest merge rank among adjacent token pairs; merge ALL its
    * occurrences left-to-right non-overlapping; stop when no adjacent
    * pair is in the table. Deliberately list-based — shares no code or
    * representation with the shipped delimited-string encoder. */
  private val rank: Map[(String, String), Int] =
    BpeUtil.Merges.zipWithIndex.map { case (p, r) => p -> r }.toMap

  private def classicEncode(word: String): Seq[String] = {
    var toks: Vector[String] =
      word.codePoints().toArray.toVector.map(Character.toString)
    var done = toks.isEmpty
    while (!done) {
      val best = toks.indices.dropRight(1)
        .flatMap(i => rank.get((toks(i), toks(i + 1))))
        .minOption
      best match {
        case None => done = true
        case Some(r) =>
          val (x, y) = BpeUtil.Merges(r)
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == x && toks(i + 1) == y) {
              out += (x + y); i += 2
            } else { out += toks(i); i += 1 }
          }
          toks = out.result()
      }
    }
    toks
  }

  test("merges table is valid: members are chars or earlier outputs, outputs distinct") {
    val outputs = BpeUtil.Merges.map { case (x, y) => x + y }
    assert(outputs.distinct == outputs)
    BpeUtil.Merges.zipWithIndex.foreach { case ((x, y), r) =>
      val earlier = outputs.take(r).toSet
      Seq(x, y).foreach(m => assert(m.length == 1 || earlier.contains(m),
        s"rank $r member '$m'"))
    }
  }

  test("crafted words: multi-round chains, unknown chars, adjacency") {
    assert(BpeUtil.tokenizeWord("the") == Seq("the"))       // t,h->th; th,e->the
    assert(BpeUtil.tokenizeWord("that") == Seq("th", "at"))
    assert(BpeUtil.tokenizeWord("table") == Seq("table"))   // 4-round chain
    assert(BpeUtil.tokenizeWord("query") == Seq("quer", "y"))
    assert(BpeUtil.tokenizeWord("x") == Seq("x"))
    assert(BpeUtil.tokenizeWord("zzz") == Seq("z", "z", "z")) // no merges
    assert(BpeUtil.tokenizeWord("") == Seq.empty)
    // (l,l) adjacency: left-to-right non-overlapping, like the classic pass
    assert(BpeUtil.tokenizeWord("llll") == Seq("ll", "ll"))
    assert(BpeUtil.tokenizeWord("lllll") == Seq("ll", "ll", "l"))
    assert(BpeUtil.countWord("the") == 1L)
    assert(BpeUtil.countWord("") == 0L)
  }

  test("parity with the classic min-rank loop on the corpus vocabulary") {
    val vocab = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
      .collect().map(_.getString(0))
    assert(vocab.nonEmpty)
    vocab.foreach { w =>
      assert(BpeUtil.tokenizeWord(w) == classicEncode(w), s"word '$w'")
    }
  }

  test("parity with the classic min-rank loop on seeded random strings") {
    val alphabet = "theinadrsolcwqubg x" // merge chars + stragglers + space-free
    val rng = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val w = Seq.fill(1 + rng.nextInt(12))(
        alphabet(rng.nextInt(alphabet.length))).mkString.replace(" ", "")
      assert(BpeUtil.tokenizeWord(w) == classicEncode(w), s"word '$w'")
    }
    // run-heavy strings over {l,t,h}: long same-char runs are where a
    // replace-based pass can diverge from the classic scan (adjacent
    // occurrences sharing a boundary) — the bug class the double
    // delimiter exists to prevent
    (1 to 300).foreach { _ =>
      val w = Seq.fill(1 + rng.nextInt(14))("lth" (rng.nextInt(3))).mkString
      assert(BpeUtil.tokenizeWord(w) == classicEncode(w), s"word '$w'")
    }
  }

  test("countTokens sums per-word counts over space splits") {
    import org.apache.spark.unsafe.types.UTF8String
    def n(s: String) = BpeUtil.countTokens(UTF8String.fromString(s))
    assert(n("the table") == 2L)
    assert(n("  the   table  ") == 2L) // empty splits skipped
    assert(n("") == 0L)
    assert(n("   ") == 0L)
    assert(n("query") == 2L)
    // memoized second pass returns the same values
    assert(n("the table query") == 4L)
    assert(n("the table query") == 4L)
  }

  test("text_bpe_vocab agrees with per-word tokenization on the corpus") {
    // the query tokenizes via chained SQL replaces; recompute the same
    // vocabulary from the encoder's Java path and a plain Scala fold —
    // two independent execution routes over the same algorithm
    val words = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").collect().map(_.getString(0))
    val occ = scala.collection.mutable.Map.empty[String, Long]
    val inWords = scala.collection.mutable.Map.empty[String, Set[String]]
    words.foreach { w =>
      BpeUtil.tokenizeWord(w).foreach { t =>
        occ(t) = occ.getOrElse(t, 0L) + 1L
        inWords(t) = inWords.getOrElse(t, Set.empty) + w
      }
    }
    val got = graft.SparkEntry.queries("text_bpe_vocab")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == occ.map { case (t, n) => t -> (n, inWords(t).size.toLong) }.toMap)
  }

  test("expression: SQL registration, codegen'd projection, null safety") {
    val df = spark.createDataFrame(Seq(
      (1L, "the table"), (2L, "zzz"), (3L, ""))).toDF("id", "text")
    df.createOrReplaceTempView("bpe_probe")
    val viaSql = spark.sql(
      "SELECT id, bpe_token_count(text) AS n FROM bpe_probe ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.toSeq == Seq((1L, 2L), (2L, 3L), (3L, 0L)))
    val viaCol = df.select(col("id"),
      BpeTokenCount.bpeTokenCount(col("text")).as("n"))
      .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaCol.toSeq == Seq((1L, 2L), (2L, 3L), (3L, 0L)))
    // null text -> null count (null-safe unary), not a crash
    val withNull = spark.sql(
      "SELECT bpe_token_count(CAST(NULL AS STRING)) AS n").collect()
    assert(withNull.head.isNullAt(0))
  }
}
