package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** BPE training (llm/BpeTrain.scala): the distributed learner must match
  * an INDEPENDENT in-memory reference — the classic Sennrich loop over a
  * word-count map with list-based token state (no shared code or
  * representation with the shipped delimited-string learner) — on the
  * real corpus and on crafted cases that exercise overlap counting,
  * tie-breaks, chained merges, and pair exhaustion. */
class BpeTrainSpec extends SparkSuite {

  /** Reference trainer: word-count map in, (x, y, pairCount) merges out.
    * Pair stats count every adjacent POSITION (overlapping); best pair is
    * (count DESC, x ASC, y ASC); application is one classic left-to-right
    * non-overlapping pass. */
  private def referenceLearn(
      counts: Map[String, Long], rounds: Int): Seq[(String, String, Long)] = {
    var state: Map[String, (Vector[String], Long)] =
      counts.map { case (w, c) =>
        w -> (w.codePoints().toArray.toVector.map(Character.toString), c)
      }
    val out = Vector.newBuilder[(String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val stats = scala.collection.mutable.Map.empty[(String, String), Long]
      state.values.foreach { case (toks, c) =>
        toks.indices.dropRight(1).foreach { i =>
          val k = (toks(i), toks(i + 1))
          stats(k) = stats.getOrElse(k, 0L) + c
        }
      }
      if (stats.isEmpty) exhausted = true
      else {
        val ((x, y), pc) = stats.toSeq
          .minBy { case ((x, y), pc) => (-pc, x, y) }
        out += ((x, y, pc))
        state = state.map { case (w, (toks, c)) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == x && toks(i + 1) == y) {
              merged += (x + y); i += 2
            } else { merged += toks(i); i += 1 }
          }
          w -> (merged.result(), c)
        }
        r += 1
      }
    }
    out.result()
  }

  private def learned(dir: String): Seq[(String, String, Long)] =
    graft.SparkEntry.queries("bpe_train")(spark, dir)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq

  test("matches the reference trainer on the real corpus") {
    val counts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(learned(sfDir) == referenceLearn(counts, BpeTrain.TrainRounds))
  }

  test("crafted corpus: overlap counting, chained merges, tie-break, exhaustion") {
    val sess = spark
    import sess.implicits._
    // aaab x3: (a,a) counts 2 per occurrence (overlapping adjacency);
    // 'the'-family forces a chained merge (t,h) then (th,e); 'zz' vs
    // 'yy' with equal counts exercises the lexicographic tie-break
    val docs = Seq(
      (1L, "aaab aaab aaab the the zz", "en", "s1"),
      (2L, "the he yy", "en", "s1")
    ).toDF("doc_id", "text", "lang", "source")
    val dir = graft.core.Fixtures.path("bpetrain")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val counts = Map("aaab" -> 3L, "the" -> 3L, "zz" -> 1L, "he" -> 1L, "yy" -> 1L)
    val expected = referenceLearn(counts, BpeTrain.TrainRounds)
    val got = learned(dir)
    assert(got == expected, s"got $got\nexpected $expected")
    // overlap: round 0 is (a,a) with count 6 (two positions x three words)
    assert(got.head == ("a", "a", 6L))
    // chained: (h,e) wins round 1 (count 4 beats (t,h)'s 3), so 'the'
    // forms later via (t,he) — the learned chain must appear in order
    val xys = got.map { case (x, y, _) => x + y }
    assert(xys.indexOf("he") >= 0 && xys.indexOf("the") > xys.indexOf("he"))
    // exhaustion: the tiny vocab runs out of pairs before TrainRounds
    assert(got.length < BpeTrain.TrainRounds)
  }

  test("bpe_train_tokens encodes with the learned merges through exhaustion") {
    // crafted corpus exhausts at 7 merges; every word then encodes to ONE
    // token except the single-char stragglers — values cross-checked
    // against the oracle SQL's LEFT JOIN fallback chain in DuckDB
    val sess = spark
    import sess.implicits._
    val docs = Seq(
      (1L, "aaab aaab aaab the the zz", "en", "s1"),
      (2L, "the he yy", "en", "s1"),
      (3L, "a b c", "en", "s1")
    ).toDF("doc_id", "text", "lang", "source")
    val dir = graft.core.Fixtures.path("bpetraintok")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("bpe_train_tokens")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (1L, 6L, 6L, 0.3),
      (2L, 3L, 3L, 3.0 / 7.0),
      (3L, 3L, 3L, 1.0)), rows.toSeq)
  }

  test("single-char and empty vocabularies exhaust immediately") {
    val sess = spark
    import sess.implicits._
    val docs = Seq((1L, "a b c", "en", "s1")).toDF("doc_id", "text", "lang", "source")
    val dir = graft.core.Fixtures.path("bpetrain1")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(learned(dir).isEmpty)
  }
}
