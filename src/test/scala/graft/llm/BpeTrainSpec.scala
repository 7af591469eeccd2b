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

  /** Reference BATCHED trainer: the same pair stats and candidate order,
    * but per round it greedily keeps up to `batchK` candidates whose
    * token alphabets (constituents AND merged outputs) are pairwise
    * disjoint, then applies them sequentially — an independent
    * re-implementation of the batched schedule, sharing no code with
    * the shipped learner. */
  private def referenceLearnBatched(counts: Map[String, Long], rounds: Int,
      batchK: Int): Seq[(String, String, Long)] = {
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
        val cands = stats.toSeq
          .sortBy { case ((x, y), pc) => (-pc, x, y) }
          .take(batchK * 8)
        var used = Set.empty[String]
        val picked = Vector.newBuilder[(String, String, Long)]
        var n = 0
        cands.foreach { case ((x, y), pc) =>
          if (n < batchK && !used(x) && !used(y) && !used(x + y)) {
            picked += ((x, y, pc)); used = used ++ Seq(x, y, x + y); n += 1
          }
        }
        val sel = picked.result()
        out ++= sel
        sel.foreach { case (x, y, _) =>
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
        }
        r += 1
      }
    }
    out.result()
  }

  private def learnedBatched(dir: String, rounds: Int, batchK: Int): Seq[(String, String, Long)] =
    BpeTrain.learnBatched(spark, dir, rounds, batchK)
      .map { case (_, x, y, pc) => (x, y, pc) }

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

  test("batched schedule matches the batched reference on the real corpus") {
    val counts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = learnedBatched(sfDir, rounds = 4, batchK = 8)
    assert(got == referenceLearnBatched(counts, 4, 8))
    // the point of batching: one round learns several merges
    assert(got.length > 4, s"only ${got.length} merges in 4 rounds")
  }

  test("batched ranks number merges in global application order") {
    val ranks = BpeTrain.learnBatched(spark, sfDir, 3, 8).map(_._1)
    assert(ranks == ranks.indices.map(_.toLong))
  }

  test("conflict-rich corpus: greedy admits only token-disjoint merges per round") {
    val sess = spark
    import sess.implicits._
    // every pair shares 'a' or mints a used output: round 0 must pick
    // (a,a) ALONE even with batchK = 8 — (a,b) shares a, and a
    // hypothetical (aa,?) doesn't exist yet
    val docs = Seq((1L, "aaab aaab aaab", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = graft.core.Fixtures.path("bpebatchconf")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val counts = Map("aaab" -> 3L)
    val got = learnedBatched(dir, 8, 8)
    assert(got == referenceLearnBatched(counts, 8, 8), got)
    assert(got.head == ("a", "a", 6L))
    // word is 4 chars: whatever the schedule, it ends fully merged in
    // <= 3 merges, and round 0 admitted exactly one
    assert(got.length <= 3)
  }

  test("disjoint-rich corpus: one round learns a whole batch") {
    val sess = spark
    import sess.implicits._
    val docs = Seq((1L, "ab ab cd cd ef ef gh gh", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = graft.core.Fixtures.path("bpebatchdis")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val counts = Map("ab" -> 2L, "cd" -> 2L, "ef" -> 2L, "gh" -> 2L)
    val got = learnedBatched(dir, 1, 8)
    assert(got == referenceLearnBatched(counts, 1, 8), got)
    // all four pairs are token-disjoint and equal-count: ONE round
    // learns all of them, in (x, y) tie-break order
    assert(got == Seq(("a", "b", 2L), ("c", "d", 2L), ("e", "f", 2L), ("g", "h", 2L)))
  }

  test("batchK = 1 is exactly the classic top-1 schedule") {
    assert(learnedBatched(sfDir, BpeTrain.TrainRounds, 1) == learned(sfDir))
  }

  test("production scale: >= 64 merges within 8 rounds at batchK 16") {
    // the jobs-per-vocabulary claim: a real vocabulary is learnable in
    // vocab/batchK rounds, not vocab sequential jobs
    val got = learnedBatched(sfDir, rounds = 8, batchK = 16)
    assert(got.length >= 64, s"learned only ${got.length} merges")
    // exact counts, no duplicates among learned outputs
    val xys = got.map { case (x, y, _) => x + y }
    assert(xys.distinct.length == xys.length)
  }

  test("adaptive schedule with fixed k is the batched schedule (prefix parity)") {
    val (adaptive, rounds) =
      BpeTrain.learnAdaptive(spark, sfDir, targetMerges = 48, k0 = 16, maxK = 16)
    val batched = learnedBatched(sfDir, rounds = 8, batchK = 16)
    assert(adaptive.map { case (_, x, y, pc) => (x, y, pc) } ==
      batched.take(adaptive.length))
    assert(adaptive.length == 48,
      s"target not reached: ${adaptive.length} merges in $rounds rounds")
  }

  test("adaptive schedule exhausts the real corpus and reports the ceiling") {
    // the corpus-side ceiling measurement: the synthetic documents table
    // has a ~31-word vocabulary, so training EXHAUSTS long before any
    // production vocabulary size — the adaptive loop must stop cleanly
    // at the corpus's true merge capacity, not at the target
    val (all, rounds) =
      BpeTrain.learnAdaptive(spark, sfDir, targetMerges = 100000, k0 = 4, maxK = 64)
    assert(all.nonEmpty && all.length < 200,
      s"tiny-vocabulary corpus cannot support ${all.length} merges")
    val xys = all.map { case (_, x, y, _) => x + y }
    assert(xys.distinct.length == xys.length)
    info(s"sf0.001 corpus exhausts at ${all.length} merges in $rounds rounds")
  }

  test("production vocabulary: the frontier schedule reaches 1024 merges in few rounds") {
    val sess = spark
    import sess.implicits._
    // a wide deterministic vocabulary (6000 10-char words over a 62-char
    // alphabet — the realistic regime: the token-disjoint frontier scales
    // with alphabet size, and real corpora carry 90+ distinct bytes)
    val rnd = new scala.util.Random(7)
    val letters =
      "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    val words = (0 until 6000).map { i =>
      (0 until 10).map(_ => letters(rnd.nextInt(letters.length))).mkString
    }.distinct
    val docs = words.grouped(100).zipWithIndex.map { case (ws, i) =>
      (i.toLong, ws.mkString(" "), "en", "synth")
    }.toSeq.toDF("doc_id", "text", "lang", "source")
    val dir = graft.core.Fixtures.path("bpetrain_wide")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val (merges, rounds) = BpeTrain.learnAdaptive(spark, dir,
      targetMerges = 1024, k0 = 16, maxK = 256, poolMult = 32)
    assert(merges.length == 1024, s"reached only ${merges.length} merges")
    // the number the 32k claim scales from (SCALING.md): measured 34
    // rounds ≈ a ~30-wide steady-state disjoint frontier on this 62-char
    // corpus — 30× fewer jobs than the classic top-1 schedule (1024) and
    // ~2× fewer than fixed k0 = 16 (64 rounds); the frontier width is a
    // corpus property (it scales with alphabet/token diversity), so the
    // assertion leaves headroom over the measurement, not over the claim
    assert(rounds <= 40,
      s"adaptive schedule took $rounds rounds for 1024 merges " +
        "(classic = 1024 jobs, fixed k0 = 64 rounds)")
    val xys = merges.map { case (_, x, y, _) => x + y }
    assert(xys.distinct.length == xys.length)
    assert(merges.map(_._1) == merges.indices.map(_.toLong))
    info(s"1024 merges in $rounds rounds (k0=16, maxK=256)")
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
