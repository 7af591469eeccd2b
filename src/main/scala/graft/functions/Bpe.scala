package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic greedy byte-pair-encoding tokenizer over a PINNED merges
  * table — the subword token counter a training pipeline actually budgets
  * with (whitespace counts under-count by the subword blow-up factor, and
  * a pack/budget computed from them mis-sizes every sequence).
  *
  * The merges table is a compile-time constant here; a trained tokenizer
  * ships its own table (GPT-2's `merges.txt` has exactly this shape:
  * rank-ordered token pairs) and everything else is unchanged — the same
  * stub-the-parameters/keep-the-plumbing contract as the multimodal
  * codecs and the hashing-trick classifier.
  *
  * Encoding algorithm: apply merges in ascending rank order, one
  * left-to-right non-overlapping merge-all pass per rank. For a VALID
  * table — each pair member is a single character or the output of an
  * earlier merge, outputs distinct — this is equivalent to the classic
  * "repeatedly merge the lowest-rank pair present" BPE encode loop
  * (Sennrich et al. 2016; the GPT-2 `bpe()` shape): merging rank r
  * creates only adjacencies involving its output token, and that output
  * can never be a member of a lower-rank pair (members are single chars
  * or outputs of still-earlier merges, and outputs are distinct) — so no
  * lower-rank occurrence is ever created, and one pass per rank leaves
  * no same-rank occurrence behind either (within a token run, the pass
  * consumes pairs exactly like the classic scan). `BpeSpec` proves the
  * equivalence against an independent min-rank-loop implementation.
  *
  * The word state is a token string with a DOUBLED U+0001 delimiter at
  * every boundary (`DD t DD h DD e DD` for "the", D = U+0001), and one
  * rank's pass is ONE literal replace of `D x DD y D` with `D xy D`.
  * The doubling is what makes plain replace an exact classic pass: a
  * match consumes the inner boundary fully but only ONE delimiter of
  * each outer boundary, so an adjacent occurrence (a run like "lllll"
  * under (l,l)) keeps its own leading delimiter and still matches —
  * single-delimiter state gets this wrong, merging [ll,l,ll] where the
  * classic pass gives [ll,ll,l]. Tokens contain no delimiter, so a match
  * can never take a token prefix/suffix for x or y. Java's
  * `String.replace` and DuckDB's `replace` share left-to-right
  * non-overlapping literal-scan semantics, so the DuckDB oracle
  * ([[BpeUtil.bpeCtes]]) replays the EXACT algorithm — structural
  * parity, not reimplementation parity.
  *
  * Scale shape: a narrow per-row map — NO explode, NO distinct-word
  * shuffle, NO join. Per-partition the encoder memoizes per-word counts
  * (natural-language vocabulary is Zipfian: the cache hit rate IS the
  * corpus redundancy), bounded at 64k entries so a pathological
  * all-unique corpus degrades to recomputation, never to memory growth.
  * Embarrassingly parallel at 100 TB.
  */
object BpeUtil {
  /** The pinned merges table, rank order. INVARIANT (checked at init):
    * each member is a single character or the output of an EARLIER merge,
    * and outputs are distinct — the validity condition for the
    * ascending-rank encode to equal classic min-rank BPE. */
  val Merges: IndexedSeq[(String, String)] = IndexedSeq(
    ("t", "h"), ("i", "n"), ("a", "n"), ("e", "r"), ("o", "n"),
    ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"), ("th", "e"),
    ("e", "s"), ("s", "t"), ("a", "r"), ("o", "u"), ("an", "d"),
    ("in", "g"), ("i", "s"), ("i", "t"), ("a", "l"), ("l", "e"),
    ("c", "h"), ("r", "o"), ("er", "s"), ("s", "e"), ("l", "l"),
    ("o", "w"), ("u", "e"), ("q", "u"), ("qu", "er"), ("t", "a"),
    ("b", "le"), ("ta", "ble"))

  locally {
    val outputs = Merges.map { case (x, y) => x + y }
    require(outputs.distinct == outputs, "bpe merge outputs must be distinct")
    Merges.zipWithIndex.foreach { case ((x, y), r) =>
      val earlier = outputs.take(r).toSet
      Seq(x, y).foreach { m =>
        require(m.codePointCount(0, m.length) == 1 || earlier.contains(m),
          s"bpe merge $r member '$m' is neither a char nor an earlier output")
      }
    }
  }

  private val Delim = '\u0001'
  private val Bound = s"$Delim$Delim" // the doubled boundary
  /** (pattern, replacement) per rank, precompiled: one replace per rank. */
  private val Compiled: Array[(String, String)] = Merges.map { case (x, y) =>
    (s"$Delim$x$Bound$y$Delim", s"$Delim${x + y}$Delim")
  }.toArray

  /** Per-JVM memo of word -> token count. Bounded: past 64k entries new
    * words are recomputed, not cached (degrade in CPU, never in memory).
    * Determinism is unaffected — the cache stores pure-function values. */
  private val CacheMax = 1 << 16
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Double-delimited initial state: one token per code point. */
  private def delimited(word: String): String = {
    val sb = new java.lang.StringBuilder(word.length * 3 + 2)
    sb.append(Bound)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      sb.appendCodePoint(cp).append(Bound)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** The encode loop: one replace-all pass per rank, ascending. */
  private def encodeDelim(word: String): String = {
    var s = delimited(word)
    var r = 0
    while (r < Compiled.length) {
      val (pat, rep) = Compiled(r)
      s = s.replace(pat, rep)
      r += 1
    }
    s
  }

  /** BPE tokens of one word, in order. Empty word -> empty. */
  def tokenizeWord(word: String): Seq[String] =
    if (word.isEmpty) Seq.empty
    else encodeDelim(word).split(Delim).filter(_.nonEmpty).toSeq

  /** BPE token count of one word (memoized). */
  def countWord(word: String): Long = {
    if (word.isEmpty) return 0L
    val hit = cache.get(word)
    if (hit != null) return hit.longValue()
    val enc = encodeDelim(word)
    var d = 0L
    var i = 0
    while (i < enc.length) { if (enc.charAt(i) == Delim) d += 1; i += 1 }
    // k tokens carry k+1 boundaries of 2 delimiters each
    val n = d / 2 - 1
    if (cache.size() < CacheMax) cache.put(word, java.lang.Long.valueOf(n))
    n
  }

  /** BPE token count of a document: sum over its space-separated words
    * (empty splits skipped — same word set as the oracle's
    * `string_split(text, ' ') ... WHERE word <> ''`). */
  def countTokens(text: UTF8String): Long = {
    val s = text.toString
    var total = 0L
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) total += countWord(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    total
  }

  // ---- DuckDB oracle fragments ------------------------------------------
  // The oracle replays the IDENTICAL algorithm: distinct words (the
  // memoization, made relational), the same chr(1)-doubled state string,
  // one replace per rank stepped through a recursive CTE. Built from the
  // same Merges value, so the two sides cannot drift.

  private def sqlQuote(s: String) = "'" + s + "'" // merges are [a-z] only

  /** `(rank, x, y, xy)` VALUES rows for the merges relation. */
  def mergesValuesSql: String =
    Merges.zipWithIndex.map { case ((x, y), r) =>
      s"($r, ${sqlQuote(x)}, ${sqlQuote(y)}, ${sqlQuote(x + y)})"
    }.mkString(", ")

  /** CTE clauses (for a `WITH RECURSIVE` prologue) defining:
    *   wrd(doc_id, word)       — nonempty space-split words per doc
    *   bpew(word, n_bpe)       — BPE token count per distinct word
    *   bpedoc(doc_id, ws_tokens, bpe_tokens) — per-doc totals
    * over a `documents(doc_id, text)` relation. */
  def bpeCtes: String = {
    val n = Merges.length
    s"""wrd AS (SELECT doc_id, word FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |    FROM documents) WHERE word <> ''),
       |bpem(mr, x, y, xy) AS (VALUES $mergesValuesSql),
       |bpes AS (
       |  SELECT word,
       |    repeat(chr(1), 2) ||
       |      array_to_string(string_split(word, ''), repeat(chr(1), 2)) ||
       |      repeat(chr(1), 2) AS s,
       |    0 AS r
       |  FROM (SELECT DISTINCT word FROM wrd)
       |  UNION ALL
       |  SELECT word,
       |    replace(s, chr(1)||x||chr(1)||chr(1)||y||chr(1), chr(1)||xy||chr(1)),
       |    r + 1
       |  FROM bpes JOIN bpem ON bpem.mr = bpes.r WHERE bpes.r < $n),
       |bpew AS (SELECT word,
       |    CAST((len(string_split(s, chr(1))) - 3) // 2 AS BIGINT) AS n_bpe
       |  FROM bpes WHERE r = $n),
       |bpedoc AS (SELECT w.doc_id,
       |    CAST(COUNT(*) AS BIGINT) AS ws_tokens,
       |    CAST(SUM(c.n_bpe) AS BIGINT) AS bpe_tokens
       |  FROM wrd w JOIN bpew c ON w.word = c.word GROUP BY w.doc_id)""".stripMargin
  }
}

/** `bpe_token_count(text)` — total greedy-BPE subword tokens of the
  * document under [[BpeUtil.Merges]]. Codegen'd scalar: a narrow map in
  * the scan's whole-stage-codegen span, no shuffle. */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(input: Any): Any =
    BpeUtil.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.BpeUtil.countTokens($t);")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  /** Column form: `bpeTokenCount(col("text"))`. */
  def bpeTokenCount(text: Column): Column =
    GraftBridge.column(BpeTokenCount(GraftBridge.expression(text)))
}
