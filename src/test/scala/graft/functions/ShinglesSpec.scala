package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.SparkSuite

class ShinglesSpec extends SparkSuite {
  import spark.implicits._

  private def viaExpr(text: String, n: Int): Seq[String] =
    Seq(text).toDF("t")
      .select(Shingles.shingleNgrams(col("t"), n).as("s"))
      .as[Seq[String]].head()

  /** The composable HOF formulation the expression replaced — kept here as
    * the semantic oracle for randomized equivalence. */
  private def viaHof(text: String): Seq[String] =
    Seq(text).toDF("t")
      .select(col("t"), filter(split(col("t"), " "), w => w =!= "").as("ws"))
      .select(
        when(size(col("ws")) >= 5,
          transform(sequence(lit(1), size(col("ws")) - 4),
            i => concat_ws(" ", slice(col("ws"), i, lit(5)))))
          .otherwise(array().cast(ArrayType(StringType))).as("s"))
      .as[Seq[String]].head()

  test("basic 5-gram shingling") {
    assert(viaExpr("a b c d e f g", 5) ==
      Seq("a b c d e", "b c d e f", "c d e f g"))
  }

  test("fewer words than n yields empty, not null") {
    assert(viaExpr("a b c d", 5) == Seq())
    assert(viaExpr("", 5) == Seq())
    assert(viaExpr("   ", 5) == Seq())
  }

  test("exactly n words yields one shingle") {
    assert(viaExpr("a b c d e", 5) == Seq("a b c d e"))
  }

  test("repeated/leading/trailing spaces collapse like the HOF form") {
    assert(viaExpr("  a  b c   d e  ", 5) == Seq("a b c d e"))
  }

  test("multi-byte UTF-8 words survive byte-level tokenization") {
    assert(viaExpr("héllo wörld ünïcode ärger straße zoë", 5) ==
      Seq("héllo wörld ünïcode ärger straße",
        "wörld ünïcode ärger straße zoë"))
  }

  test("n=2 bigrams") {
    assert(viaExpr("x y z", 2) == Seq("x y", "y z"))
  }

  test("null text yields null") {
    val r = Seq[Option[String]](None).toDF("t")
      .select(Shingles.shingleNgrams(col("t"), 5).as("s"))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("matches the HOF formulation on randomized docs") {
    val rng = new scala.util.Random(7)
    val words = Vector("lorem", "ipsum", "δοκιμή", "x", "doc42", "a-b", "")
    for (_ <- 1 to 50) {
      val doc = Seq.fill(rng.nextInt(12))(words(rng.nextInt(words.size)))
        .mkString(" ")
      assert(viaExpr(doc, 5) == viaHof(doc), s"doc=<$doc>")
    }
  }

  test("SQL registration: shingle_ngrams(text, n)") {
    val r = spark.sql("SELECT shingle_ngrams('a b c', 2) AS s")
      .as[Seq[String]].head()
    assert(r == Seq("a b", "b c"))
  }
}
