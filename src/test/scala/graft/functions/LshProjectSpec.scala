package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite

class LshProjectSpec extends SparkSuite {
  import spark.implicits._

  // deterministic ±1 test matrix (not the production md5 one — the spec
  // grades the fold, not the plane derivation)
  private val dirs: Seq[Seq[Int]] =
    Seq.tabulate(8, 16)((p, i) => if (((p * 31 + i * 7) % 3) < 2) 1 else -1)

  private def viaExpr(vec: Seq[Float], nPlanes: Int): Long =
    Seq(Tuple1(vec)).toDF("embedding")
      .select(LshProject.bucket(col("embedding"), dirs, nPlanes).as("b"))
      .as[Long].head()

  /** The interpreted HOF formulation the expression replaced — exact
    * DECIMAL(20,10)/(38,10) fold, kept as the semantic oracle. */
  private def viaHof(vec: Seq[Float], nPlanes: Int): Long =
    Seq(Tuple1(vec)).toDF("embedding")
      .select(typedLit(dirs).as("dirs"), col("embedding"))
      .selectExpr(
        s"""aggregate(sequence(0, ${nPlanes - 1}), CAST(0 AS BIGINT), (acc, p) ->
           |  acc + IF(
           |    aggregate(
           |      zip_with(embedding,
           |        slice(element_at(dirs, p + 1), 1, size(embedding)),
           |        (v, dr) -> CAST(CAST(v AS DOUBLE) AS DECIMAL(20,10)) * dr),
           |      CAST(0 AS DECIMAL(38,10)),
           |      (a, x) -> CAST(a + x AS DECIMAL(38,10))) > 0,
           |    shiftleft(CAST(1 AS BIGINT), p), CAST(0 AS BIGINT))) AS b""".stripMargin)
      .as[Long].head()

  test("matches the exact-decimal HOF fold on randomized float vectors") {
    val vecGen = for {
      n <- Gen.choose(1, 16)
      v <- Gen.listOfN(n, Gen.choose(-3.0f, 3.0f))
    } yield v
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40),
      Prop.forAll(vecGen) { v =>
        viaExpr(v, 8) == viaHof(v, 8) && viaExpr(v, 4) == viaHof(v, 4)
      })
    assert(res.passed, res.status.toString)
  }

  test("tie values near the half-ulp rounding boundary agree with the cast") {
    // values whose *1e10 fraction sits near .5 — the HALF_UP edge the
    // scaling must replay exactly
    val edgy = Seq(1.23456789055f, -0.00000000005f, 0.05f, -2.5e-11f)
    assert(viaExpr(edgy, 8) == viaHof(edgy, 8))
  }

  test("empty vector projects to bucket 0") {
    assert(viaExpr(Seq.empty, 8) == 0L)
  }

  test("a null element zeroes the bucket, matching the HOF's null propagation") {
    val withNull = Seq(Tuple1(Seq[Option[Float]](Some(1.5f), None, Some(-2f))))
      .toDF("embedding")
    val viaE = withNull
      .select(LshProject.bucket(col("embedding"), dirs, 8).as("b"))
      .as[Long].head()
    val viaH = withNull
      .select(typedLit(dirs).as("dirs"), col("embedding"))
      .selectExpr(
        """aggregate(sequence(0, 7), CAST(0 AS BIGINT), (acc, p) ->
          |  acc + IF(
          |    aggregate(
          |      zip_with(embedding,
          |        slice(element_at(dirs, p + 1), 1, size(embedding)),
          |        (v, dr) -> CAST(CAST(v AS DOUBLE) AS DECIMAL(20,10)) * dr),
          |      CAST(0 AS DECIMAL(38,10)),
          |      (a, x) -> CAST(a + x AS DECIMAL(38,10))) > 0,
          |    shiftleft(CAST(1 AS BIGINT), p), CAST(0 AS BIGINT))) AS b""".stripMargin)
      .as[Long].head()
    assert(viaE == 0L && viaH == 0L)
  }

  test("interpreted eval agrees with codegen") {
    val e = LshProject(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(0.5f, -1.25f, 2.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      dirs, 8)
    assert(e.eval(null) == viaExpr(Seq(0.5f, -1.25f, 2.0f), 8))
  }

  test("dim beyond the plane matrix fails loudly") {
    val wide = Seq.fill(17)(1.0f)
    val ex = intercept[Exception](viaExpr(wide, 8))
    assert(ex.getMessage != null)
  }
}
