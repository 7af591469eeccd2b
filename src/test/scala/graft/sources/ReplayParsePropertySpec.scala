package graft.sources

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz for [[ReplaySource.parseLine]] — the scanner was rewritten from a
  * regex heuristic, so the contract gets property coverage: any payload a
  * conforming fixture writer can emit (escaped string or raw JSON object,
  * LAST key on the line) round-trips exactly, and any trailing key after
  * the payload is rejected loudly, for every generated content including
  * embedded quotes, backslashes, braces, and `", "k":`-shaped text. */
class ReplayParsePropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private val tsGen = Gen.chooseNum(0L, 4102444800L)
  // content deliberately rich in the scanner's danger characters
  private val contentGen: Gen[String] = Gen.listOf(Gen.frequency(
    3 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('\\', '"', ' ', ':', ',', '{', '}'))).map(_.mkString)
  private val keyGen = Gen.choose(1, 4)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
  private val scalarGen: Gen[String] = Gen.oneOf(
    contentGen.map(v => "\"" + esc(v) + "\""),
    Gen.chooseNum(0, 999).map(_.toString))
  private def objGen(depth: Int): Gen[String] = {
    val valueGen =
      if (depth <= 0) scalarGen
      else Gen.frequency(3 -> scalarGen, 1 -> objGen(depth - 1))
    Gen.choose(0, 3)
      .flatMap(n => Gen.listOfN(n, Gen.zip(keyGen, valueGen)))
      .map(_.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}"))
  }

  test("string payloads round-trip through escape -> parseLine") {
    check(Prop.forAll(tsGen, contentGen) { (ts, p) =>
      ReplaySource.parseLine(s"""{"ts": $ts, "payload": "${esc(p)}"}""") == (ts, p)
    })
  }

  test("JSON-object payloads pass the guard and come back verbatim") {
    check(Prop.forAll(tsGen, objGen(2)) { (ts, obj) =>
      ReplaySource.parseLine(s"""{"ts": $ts, "payload": $obj}""") == (ts, obj)
    })
  }

  test("a key after the payload is rejected for both payload forms") {
    val payloadGen = Gen.oneOf(
      contentGen.map(p => "\"" + esc(p) + "\""), objGen(1))
    check(Prop.forAll(tsGen, payloadGen) { (ts, payload) =>
      val ex = intercept[IllegalArgumentException](ReplaySource.parseLine(
        s"""{"ts": $ts, "payload": $payload, "extra": 1}"""))
      ex.getMessage.contains("payload must be last")
    })
  }
}
