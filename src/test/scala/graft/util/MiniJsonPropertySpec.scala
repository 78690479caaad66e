package graft.util

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.util.MiniJson._

/** Property: render ∘ parse is identity for the control-plane JSON the
  * engine itself writes (offsets, task configs, REST bodies) — including
  * strings with quotes, escapes, control chars, and unicode. A round-trip
  * break here corrupts checkpoint offsets on recovery.
  *
  * (Raw scalacheck `Gen` sampled with a FIXED seed — the scalatest-plus
  * bridge artifact is not in the offline cache; a fixed seed also keeps
  * the case set reproducible across runs.)
  */
class MiniJsonPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val jStr: Gen[JValue] =
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('"', '\\', '\n', '\t', '\r', '\b', '\f',
        '/', ' ', 'é', '語', '€', '')))
      .map(cs => JStr(cs.mkString))

  private val jLeaf: Gen[JValue] = Gen.oneOf(
    jStr,
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(MiniJson.num),
    Gen.oneOf(JBool(true), JBool(false), JNull))

  private def jValue(depth: Int): Gen[JValue] =
    if (depth <= 0) jLeaf
    else Gen.frequency(
      3 -> jLeaf,
      1 -> Gen.listOfN(2, jValue(depth - 1)).map(vs => JArr(vs.toVector)),
      1 -> Gen.listOfN(2, Gen.zip(Gen.alphaNumStr, jValue(depth - 1)))
        .map(fs => JObj(scala.collection.immutable.ListMap(fs: _*))))

  test("render ∘ parse is identity for arbitrary control-plane values") {
    samples(jValue(3), 200).foreach { v =>
      val rendered = MiniJson.render(v)
      val back = MiniJson.parse(rendered)
      assert(back == Right(v), s"rendered: $rendered")
    }
  }

  test("parse never throws on arbitrary input — Either contract") {
    // the CDC partition reader relies on Left (not an exception) to skip
    // malformed binlog lines
    val jsonish = Gen.listOf(Gen.oneOf('{', '}', '[', ']', '"', '\\', 'u',
      ':', ',', '0', '.', '-', 'e', 'n', 't', 'f', ' ')).map(_.mkString)
    (samples(Gen.asciiPrintableStr, 300) ++ samples(jsonish, 300)).foreach {
      s => MiniJson.parse(s) // must return Left/Right, never throw
    }
  }
}
