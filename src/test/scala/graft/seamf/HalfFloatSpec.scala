package graft.seamf

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}

class HalfFloatSpec extends AnyFunSuite {

  test("known binary16 values decode exactly") {
    assert(HalfFloat.toFloat(0x3c00) === 1.0f)
    assert(HalfFloat.toFloat(0xc000) === -2.0f)
    assert(HalfFloat.toFloat(0x7bff) === 65504.0f) // max finite half
    assert(HalfFloat.toFloat(0x0001) === 5.9604645e-8f) // smallest subnormal
    assert(HalfFloat.toFloat(0x0000) === 0.0f)
    assert(HalfFloat.toFloat(0x8000) === -0.0f)
    assert(HalfFloat.toFloat(0x7c00).isPosInfinity)
    assert(HalfFloat.toFloat(0xfc00).isNegInfinity)
    assert(HalfFloat.toFloat(0x7e00).isNaN)
    assert(HalfFloat.toFloat(0x3555) === 0.33325195f) // ~1/3
  }

  test("encode(decode(h)) is the identity on all 65536 bit patterns") {
    (0 until 0x10000).foreach { h =>
      val f = HalfFloat.toFloat(h)
      if (!f.isNaN) {
        val back = HalfFloat.fromFloat(f) & 0xffff
        assert(back === h, f"pattern 0x$h%04x -> $f -> 0x$back%04x")
      }
    }
  }

  test("decode(encode(f)) round-trips representable floats (property)") {
    val prop = Prop.forAll(Gen.chooseNum(-60000.0f, 60000.0f)) { f =>
      val once = HalfFloat.toFloat(HalfFloat.fromFloat(f) & 0xffff)
      val twice = HalfFloat.toFloat(HalfFloat.fromFloat(once) & 0xffff)
      once == twice // idempotent after first quantization
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("vector codec round-trips little-endian payloads") {
    val vals = Array(1.0f, -2.5f, 0.0f, 100.25f, -0.125f)
    val decoded = HalfFloat.decodeVector(HalfFloat.encodeVector(vals))
    assert(decoded.toSeq === vals.toSeq) // all exactly half-representable
  }
}
