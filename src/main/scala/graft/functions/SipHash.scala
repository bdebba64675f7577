package graft.functions

/**
 * SipHash-2-4 (Aumasson–Bernstein), implemented from the published
 * specification: 2 compression rounds per 8-byte word, 4 finalization
 * rounds, the standard "somepseudorandomlygeneratedbytes" IV, and the
 * final word carrying `len << 56 | tail` little-endian.
 *
 * ClickHouse's `sipHash64(s)` is SipHash-2-4 of the string bytes with
 * the all-zero key (its public implementation's fixed default), which
 * is what [[hash64]] with k0 = k1 = 0 computes. The keyed core is
 * validated in `SipHashSpec` against the specification paper's own
 * Appendix-A test vectors (key 000102…0f) — a match there pins the
 * round structure and IV exactly. Parity with a live ClickHouse
 * server is untestable in this offline environment (the same
 * egress-blocked residual as the CityHash128 checksum vectors,
 * FIXTURES.md); the zero-key outputs are additionally frozen as
 * regression vectors.
 *
 * NOTE: Spark has no unsigned 64-bit type, so values >= 2^63 surface
 * as negative Longs — the same documented UInt64 policy as the native
 * reader (ChType.ChUInt64).
 */
object SipHash {

  @inline private def rotl(x: Long, b: Int): Long = (x << b) | (x >>> (64 - b))

  /** SipHash-2-4 of `data` under key (k0, k1). */
  def hash64(k0: Long, k1: Long, data: Array[Byte]): Long = {
    var v0 = k0 ^ 0x736f6d6570736575L
    var v1 = k1 ^ 0x646f72616e646f6dL
    var v2 = k0 ^ 0x6c7967656e657261L
    var v3 = k1 ^ 0x7465646279746573L

    @inline def sipRound(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }

    val n = data.length
    val end = n - (n % 8)
    var i = 0
    while (i < end) {
      val m = (data(i) & 0xffL) | ((data(i + 1) & 0xffL) << 8) |
        ((data(i + 2) & 0xffL) << 16) | ((data(i + 3) & 0xffL) << 24) |
        ((data(i + 4) & 0xffL) << 32) | ((data(i + 5) & 0xffL) << 40) |
        ((data(i + 6) & 0xffL) << 48) | ((data(i + 7) & 0xffL) << 56)
      v3 ^= m
      sipRound(); sipRound()
      v0 ^= m
      i += 8
    }
    // last word: length byte on top of the little-endian tail
    var b = n.toLong << 56
    var j = n - end - 1
    while (j >= 0) {
      b |= (data(end + j) & 0xffL) << (8 * j)
      j -= 1
    }
    v3 ^= b
    sipRound(); sipRound()
    v0 ^= b
    v2 ^= 0xff
    sipRound(); sipRound(); sipRound(); sipRound()
    v0 ^ v1 ^ v2 ^ v3
  }

  /** ClickHouse `sipHash64`: the zero-key instance over raw bytes. */
  def hash64Zero(data: Array[Byte]): Long = hash64(0L, 0L, data)
}
