package graft.sources.native

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pinned CityHash128 v1.0.2 outputs.
 *
 * These are REGRESSION vectors: frozen outputs of this port, covering
 * every internal length path (empty, <4, 4..7, 8..15, 16..127 murmur,
 * >=128 long loop). They anchor the implementation against accidental
 * drift during refactors — any change to these values means compressed
 * files written before the change can no longer be checksum-verified.
 *
 * They are NOT external validation: this environment has no network and
 * no other CityHash v1.0.2 implementation (no clickhouse binary, no
 * cityhash python module, nothing on the Spark classpath), so published
 * vectors (e.g. clickhouse-java's ClickHouseCityHash tests) could not be
 * retrieved. Until differentially validated against a live ClickHouse
 * server, interop with real ClickHouse compressed files is unproven —
 * which docs/REMOTE_SCAN.md and the CityHash102 header both state. The
 * structural spec (NativeCompressionSpec) covers determinism, avalanche,
 * and offset independence.
 */
class CityHash102Spec extends AnyFunSuite {

  private def hash(s: String): (Long, Long) = {
    val b = s.getBytes("UTF-8")
    val h = CityHash102.cityHash128(b, 0, b.length)
    (h(0), h(1))
  }

  test("pinned regression vectors across all length paths") {
    val vectors = Seq(
      // input, expected lo, expected hi — one per internal length class
      ("", 0x3df09dfc64c09a2bL, 0x3cb540c392e51e29L),                    // len 0
      ("a", 0xd27139a1afe01ad0L, 0xfd7e8ee2e4c86cf6L),                   // len 1 (<4)
      ("ab", 0xa8428869a6926838L, 0xd9c157109d63f0b7L),                  // len 2 (<4)
      ("abc", 0x900ff195577748feL, 0x13a9176355b20d7eL),                 // len 3 (<4)
      ("0123456789abcdef", 0xc52ea1adb29e4800L, 0x7369a2fab076de4cL),    // len 16
      ("ClickHouse Native frame checksum",
        0xc626d1fbd3d14433L, 0xc8869bad1e830279L),                       // len 32
      ("x" * 200, 0x727b8a4db3fc7690L, 0x57e35c44e20a490eL),             // len 200 (>=128 loop)
      ("The quick brown fox jumps over the lazy dog. " * 5,
        0xcc2bf5f68ffe579eL, 0xef871494ef8402c1L))                       // len 225 (>=128, tail)
    vectors.foreach { case (in, lo, hi) =>
      assert(hash(in) === ((lo, hi)),
        s"CityHash128 drift for input of length ${in.length} — frozen vectors " +
          "protect previously-written compressed files; do not update them " +
          "without a migration story")
    }
  }
}
