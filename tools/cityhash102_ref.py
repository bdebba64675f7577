#!/usr/bin/env python3
"""Independent Python transcription of CityHash128 v1.0.2 (Google's
public city.cc at tag 1.0.2 — the revision ClickHouse vendored for
compressed-frame checksums), used ONLY to generate cross-check vectors
for CityHash102Spec.

Provenance note (honest limits): no externally *published* vector set
for v1.0.2 is reachable from this offline sandbox (the round-5
retrieval request returned no usable material, no jar/crate/package in
the environment carries an independent implementation, and the
reference repo's only fixture is an uncompressed native file). This
script is therefore a second, from-scratch transcription of the same
public algorithm in a different language with different integer
semantics (Python bigints + explicit masking vs JVM wrapping Longs).
Agreement across thousands of inputs covering every length regime
rules out transcription slips in either port; it cannot rule out a
shared misreading of the published algorithm — that residual is
documented in COVERAGE.md and closes only with one real-ClickHouse
exchange (needs egress).

Usage: python3 tools/cityhash102_ref.py OUT.json
Writes {"vectors": [{"seed": int, "len": int, "low": "hex", "high": "hex"}...]}
where the input bytes for each row are gen_bytes(seed, len) below.
"""
import json
import sys

M = (1 << 64) - 1
K0 = 0xC3A5C85C97CB3127
K1 = 0xB492B66FBE98F273
K2 = 0x9AE16A3B2F90404F
K3 = 0xC949D7C7509E6557
KMUL = 0x9DDFEA08EB382D69


def f64(b, i):
    return int.from_bytes(b[i:i + 8], "little")


def f32(b, i):
    return int.from_bytes(b[i:i + 4], "little")


def rot(v, s):
    return v if s == 0 else ((v >> s) | (v << (64 - s))) & M


def rot1(v, s):
    # RotateByAtLeast1: callers guarantee 1 <= s <= 63
    return ((v >> s) | (v << (64 - s))) & M


def smix(v):
    return v ^ (v >> 47)


def h16(u, v):
    a = ((u ^ v) * KMUL) & M
    a ^= a >> 47
    b = ((v ^ a) * KMUL) & M
    b ^= b >> 47
    return (b * KMUL) & M


def h0to16(s, off, n):
    if n > 8:
        a = f64(s, off)
        b = f64(s, off + n - 8)
        return h16(a, rot1((b + n) & M, n)) ^ b
    if n >= 4:
        a = f32(s, off)
        return h16((n + (a << 3)) & M, f32(s, off + n - 4))
    if n > 0:
        a = s[off]
        b = s[off + (n >> 1)]
        c = s[off + n - 1]
        y = (a + (b << 8)) & M
        z = (n + (c << 2)) & M
        return (smix((y * K2 ^ z * K3) & M) * K2) & M
    return K2


def weak32(w, x, y, z, a, b):
    a = (a + w) & M
    b = rot((b + a + z) & M, 21)
    c = a
    a = (a + x + y) & M
    b = (b + rot(a, 44)) & M
    return (a + z) & M, (b + c) & M


def weak32b(s, off, a, b):
    return weak32(f64(s, off), f64(s, off + 8), f64(s, off + 16),
                  f64(s, off + 24), a, b)


def city_murmur(s, off, n, seed0, seed1):
    a, b, c, d = seed0, seed1, 0, 0
    l = n - 16
    if l <= 0:
        a = (smix((a * K1) & M) * K1) & M
        c = (b * K1 + h0to16(s, off, n)) & M
        d = smix((a + (f64(s, off) if n >= 8 else c)) & M)
    else:
        c = h16((f64(s, off + n - 8) + K1) & M, a)
        d = h16((b + n) & M, (c + f64(s, off + n - 16)) & M)
        a = (a + d) & M
        while True:
            a ^= (smix((f64(s, off) * K1) & M) * K1) & M
            a = (a * K1) & M
            b ^= a
            c ^= (smix((f64(s, off + 8) * K1) & M) * K1) & M
            c = (c * K1) & M
            d ^= c
            off += 16
            l -= 16
            if l <= 0:
                break
    a = h16(a, c)
    b = h16(d, b)
    return a ^ b, h16(b, a)


def city128_seed(s, off, n, seed0, seed1):
    if n < 128:
        return city_murmur(s, off, n, seed0, seed1)
    x, y = seed0, seed1
    z = (K1 * n) & M
    v0 = (rot(y ^ K1, 49) * K1 + f64(s, off)) & M
    v1 = (rot(v0, 42) * K1 + f64(s, off + 8)) & M
    w0 = (rot((y + z) & M, 35) * K1 + x) & M
    w1 = (rot((x + f64(s, off + 88)) & M, 53) * K1) & M
    while True:
        for _ in range(2):
            x = (rot((x + y + v0 + f64(s, off + 16)) & M, 37) * K1) & M
            y = (rot((y + v1 + f64(s, off + 48)) & M, 42) * K1) & M
            x ^= w1
            y ^= v0
            z = rot(z ^ w0, 33)
            v0, v1 = weak32b(s, off, (v1 * K1) & M, (x + w0) & M)
            w0, w1 = weak32b(s, off + 32, (z + w1) & M, y)
            z, x = x, z
            off += 64
        n -= 128
        if n < 128:
            break
    y = (y + rot(w0, 37) * K0 + z) & M
    x = (x + rot((v0 + z) & M, 49) * K0) & M
    tail_done = 0
    while tail_done < n:
        tail_done += 32
        y = (rot((y - x) & M, 42) * K0 + v1) & M
        w0 = (w0 + f64(s, off + n - tail_done + 16)) & M
        x = (rot(x, 49) * K0 + w0) & M
        w0 = (w0 + v0) & M
        v0, v1 = weak32b(s, off + n - tail_done, v0, w1)
    x = h16(x, v0)
    y = h16(y, w0)
    return (h16((x + v1) & M, w1) + y) & M, h16((x + w1) & M, (y + v1) & M)


def city_hash_128(s):
    n = len(s)
    if n >= 16:
        return city128_seed(s, 16, n - 16, f64(s, 0) ^ K3, f64(s, 8))
    if n >= 8:
        return city128_seed(b"", 0, 0, (f64(s, 0) ^ (n * K0)) & M,
                            f64(s, n - 8) ^ K1)
    return city128_seed(s, 0, n, K0, K1)


def gen_bytes(seed, n):
    """Deterministic input bytes — splitmix64 stream, same recipe as the
    Scala side of the cross-check (CityHash102Spec)."""
    out = bytearray(n)
    state = seed & M
    word = 0
    have = 0
    for i in range(n):
        if have == 0:
            state = (state + 0x9E3779B97F4A7C15) & M
            z = state
            z = (((z ^ (z >> 30)) & M) * 0xBF58476D1CE4E5B9) & M
            z = (((z ^ (z >> 27)) & M) * 0x94D049BB133111EB) & M
            word = z ^ (z >> 31)
            have = 8
        out[i] = word & 0xFF
        word >>= 8
        have -= 1
    return bytes(out)


def main():
    lengths = (list(range(0, 201)) +
               [255, 256, 257, 511, 512, 1000, 4095, 4096, 65536, 100003])
    vectors = []
    for n in lengths:
        for seed in (1, 0xDEADBEEF, n * 2654435761 + 1):
            lo, hi = city_hash_128(gen_bytes(seed, n))
            vectors.append({"seed": seed, "len": n,
                            "low": f"{lo:016x}", "high": f"{hi:016x}"})
    # one object per line so the Scala spec's regex parse stays trivial
    with open(sys.argv[1], "w") as f:
        f.write('{"vectors": [\n')
        f.write(",\n".join(json.dumps(v) for v in vectors))
        f.write("\n]}\n")
    print(f"wrote {len(vectors)} vectors")


if __name__ == "__main__":
    main()
