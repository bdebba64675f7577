package graft.functions

/**
 * Deterministic hashing primitives for the LLM-data-pipeline operators
 * (SURVEY §2.12): word shingles, MinHash signatures, SimHash, and a
 * winnowing rolling-hash fingerprint. Pure Scala, allocation-light,
 * fully seeded — the same text always produces the same signature on
 * any executor, which is what makes the distributed dedup joins
 * deterministic.
 */
object TextHash {

  /** splitmix64 — the seed sequence for the MinHash permutations. */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit seed/fold — the ONE definition of the constants;
    * every FNV surface in the library (string shingle hashes here,
    * the codegen'd expression, the writer's content-hash stream)
    * folds through these so they can never silently diverge. */
  val Fnv1a64Seed: Long = 0xcbf29ce484222325L
  @inline def fnv1a64Fold(h: Long, b: Byte): Long =
    (h ^ (b & 0xffL)) * 0x100000001b3L

  /** FNV-1a 64-bit over UTF-8 bytes — the base shingle hash. */
  def fnv1a64(s: String): Long = {
    var h = Fnv1a64Seed
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h = fnv1a64Fold(h, bytes(i))
      i += 1
    }
    h
  }

  /** Lowercased alphanumeric word stream (the tokenizer all dedup ops share). */
  def words(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Distinct hashed word n-gram shingles of a document. */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val w = words(text)
    if (w.length < n) {
      if (w.isEmpty) Array.empty else Array(fnv1a64(w.mkString(" ")))
    } else {
      val out = new scala.collection.mutable.HashSet[Long]
      var i = 0
      while (i + n <= w.length) {
        out += fnv1a64(w.slice(i, i + n).mkString(" "))
        i += 1
      }
      out.toArray
    }
  }

  /** Widest supported MinHash signature (permutation constant cache size). */
  val MaxK = 1024

  // Permutation constants precomputed once per JVM: permute() sits in the
  // innermost dedup loop (shingles × k calls per document), and deriving
  // a/b per call costs two extra splitmix rounds each time — 3× the work
  // for values that never change. Same values as the original derivation.
  private val permA: Array[Long] =
    Array.tabulate(MaxK)(i => splitmix64((2 * i + 1).toLong) | 1L) // odd
  private val permB: Array[Long] =
    Array.tabulate(MaxK)(i => splitmix64(-(i + 1).toLong))

  /** The i-th MinHash permutation: odd multiplier + offset, then mix. */
  @inline def permute(h: Long, i: Int): Long =
    splitmix64(permA(i) * h + permB(i))

  /** k-wide MinHash signature of a shingle-hash set. */
  def minhashSignature(shingles: Array[Long], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val h = shingles(s)
      var i = 0
      while (i < k) {
        val p = permute(h, i)
        if (p < sig(i)) sig(i) = p
        i += 1
      }
      s += 1
    }
    sig
  }

  /** Estimated Jaccard similarity = fraction of agreeing signature slots. */
  def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length, "signature widths differ")
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** Exact Jaccard over word n-gram shingle sets. */
  def exactJaccard(textA: String, textB: String, n: Int): Double = {
    val a = shingleHashes(textA, n).toSet
    val b = shingleHashes(textB, n).toSet
    if (a.isEmpty && b.isEmpty) 1.0
    else (a & b).size.toDouble / (a | b).size
  }

  /** 64-bit SimHash over the word stream (unit weights). */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    words(text).foreach { w =>
      val h = fnv1a64(w)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
        bit += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /**
   * Winnowing fingerprint (Schleimer et al., SIGMOD'03 idea): rolling
   * hashes of char k-grams, take the minimum per sliding window, XOR
   * the selected minima. One Long per document, robust to small edits.
   */
  def rollingFingerprint(text: String, k: Int = 8, window: Int = 16): Long = {
    val t = text.toLowerCase
    if (t.length < k) return fnv1a64(t)
    val n = t.length - k + 1
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) { hashes(i) = fnv1a64(t.substring(i, i + k)); i += 1 }
    var out = 0L
    var w = 0
    while (w < n) {
      val end = math.min(w + window, n)
      var m = Long.MaxValue
      var j = w
      while (j < end) { if (hashes(j) < m) m = hashes(j); j += 1 }
      out ^= m
      w += window
    }
    out
  }
}
