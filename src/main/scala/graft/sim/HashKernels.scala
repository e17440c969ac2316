package graft.sim

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic hashing kernels for the near-duplicate pipeline:
  * MinHash signatures, SimHash fingerprints, rolling-hash document
  * fingerprints. All hash families are pinned by an explicit seed from
  * config (never wall-clock / JVM-hash dependent), so signatures are
  * reproducible across runs, sessions, and cluster sizes — the property
  * the reference achieves trivially by being single-process
  * (/root/reference/src/matcher.py:607-650 builds its blocking index
  * in-memory per run; we must be stable across distributed re-runs).
  *
  * Base 64-bit string hash = Spark's own XXH64 (same function behind the
  * built-in `xxhash64`), so fixtures and SQL cross-checks can reproduce
  * our hashes with built-ins.
  */
object HashKernels {

  /** Golden-ratio odd constant for deriving independent seeds. */
  final val SeedMix = 0x9e3779b97f4a7c15L

  @inline def hashString(s: UTF8String, seed: Long): Long =
    XXH64.hashUTF8String(s, seed)

  /** Per-slot multiply-shift permutation family: slot i maps a 64-bit
    * base hash x to a(i)*x + b(i) (wrapping); a(i) odd makes each map a
    * bijection on Z/2^64, and independently-drawn (a, b) make the
    * slots independent — unlike the h1 + i*h2 (Kirsch-Mitzenmacher)
    * shortcut, whose slots are linearly correlated and blow up the
    * estimator variance (caught by PropertySpec's 5-sigma bound).
    * Parameters derive deterministically from the seed.
    */
  private final class SlotPerms(numHashes: Int, seed: Long) {
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      a(i) = mix64(seed + i * SeedMix) | 1L
      b(i) = mix64(seed ^ (i * 0xc2b2ae3d27d4eb4fL + 0x165667b19e3779f9L))
      i += 1
    }
  }

  private val permCache = new java.util.concurrent.ConcurrentHashMap[(Int, Long), SlotPerms]()

  private def perms(numHashes: Int, seed: Long): SlotPerms =
    permCache.computeIfAbsent((numHashes, seed), _ => new SlotPerms(numHashes, seed))

  /** MinHash signature over a shingle array: per-shingle XXH64 base
    * hash, per-slot multiply-shift permutation, min per slot. Returns
    * null for empty input (a document with no shingles has no
    * similarity support).
    */
  def minhash(shingles: ArrayData, numHashes: Int, seed: Long): Array[Long] = {
    val n = shingles.numElements()
    if (n == 0) return null
    val p = perms(numHashes, seed)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!shingles.isNullAt(j)) {
        val x = XXH64.hashUTF8String(shingles.getUTF8String(j), seed)
        var i = 0
        while (i < numHashes) {
          val v = p.a(i) * x + p.b(i)
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      j += 1
    }
    sig
  }

  /** 64-bit SimHash over a token array: per-token XXH64, +1/-1 vote per
    * bit, sign -> bit. Duplicate tokens vote multiple times (term
    * frequency weighting). Empty input -> 0L.
    */
  def simhash(tokens: ArrayData, seed: Long): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) {
        val h = XXH64.hashUTF8String(tokens.getUTF8String(j), seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  // ------------------------------------------------ fused text kernels
  //
  // The normalized text contract (lower, collapse \s+ to single space,
  // trim) makes every word k-shingle a CONTIGUOUS BYTE RANGE of the
  // text, so signatures can be computed in one pass over the bytes with
  // zero per-shingle allocation. The hashes are byte-identical to
  // hashing the array_join'ed shingle strings (XXH64 hashes bytes), so
  // these fused kernels are drop-in equal to the Column-composition
  // path (word_shingles -> minhash) — asserted in SimKernelsSpec.

  /** Byte offsets of token boundaries in single-space-normalized text:
    * returns starts[0..n] with starts(n) = len+1 sentinel, so token i
    * spans [starts(i), starts(i+1)-1) and the k-shingle starting at i
    * spans [starts(i), starts(i+k)-1). Space (0x20) is never part of a
    * UTF-8 multibyte sequence, so a byte scan is safe.
    */
  private def tokenStarts(bytes: Array[Byte]): Array[Int] = {
    val n = bytes.length
    var count = if (n == 0) 0 else 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') count += 1; i += 1 }
    val starts = new Array[Int](count + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < n) { if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(count) = n + 1
    starts
  }

  /** Fused MinHash over word k-shingles of normalized text. Equal to
    * minhash(word_shingles(text, k), numHashes, seed). Null (no
    * support) for empty text.
    */
  def minhashWords(text: UTF8String, k: Int, numHashes: Int, seed: Long): Array[Long] = {
    val bytes = text.getBytes
    if (bytes.length == 0) return null
    val p = perms(numHashes, seed)
    val starts = tokenStarts(bytes)
    val nTok = starts.length - 1
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val nShingles = if (nTok <= k) 1 else nTok - k + 1
    val span = if (nTok <= k) nTok else k
    var j = 0
    while (j < nShingles) {
      val from = starts(j)
      val len = starts(j + span) - 1 - from
      val x = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from, len, seed)
      var i = 0
      while (i < numHashes) {
        val v = p.a(i) * x + p.b(i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    sig
  }

  /** Fused distinct shingle hashes (sorted): equal AS A SET to
    * array_distinct(transform(word_shingles(text,k), xxhash64)).
    */
  def shingleHashesWords(text: UTF8String, k: Int, seed: Long = 42L): Array[Long] = {
    val bytes = text.getBytes
    if (bytes.length == 0) return Array.empty[Long]
    val starts = tokenStarts(bytes)
    val nTok = starts.length - 1
    val nShingles = if (nTok <= k) 1 else nTok - k + 1
    val span = if (nTok <= k) nTok else k
    val out = new Array[Long](nShingles)
    var j = 0
    while (j < nShingles) {
      val from = starts(j)
      val len = starts(j + span) - 1 - from
      out(j) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from, len, seed)
      j += 1
    }
    java.util.Arrays.sort(out)
    // dedup in place
    var w = 0
    var r = 0
    while (r < out.length) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }

  /** Byte offsets of UTF-8 code-point starts: starts[0..n] with
    * starts(n) = byte length sentinel, so code point i spans
    * [starts(i), starts(i+1)) and the char k-shingle starting at i
    * spans [starts(i), starts(i+k)). A byte starts a code point iff
    * (b & 0xC0) != 0x80 — the same rule UTF8String.numChars /
    * substringSQL use, so offsets agree with Spark's `substring`.
    */
  private def charStarts(bytes: Array[Byte]): Array[Int] = {
    val n = bytes.length
    var count = 0
    var i = 0
    while (i < n) { if ((bytes(i) & 0xc0) != 0x80) count += 1; i += 1 }
    val starts = new Array[Int](count + 1)
    var c = 0
    i = 0
    while (i < n) { if ((bytes(i) & 0xc0) != 0x80) { starts(c) = i; c += 1 }; i += 1 }
    starts(count) = n
    starts
  }

  /** Fused MinHash over character k-shingles (code-point windows) of
    * text — the CJK/short-text path. Equal to
    * minhash(char_shingles(text, k), numHashes, seed): a char shingle
    * is a contiguous byte range of the text, so one byte pass computes
    * every shingle hash with zero per-shingle allocation. Null for
    * empty text (no similarity support).
    */
  def minhashChars(text: UTF8String, k: Int, numHashes: Int, seed: Long): Array[Long] = {
    val bytes = text.getBytes
    if (bytes.length == 0) return null
    val p = perms(numHashes, seed)
    val starts = charStarts(bytes)
    val nChars = starts.length - 1
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val nShingles = if (nChars <= k) 1 else nChars - k + 1
    val span = if (nChars <= k) nChars else k
    var j = 0
    while (j < nShingles) {
      val from = starts(j)
      val len = starts(j + span) - from
      val x = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from, len, seed)
      var i = 0
      while (i < numHashes) {
        val v = p.a(i) * x + p.b(i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    sig
  }

  /** Fused distinct char-shingle hashes (sorted): equal AS A SET to
    * array_distinct(transform(char_shingles(text,k), xxhash64)).
    */
  def shingleHashesChars(text: UTF8String, k: Int, seed: Long = 42L): Array[Long] = {
    val bytes = text.getBytes
    if (bytes.length == 0) return Array.empty[Long]
    val starts = charStarts(bytes)
    val nChars = starts.length - 1
    val nShingles = if (nChars <= k) 1 else nChars - k + 1
    val span = if (nChars <= k) nChars else k
    val out = new Array[Long](nShingles)
    var j = 0
    while (j < nShingles) {
      val from = starts(j)
      out(j) = XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + from, starts(j + span) - from, seed)
      j += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < out.length) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }

  /** Fused SimHash over whitespace tokens of normalized text. Equal to
    * simhash(ws_tokens(text), seed).
    */
  def simhashWords(text: UTF8String, seed: Long): Long = {
    val bytes = text.getBytes
    val counts = new Array[Int](64)
    if (bytes.length > 0) {
      val starts = tokenStarts(bytes)
      val nTok = starts.length - 1
      var j = 0
      while (j < nTok) {
        val from = starts(j)
        val len = starts(j + 1) - 1 - from
        val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from, len, seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        j += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Winnowing-style document fingerprint: polynomial rolling hash over
    * code points with window-minimum selection (Schleimer et al.,
    * SIGMOD'03 "Winnowing: Local Algorithms for Document
    * Fingerprinting"). Returns the selected k-gram hashes (distinct,
    * sorted) — a compact sketch for substring-level containment.
    */
  def winnowFingerprint(text: UTF8String, k: Int, window: Int): Array[Long] = {
    val s = text.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < k) {
      if (n == 0) return Array.empty[Long]
      // degenerate: hash the whole text
      return Array(XXH64.hashUTF8String(text, 0x77696e6eL))
    }
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    // polynomial rolling hash base 1000003 (odd), full 64-bit wrap
    val base = 1000003L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * base + cps(i); i += 1 }
    hashes(0) = mix64(h)
    i = 1
    while (i < nGrams) {
      h = (h - cps(i - 1) * pow) * base + cps(i + k - 1)
      hashes(i) = mix64(h)
      i += 1
    }
    if (nGrams <= window) {
      var min = hashes(0)
      i = 1
      while (i < nGrams) { if (lessU(hashes(i), min)) min = hashes(i); i += 1 }
      return Array(min)
    }
    // window-minimum selection (rightmost min per window, dedup adjacent)
    val out = new java.util.TreeSet[java.lang.Long]()
    var w = 0
    while (w <= nGrams - window) {
      var min = hashes(w)
      var idx = w
      var j = w + 1
      while (j < w + window) {
        if (lessU(hashes(j), min) || (hashes(j) == min && j > idx)) { min = hashes(j); idx = j }
        j += 1
      }
      out.add(min)
      w += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    arr
  }

  @inline private def lessU(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0

  /** Stafford variant-13 finalizer (public domain splitmix64 mix). */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
