package graft.texthash

import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.expressions.XXH64

/**
 * Pure text-hashing kernel: normalization, character shingling, MinHash
 * signatures, LSH band keys and SimHash fingerprints.
 *
 * Deterministic by construction (no clock, no `Random`): every function is a
 * pure function of its arguments + an explicit seed, so signatures are
 * identical across partitionings and parallelism levels (north-rule
 * determinism requirement).
 *
 * Semantics derive from the reference (dedupeio/dedupe):
 *  - normalization mirrors `benchmarks/benchmarks/common.py:12-19`
 *    (collapse runs of spaces, newline->space, strip, strip quotes, lower)
 *  - char shingling mirrors `cpredicates.pyx:24-42` (`unique_ngrams`)
 *  - MinHash/LSH replaces the TF-IDF canopy predicates
 *    (`predicates.py:276-325`, `canopy_index.py`) with a stateless,
 *    shuffle-friendly equivalent (see SURVEY.md §2.2).
 *
 * The hash primitive is xxHash64 — the exact implementation Spark's
 * `functions.xxhash64` uses ([[XXH64]]) — so column-level and driver-level
 * hashing agree bit-for-bit.
 */
object TextHash {

  /** xxhash64 of a string's UTF-8 bytes. Matches Spark's `xxhash64(col)`
    * for StringType when given the same seed. */
  def hashString(s: String, seed: Long): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), seed)
  }

  def hashUtf8(u: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), seed)

  /** SplitMix64 finalizer — public-domain PRNG step (Steele et al.),
    * used to derive the per-hash-function MinHash coefficients. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Normalization mirroring the reference benchmark pre-process
    * (`benchmarks/benchmarks/common.py:12-19`), in the exact same order:
    * collapse 2+ spaces, newline->space, strip, strip '"', strip "'",
    * lowercase. Byte-identical per input across runs (north-rule invariant).
    * Returns null for empty results (the reference maps "" -> None). */
  def normalizeText(raw: String): String = {
    if (raw == null) return null
    var s = collapseSpaces(raw)
    s = s.replace('\n', ' ')
    s = pyStrip(s)
    s = stripChar(s, '"')
    s = stripChar(s, '\'')
    s = s.toLowerCase(java.util.Locale.ROOT)
    if (s.isEmpty) null else s
  }

  /** re.sub("  +", " ", s): collapse runs of 2+ ASCII spaces only. */
  private def collapseSpaces(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      sb.append(c)
      if (c == ' ') { while (i + 1 < n && s.charAt(i + 1) == ' ') i += 1 }
      i += 1
    }
    sb.toString
  }

  /** Python str.strip(ch): remove leading+trailing occurrences of ch. */
  /** Python str.isspace() set: ASCII \t-\r + space, 0x1c-0x1f, NEL 0x85,
    * and the unicode Zs/Zl/Zp separator categories (NBSP, thin space,
    * line/paragraph separators, ideographic space...). Java's `trim`
    * (chars <= 0x20) misses all the unicode ones — the reference's
    * `.strip()` does not, and the north rule pins byte-identical normalized
    * text (executed-reference fuzz: PreprocessFuzzSpec). */
  private def pyIsSpace(c: Char): Boolean =
    (c == ' ') || (c >= '\t' && c <= '\r') || (c >= 0x1c && c <= 0x1f) ||
      c == 0x85 || {
        val t = Character.getType(c)
        t == Character.SPACE_SEPARATOR || t == Character.LINE_SEPARATOR ||
          t == Character.PARAGRAPH_SEPARATOR
      }

  /** Python str.strip(): drop leading/trailing isspace() chars. */
  private def pyStrip(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && pyIsSpace(s.charAt(a))) a += 1
    while (b > a && pyIsSpace(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  private def stripChar(s: String, ch: Char): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ch) a += 1
    while (b > a && s.charAt(b - 1) == ch) b -= 1
    s.substring(a, b)
  }

  /**
   * Distinct character k-shingle hashes, sorted ascending.
   * Semantics of `unique_ngrams(field, k)` (`cpredicates.pyx:24-42`) with the
   * shingle string replaced by its xxhash64. Sorted-distinct so that exact
   * Jaccard over two docs is a linear merge and the array is a canonical
   * (partitioning-independent) value. Empty array when len(text) < k.
   */
  /** Shingle hashes are truncated to 32 bits: per-pair Jaccard perturbation
    * is ~|A||B|/2^32 ~ 1e-5 (immaterial at threshold granularity). Shipping
    * them as array<int> (not zero-masked longs) halves the RAW bytes of the
    * verify stage's dominant array exchange — measured 40 GB/1.2M docs as
    * longs — on top of what shuffle compression already recovered. */
  val ShingleMask = 0xffffffffL

  def shingleHashes(text: String, k: Int, seed: Long): Array[Int] = {
    if (text == null) return Array.emptyIntArray
    val n = text.length - k + 1
    if (n <= 0) return Array.emptyIntArray
    // allocation-free hot loop: hash UTF-8 byte windows of the char-level
    // shingles directly (char->byte offset table for non-ASCII); boxing a
    // TreeSet per doc was an allocation wall at high parallelism
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val buf = new Array[Int](n)
    if (bytes.length == text.length) { // ASCII fast path: byte idx == char idx
      var i = 0
      while (i < n) {
        buf(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, k, seed).toInt
        i += 1
      }
    } else {
      // byte offset of each char index (BMP-exact; windows slice at char
      // boundaries like Python str slicing)
      val off = new Array[Int](text.length + 1)
      var ci = 0; var bi = 0
      while (ci < text.length) {
        off(ci) = bi
        val c = text.charAt(ci)
        bi += (if (c < 0x80) 1
               else if (c < 0x800) 2
               else if (Character.isHighSurrogate(c)) 4 // pair encodes as 4 bytes
               else if (Character.isLowSurrogate(c)) 0 // counted at the high half
               else 3)
        ci += 1
      }
      off(text.length) = bytes.length
      var i = 0
      while (i < n) {
        buf(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + off(i),
          off(i + k) - off(i), seed).toInt
        i += 1
      }
    }
    sortedDistinct(buf)
  }

  /** Sort + in-place dedup, returning a right-sized array. */
  private def sortedDistinct(buf: Array[Long]): Array[Long] = {
    java.util.Arrays.sort(buf)
    var w = 0; var r = 0
    while (r < buf.length) {
      if (w == 0 || buf(w - 1) != buf(r)) { buf(w) = buf(r); w += 1 }
      r += 1
    }
    if (w == buf.length) buf else java.util.Arrays.copyOf(buf, w)
  }

  private def sortedDistinct(buf: Array[Int]): Array[Int] = {
    java.util.Arrays.sort(buf)
    var w = 0; var r = 0
    while (r < buf.length) {
      if (w == 0 || buf(w - 1) != buf(r)) { buf(w) = buf(r); w += 1 }
      r += 1
    }
    if (w == buf.length) buf else java.util.Arrays.copyOf(buf, w)
  }

  /** Word tokens by the reference's `[\w']+` regex (`predicates.py:24`) —
    * UNICODE_CHARACTER_CLASS == the (?U) flag, for Python's unicode-aware
    * \w (see Predicates docs). Pattern compiled once (r6: the previous
    * `"...".r.findAllIn` built a fresh Regex — a Pattern.compile — plus a
    * boxing iterator on EVERY call, on the per-document simhash hot path). */
  private val WordPattern = java.util.regex.Pattern.compile("[\\w']+",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  def wordTokens(text: String): Array[String] = {
    if (text == null) return Array.empty
    val m = WordPattern.matcher(text)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) buf += m.group()
    buf.toArray
  }

  /** MinHash coefficient pairs (a_i odd, b_i) derived from the seed via
    * SplitMix64 — deterministic, no java.util.Random. */
  def minhashCoeffs(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var state = mix64(seed ^ 0x5DEECE66DL)
    var i = 0
    while (i < numHashes) {
      state = mix64(state); a(i) = state | 1L // odd multiplier
      state = mix64(state); b(i) = state
      i += 1
    }
    (a, b)
  }

  /**
   * MinHash signature over a doc's shingle-hash set: sig_i = min_h (a_i*h + b_i)
   * (mod 2^64, signed min — consistent everywhere so the choice is immaterial).
   * Returns null-signature (empty array) for empty shingle sets: such docs
   * emit no band keys, mirroring a dedupe predicate that emits no block keys
   * for an empty field (`predicates.py:90-95`).
   */
  def minhashSignature(shingles: Array[Int], numHashes: Int, seed: Long): Array[Long] = {
    if (shingles == null || shingles.isEmpty) return Array.emptyLongArray
    val (a, b) = coeffCache(numHashes, seed)
    val sig = new Array[Long](numHashes)
    val n = shingles.length
    // 4 hash functions per shingle pass (r6): the min update is a data
    // dependency chain, so a single chain caps ILP at ~1 compare/cycle;
    // four independent chains sharing each shingle load run ~2x faster
    // (microbenched 21 -> 9 us/doc at the 128-hash default). Identical
    // per-(i, shingle) arithmetic — bit-equal signatures.
    var i = 0
    while (i + 4 <= numHashes) {
      var m0 = Long.MaxValue; var m1 = Long.MaxValue
      var m2 = Long.MaxValue; var m3 = Long.MaxValue
      val a0 = a(i); val b0 = b(i); val a1 = a(i + 1); val b1 = b(i + 1)
      val a2 = a(i + 2); val b2 = b(i + 2); val a3 = a(i + 3); val b3 = b(i + 3)
      var j = 0
      while (j < n) {
        // zero-extend: the int IS the 32-bit-masked hash, so the signature
        // values are identical to the pre-int32 (masked long) representation
        val s = shingles(j) & ShingleMask
        val v0 = a0 * s + b0; if (v0 < m0) m0 = v0
        val v1 = a1 * s + b1; if (v1 < m1) m1 = v1
        val v2 = a2 * s + b2; if (v2 < m2) m2 = v2
        val v3 = a3 * s + b3; if (v3 < m3) m3 = v3
        j += 1
      }
      sig(i) = m0; sig(i + 1) = m1; sig(i + 2) = m2; sig(i + 3) = m3
      i += 4
    }
    while (i < numHashes) {
      var m = Long.MaxValue
      val ai = a(i); val bi = b(i)
      var j = 0
      while (j < n) {
        val v = ai * (shingles(j) & ShingleMask) + bi
        if (v < m) m = v
        j += 1
      }
      sig(i) = m
      i += 1
    }
    sig
  }

  // coefficient cache: tiny, computed once per (numHashes, seed) per JVM
  private val coeffs = new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()
  private def coeffCache(numHashes: Int, seed: Long): (Array[Long], Array[Long]) =
    coeffs.computeIfAbsent((numHashes, seed), { k: (Int, Long) => minhashCoeffs(k._1, k._2) })

  /**
   * LSH band keys: split the signature into `bands` bands of r = n/bands rows;
   * key_j = mix-fold of (band index, rows). The band index is folded in so keys
   * from different bands can never collide — the analogue of dedupe suffixing
   * block keys with the predicate index (`blocking.py:109`).
   * AND-construction within a band ≡ dedupe's CompoundPredicate conjunction
   * (`predicates.py:346-376`).
   */
  def bandKeys(sig: Array[Long], bands: Int): Array[Long] = {
    if (sig == null || sig.isEmpty) return Array.emptyLongArray
    val r = sig.length / bands
    val out = new Array[Long](bands)
    var bnd = 0
    while (bnd < bands) {
      var acc = mix64(bnd + 0x1234567L)
      var k = bnd * r
      val end = k + r
      while (k < end) { acc = mix64(acc ^ sig(k)); k += 1 }
      out(bnd) = acc
      bnd += 1
    }
    out
  }

  /**
   * 64-bit SimHash over word tokens (secondary fingerprint per the north
   * rule; plays the role of dedupe's Levenshtein ball index
   * (`levenshtein.py:9-37`) as a cheap "almost identical" signal).
   * Bit i of the result is 1 iff sum over tokens of ±1 (sign of bit i of the
   * token hash) is positive. Deterministic; empty input -> 0L.
   */
  def simhash64(tokens: Array[String], seed: Long): Long = {
    if (tokens == null || tokens.isEmpty) return 0L
    val counts = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = hashString(tokens(t), seed)
      var i = 0
      while (i < 64) {
        // branchless ±1: bit set -> +1, clear -> -1 (same sums as the
        // if/else form, minus 64 unpredictable branches per token)
        counts(i) += ((((h >>> i) & 1L) << 1) - 1L).toInt
        i += 1
      }
      t += 1
    }
    var res = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) res |= (1L << i); i += 1 }
    res
  }

  /** SimHash of the normalized text's word tokens. ASCII fast path (r6):
    * for ASCII text, token char offsets equal byte offsets, so each token's
    * xxhash64 is computed straight from the text's UTF-8 byte array at the
    * matcher's (start, end) — no per-token substring/UTF8String/byte-copy
    * allocations (3 per token before). Non-ASCII text takes the original
    * tokenize-then-hash path. Hash inputs are the same UTF-8 bytes either
    * way — bit-identical fingerprints. */
  def simhashText(text: String, seed: Long): Long = {
    if (text == null) return 0L
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (bytes.length != text.length) return simhash64(wordTokens(text), seed)
    val m = WordPattern.matcher(text)
    val counts = new Array[Int](64)
    var any = false
    while (m.find()) {
      any = true
      val s = m.start()
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + s,
        m.end() - s, seed)
      var i = 0
      while (i < 64) {
        counts(i) += ((((h >>> i) & 1L) << 1) - 1L).toInt
        i += 1
      }
    }
    if (!any) return 0L
    var res = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) res |= (1L << i); i += 1 }
    res
  }

  /** Hamming distance between two 64-bit fingerprints. */
  @inline def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Exact Jaccard of two sorted-distinct long arrays (linear merge). */
  def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Exact Jaccard of two sorted-distinct int arrays (the shingle
    * representation — see [[ShingleMask]]). */
  def jaccardSorted(a: Array[Int], b: Array[Int]): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /**
   * Fixed-width suffix keys for the suffix-array substring pass.
   * Web-scale variant of dedupe's `suffixArray` predicate
   * (`predicate_functions.py:142-147`, all suffixes of length >= 5):
   * emitting every suffix is O(L^2) bytes per doc, so we emit the hash of the
   * fixed-width window `text[i, i+w)` at every `every`-th suffix start —
   * two docs sharing any w-char substring at aligned sample offsets collide.
   * Distinct + sorted. Exact O(L^2) semantics live in [[Predicates.suffixArray]]
   * for the small-scale oracle.
   */
  def suffixKeys(text: String, w: Int, every: Int, seed: Long): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val n = text.length - w + 1
    if (n <= 0) return Array.emptyLongArray
    val count = (n + every - 1) / every
    val buf = new Array[Long](count)
    var i = 0; var j = 0
    while (i < n) {
      buf(j) = hashString(text.substring(i, i + w), seed)
      j += 1
      i += every
    }
    sortedDistinct(buf)
  }
}
