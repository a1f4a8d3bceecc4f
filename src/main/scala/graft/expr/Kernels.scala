package graft.expr

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

import graft.texthash.TextHash

/**
 * Static kernels invoked from generated code (whole-stage codegen emits
 * direct static calls into this object — see the `doGenCode` bodies in
 * [[Exprs]]). They adapt Catalyst's internal types (UTF8String, ArrayData)
 * to the pure [[TextHash]] functions; one call per row, zero reflection.
 */
object Kernels {

  def normalizeText(s: UTF8String): UTF8String = {
    val n = TextHash.normalizeText(s.toString)
    if (n == null) null else UTF8String.fromString(n)
  }

  def shingleHashes(s: UTF8String, k: Int, seed: Long): ArrayData =
    new GenericArrayData(TextHash.shingleHashes(s.toString, k, seed))

  def minhashSignature(shingles: ArrayData, numHashes: Int, seed: Long): ArrayData =
    new GenericArrayData(TextHash.minhashSignature(shingles.toIntArray(), numHashes, seed))

  def bandKeys(sig: ArrayData, bands: Int): ArrayData =
    new GenericArrayData(TextHash.bandKeys(sig.toLongArray(), bands))

  def simhash64(s: UTF8String, seed: Long): Long =
    TextHash.simhashText(s.toString, seed)

  def hamming64(a: Long, b: Long): Int = TextHash.hamming64(a, b)

  def jaccardSorted(a: ArrayData, b: ArrayData): Double =
    TextHash.jaccardSorted(a.toIntArray(), b.toIntArray())

  def suffixKeys(s: UTF8String, w: Int, every: Int, seed: Long): ArrayData =
    new GenericArrayData(TextHash.suffixKeys(s.toString, w, every, seed))

  def affineGapNorm(a: UTF8String, b: UTF8String): Double =
    graft.texthash.AffineGap.normalizedAffineGapDistance(a.toString, b.toString).toDouble

  /** Longest common substring length (in code points — Spark's
    * substring/length unit, so the result is identical to the shared-window
    * diagonal-run identity the relational LCS queries used). Classic
    * O(|a|·|b|) rolling-row DP; inputs are prefix-bounded upstream, so per
    * pair cost is a small constant. */
  def lcsLen(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    if (a.length == 0 || b.length == 0) return 0L
    val prev = new Array[Int](b.length + 1)
    var best = 0
    var i = 0
    while (i < a.length) {
      var prevDiag = 0
      var j = 0
      val ai = a(i)
      while (j < b.length) {
        val tmp = prev(j + 1)
        if (ai == b(j)) {
          val v = prevDiag + 1
          prev(j + 1) = v
          if (v > best) best = v
        } else prev(j + 1) = 0
        prevDiag = tmp
        j += 1
      }
      i += 1
    }
    best.toLong
  }

  /** Integer dot product of two BIGINT arrays with zip_with-identical null
    * semantics: `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,v) -> acc+v)`
    * null-pads the shorter side, so any length mismatch nulls the whole sum —
    * callers check lengths and return SQL NULL in that case (see
    * [[Exprs.DotI64]]). */
  def dotI64(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  /** Integer squared L2 distance of two BIGINT arrays (null semantics as
    * [[dotI64]] — callers null out length mismatches). */
  def distSqI64(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { val d = a.getLong(i) - b.getLong(i); acc += d * d; i += 1 }
    acc
  }

  /** Integer sum of squares of a BIGINT array (the cosine norm term). */
  def norm2I64(a: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { val v = a.getLong(i); acc += v * v; i += 1 }
    acc
  }
}
