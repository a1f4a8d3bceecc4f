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
}
