package graft.texthash

/**
 * Affine-gap string distance — Scala port of the public `affinegap` package
 * the reference uses as its String comparator (`variables/string.py:3-5`,
 * `canonical.py:5`): Gotoh dynamic programming with affine gap penalties and
 * an abbreviation discount for gaps extending past the end of the shorter
 * string. Default weights match the reference
 * (match=1, mismatch=11, gapOpen=10, gapExtend=7, abbreviationScale=0.125).
 *
 * Validated against the reference's golden centroid fixture
 * (`tests/test_canonical.py:7-38`).
 */
object AffineGap {

  def affineGapDistance(stringA: String, stringB: String,
                        matchWeight: Float = 1f,
                        mismatchWeight: Float = 11f,
                        gapWeight: Float = 10f,
                        spaceWeight: Float = 7f,
                        abbreviationScale: Float = 0.125f): Float = {
    var s1 = stringA; var s2 = stringB
    var length1 = s1.length; var length2 = s2.length

    if (s1 == s2 && matchWeight == math.min(matchWeight, math.min(mismatchWeight, gapWeight)))
      return matchWeight * length1

    if (length1 < length2) {
      val t = s1; s1 = s2; s2 = t
      val tl = length1; length1 = length2; length2 = tl
    }
    // s1 is now the longer string (length1 >= length2)

    val D = new Array[Float](length1 + 1) // gap in s2 (vertical)
    val vCurrent = new Array[Float](length1 + 1)
    val vPrevious = new Array[Float](length1 + 1)

    vCurrent(0) = 0f
    var j = 1
    while (j <= length1) {
      vCurrent(j) = gapWeight + spaceWeight * j
      D(j) = Float.PositiveInfinity
      j += 1
    }

    var i = 1
    while (i <= length2) {
      val char2 = s2.charAt(i - 1)
      System.arraycopy(vCurrent, 0, vPrevious, 0, length1 + 1)
      vCurrent(0) = gapWeight + spaceWeight * i
      var gapI = Float.PositiveInfinity // gap in s1 (horizontal)
      j = 1
      while (j <= length1) {
        val char1 = s1.charAt(j - 1)
        if (j <= length2) {
          gapI = math.min(gapI, vCurrent(j - 1) + gapWeight) + spaceWeight
        } else {
          // gaps extending beyond the end of the shorter string: the
          // abbreviation discount
          gapI = math.min(gapI, vCurrent(j - 1) + gapWeight * abbreviationScale) +
            spaceWeight * abbreviationScale
        }
        D(j) = math.min(D(j), vPrevious(j) + gapWeight) + spaceWeight
        val m = if (char2 == char1) vPrevious(j - 1) + matchWeight
                else vPrevious(j - 1) + mismatchWeight
        vCurrent(j) = math.min(math.min(gapI, D(j)), m)
        j += 1
      }
      i += 1
    }
    vCurrent(length1)
  }

  /** distance / (len1 + len2) — `normalizedAffineGapDistance`. */
  def normalizedAffineGapDistance(a: String, b: String): Float = {
    val normalizer = (a.length + b.length).toFloat
    require(normalizer > 0, "normalizedAffineGapDistance of two empty strings")
    affineGapDistance(a, b) / normalizer
  }
}
