package graft.cluster

import org.scalatest.funsuite.AnyFunSuite

import graft.texthash.AffineGap

/** Golden canonicalization fixtures from `tests/test_canonical.py`. */
class CanonicalSpec extends AnyFunSuite {

  test("getCentroid golden (test_canonical.py:7-38)") {
    val attributeList = Seq(
      "mary crane center",
      "mary crane center north",
      "mary crane league - mary crane - west",
      "mary crane league mary crane center (east)",
      "mary crane league mary crane center (north)",
      "mary crane league mary crane center (west)",
      "mary crane league - mary crane - east",
      "mary crane family and day care center",
      "mary crane west",
      "mary crane center east",
      "mary crane league mary crane center (east)",
      "mary crane league mary crane center (north)",
      "mary crane league mary crane center (west)",
      "mary crane league",
      "mary crane",
      "mary crane east 0-3",
      "mary crane north",
      "mary crane north 0-3",
      "mary crane league - mary crane - west",
      "mary crane league - mary crane - north",
      "mary crane league - mary crane - east",
      "mary crane league - mary crane - west",
      "mary crane league - mary crane - north",
      "mary crane league - mary crane - east"
    )
    assert(Canonical.getCentroid(attributeList) == "mary crane")
  }

  test("getCanonicalRep per field golden (test_canonical.py:40-58)") {
    val names = Seq("mary crane", "mary crane east", "mary crane west")
    val addresses = Seq("123 main st", "123 main street", "123 man st")
    val zips = Seq("12345", "", "")
    assert(Canonical.canonicalField(names) == "mary crane")
    assert(Canonical.canonicalField(addresses) == "123 main street")
    assert(Canonical.canonicalField(zips) == "12345")
    // two-record and single-record variants
    assert(Canonical.canonicalField(names.take(2)) == "mary crane")
    assert(Canonical.canonicalField(addresses.take(2)) == "123 main st")
    assert(Canonical.canonicalField(names.take(1)) == "mary crane")
  }

  test("affine gap distance basic properties") {
    // identical strings shortcut (affinegap semantics)
    assert(AffineGap.affineGapDistance("abc", "abc") == 3f)
    // symmetry
    val d1 = AffineGap.normalizedAffineGapDistance("mary crane", "mary crane east")
    val d2 = AffineGap.normalizedAffineGapDistance("mary crane east", "mary crane")
    assert(d1 == d2)
    // abbreviation cheaper than same-length mismatch
    val abbrev = AffineGap.affineGapDistance("mary crane", "mary crane center")
    val mismatch = AffineGap.affineGapDistance("mary crane", "mary brant")
    assert(abbrev < mismatch)
  }
}
