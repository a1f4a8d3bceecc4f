package graft.texthash

import org.scalatest.funsuite.AnyFunSuite
import Predicates._

/** Golden values ported from `tests/test_predicate_functions.py` and the
  * `cpredicates.pyx` docstrings. */
class PredicatesSpec extends AnyFunSuite {

  test("wholeFieldPredicate") {
    assert(wholeFieldPredicate("donald") == Set("donald"))
    assert(wholeFieldPredicate("go-of,y  ") == Set("go-of,y  "))
  }

  test("tokenFieldPredicate") {
    assert(tokenFieldPredicate("donald") == Set("donald"))
    assert(tokenFieldPredicate("do\nal d") == Set("do", "al", "d"))
    assert(tokenFieldPredicate("go-of y  ") == Set("go", "of", "y"))
    assert(tokenFieldPredicate(" cip   ciop ") == Set("cip", "ciop"))
  }

  test("firstTokenPredicate") {
    assert(firstTokenPredicate("donald") == Set("donald"))
    assert(firstTokenPredicate("don ald") == Set("don"))
    assert(firstTokenPredicate("do\nal d") == Set("do"))
    assert(firstTokenPredicate("go-of y  ") == Set("go"))
    assert(firstTokenPredicate(" cip   ciop ") == Set.empty[String])
  }

  test("firstTwoTokensPredicate") {
    assert(firstTwoTokensPredicate("donald") == Set.empty[String])
    assert(firstTwoTokensPredicate("don ald") == Set("don ald"))
    assert(firstTwoTokensPredicate("do\nal d") == Set("do\nal"))
    assert(firstTwoTokensPredicate("go-of y  ") == Set("go-of"))
    assert(firstTwoTokensPredicate(" cip   ciop ") == Set.empty[String])
  }

  test("commonIntegerPredicate") {
    assert(commonIntegerPredicate("don4ld") == Set("4"))
    assert(commonIntegerPredicate("donald 1992") == Set("1992"))
    assert(commonIntegerPredicate("g00fy  ") == Set("0"))
    assert(commonIntegerPredicate(" c1p   c10p ") == Set("1", "10"))
  }

  test("alphaNumericPredicate") {
    assert(alphaNumericPredicate("don4ld") == Set("don4ld"))
    assert(alphaNumericPredicate("donald 1992") == Set("1992"))
    assert(alphaNumericPredicate("g00fy  ") == Set("g00fy"))
    assert(alphaNumericPredicate(" c1p   c10p ") == Set("c1p", "c10p"))
  }

  test("nearIntegersPredicate") {
    assert(nearIntegersPredicate("don4ld") == Set("3", "4", "5"))
    assert(nearIntegersPredicate("donald 1992") == Set("1991", "1992", "1993"))
    assert(nearIntegersPredicate("g00fy  ") == Set("-1", "0", "1"))
    assert(nearIntegersPredicate(" c1p   c10p ") == Set("0", "1", "2", "9", "10", "11"))
  }

  test("hundredIntegerPredicate") {
    assert(hundredIntegerPredicate("don456ld") == Set("400"))
    assert(hundredIntegerPredicate("donald 1992") == Set("1900"))
    assert(hundredIntegerPredicate("g00fy  ") == Set("00"))
    assert(hundredIntegerPredicate(" c111p   c1230p ") == Set("100", "1200"))
  }

  test("hundredIntegersOddPredicate") {
    assert(hundredIntegersOddPredicate("don456ld") == Set("400"))
    assert(hundredIntegersOddPredicate("donald 1991") == Set("1901"))
    assert(hundredIntegersOddPredicate("g00fy  ") == Set("00"))
    assert(hundredIntegersOddPredicate(" c111p   c1230p ") == Set("101", "1200"))
  }

  test("firstIntegerPredicate") {
    assert(firstIntegerPredicate("donald 456") == Set.empty[String])
    assert(firstIntegerPredicate("1992 donald") == Set("1992"))
    assert(firstIntegerPredicate("00fy  ") == Set("00"))
    assert(firstIntegerPredicate("111 p   c1230p ") == Set("111"))
  }

  test("commonTwoTokens / commonThreeTokens") {
    assert(commonTwoTokens("d on 456 ld") == Set("d on", "on 456", "456 ld"))
    assert(commonTwoTokens("donald 1992") == Set("donald 1992"))
    assert(commonTwoTokens("g00fy  ") == Set.empty[String])
    assert(commonTwoTokens(" c1p   c10p ") == Set("c1p c10p"))
    assert(commonThreeTokens("d on 456 ld") == Set("d on 456", "on 456 ld"))
    assert(commonThreeTokens("donald 1992") == Set.empty[String])
    assert(commonThreeTokens(" c1p   c10p  c100p") == Set("c1p c10p c100p"))
  }

  test("fingerprint") {
    assert(fingerprint("don 456 ld ") == Set("456donld"))
    assert(fingerprint("donald 1991") == Set("1991donald"))
    assert(fingerprint(" g00fy  ") == Set("g00fy"))
    assert(fingerprint(" c11p   c10p ") == Set("c10pc11p"))
  }

  test("oneGramFingerprint") {
    assert(oneGramFingerprint("don 456 ld") == Set("456dlno"))
    assert(oneGramFingerprint("donald 1992") == Set("129adlno"))
    assert(oneGramFingerprint(" g00fy  ") == Set("0fgy"))
    assert(oneGramFingerprint(" c1p   c10p ") == Set("01cp"))
  }

  test("twoGramFingerprint") {
    assert(twoGramFingerprint("don4ld") == Set("4ldoldn4on"))
    assert(twoGramFingerprint("donald 1992") == Set("199299ald1doldnaon"))
    assert(twoGramFingerprint("g00fy  ") == Set("000ffyg0"))
    assert(twoGramFingerprint(" c1p   c10p ") == Set("0p101pc1pc"))
    assert(twoGramFingerprint("7") == Set.empty[String])
  }

  test("commonFourGram / commonSixGram") {
    assert(commonFourGram("don4ld") == Set("don4", "on4l", "n4ld"))
    assert(commonFourGram("donald 1992") ==
      Set("dona", "onal", "nald", "ald1", "ld19", "d199", "1992"))
    assert(commonFourGram("g00fy  ") == Set("g00f", "00fy"))
    assert(commonFourGram(" c1p   c10p ") == Set("c1pc", "1pc1", "pc10", "c10p"))
    assert(commonSixGram("don4ld") == Set("don4ld"))
    assert(commonSixGram("donald 1992") ==
      Set("donald", "onald1", "nald19", "ald199", "ld1992"))
    assert(commonSixGram("g00fy  ") == Set.empty[String])
    assert(commonSixGram(" c1p   c10p ") == Set("c1pc10", "1pc10p"))
  }

  test("sameXCharStartPredicate") {
    assert(sameThreeCharStartPredicate("don4ld") == Set("don"))
    assert(sameThreeCharStartPredicate(" c1p   c10p ") == Set("c1p"))
    assert(sameFiveCharStartPredicate("donald 1992") == Set("donal"))
    assert(sameFiveCharStartPredicate("g00fy  ") == Set("g00fy"))
    assert(sameSevenCharStartPredicate("don4ld") == Set("don4ld"))
    assert(sameSevenCharStartPredicate(" c1p   c10p ") == Set("c1pc10p"))
  }

  test("doubleMetaphone goldens (test_predicate_functions.py:207-211)") {
    assert(doubleMetaphone("i") == Set("A"))
    assert(doubleMetaphone("donald") == Set("TNLT"))
    assert(doubleMetaphone("goofy") == Set("KF"))
    assert(doubleMetaphone("cipciop") == Set("SPSP", "SPXP"))
  }

  test("metaphoneToken goldens (test_predicate_functions.py:213-217)") {
    assert(metaphoneToken("i") == Set("A"))
    assert(metaphoneToken("don ald") == Set("TN", "ALT"))
    assert(metaphoneToken("goo fy") == Set("K", "F"))
    assert(metaphoneToken("cip ciop") == Set("SP", "XP"))
  }

  test("doubleMetaphone classic published examples (Philips 2000)") {
    assert(Metaphone.doubleMetaphone("smith") == (("SM0", "XMT")))
    assert(Metaphone.doubleMetaphone("schmidt") == (("XMT", "SMT")))
    assert(Metaphone.doubleMetaphone("jose") == (("HS", "HS")))
    assert(Metaphone.doubleMetaphone("michael") == (("MKL", "MXL")))
    assert(Metaphone.doubleMetaphone("") == (("", "")))
  }

  test("suffixArray (predicate_functions.py:142-147)") {
    assert(suffixArray("deduplicate") ==
      Set("deduplicate", "eduplicate", "duplicate", "uplicate", "plicate", "licate", "icate"))
    assert(suffixArray("abcd") == Set.empty[String])
    assert(suffixArray("abcde") == Set("abcde"))
  }

  test("sortedAcronym") {
    assert(sortedAcronym("fight or flight") == Set("ffo"))
  }

  test("set predicates") {
    val s = Seq("b", "a", "c")
    assert(commonSetElementPredicate(s) == Set("a", "b", "c"))
    assert(commonTwoElementsPredicate(s) == Set("a b", "b c"))
    assert(commonThreeElementsPredicate(s) == Set("a b c"))
    assert(lastSetElementPredicate(s) == Set("c"))
    assert(firstSetElementPredicate(s) == Set("a"))
    assert(magnitudeOfCardinality(1 to 150) == Set("2"))
  }

  test("numeric predicates") {
    assert(orderOfMagnitude(10) == Set("1"))
    assert(orderOfMagnitude(9000) == Set("4"))
    assert(orderOfMagnitude(0) == Set.empty[String])
    assert(roundTo1(1234) == Set("1000"))
    assert(roundTo1(-5678) == Set("-6000"))
    assert(roundTo1(0.4) == Set("0"))
  }

  test("existsPredicate (predicates.py:106-122)") {
    assert(existsPredicate(null) == Set("0"))
    assert(existsPredicate("") == Set("0"))
    assert(existsPredicate("x") == Set("1"))
  }

  test("cpredicates ngrams/unique_ngrams/initials golden (cpredicates.pyx docstrings)") {
    assert(ngrams("deduplicate", 3) ==
      Seq("ded", "edu", "dup", "upl", "pli", "lic", "ica", "cat", "ate"))
    assert(uniqueNgrams("mississippi", 2) == Set("mi", "is", "ss", "si", "ip", "pp", "pi"))
    assert(initials("dedupe", 7) == Set("dedupe"))
    assert(initials("deduplication", 7) == Set("dedupli"))
  }

  test("stripPunc + StringPredicate preprocessing (predicates.py:27-31,97-103)") {
    assert(stripPunc("go-of,y") == "goofy")
    assert(stringPreprocess(" don's   go-of,y\nx ") == "dons goofy x")
  }
}
