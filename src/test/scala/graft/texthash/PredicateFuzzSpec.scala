package graft.texthash

import org.scalatest.funsuite.AnyFunSuite

/**
 * Executed-reference fuzz parity: `src/test/resources/predicate_fuzz.json`
 * holds the keys the reference's OWN `predicate_functions.py` (executed
 * driver-side with pure-python cpredicates stand-ins, seed-42 fuzz corpus
 * of 257 strings incl. punctuation runs, digit clusters, unicode letters
 * and arabic-indic digits) emits for 22 string predicates. Every kernel
 * must reproduce every key set exactly — this is what caught the
 * ASCII-vs-unicode \w/\d divergence ((?U) flags + unicode-digit int
 * parsing, round 4).
 */
class PredicateFuzzSpec extends AnyFunSuite {

  private val funcs: Map[String, String => Set[String]] = {
    import Predicates._
    Map(
      "wholeFieldPredicate" -> wholeFieldPredicate, "tokenFieldPredicate" -> tokenFieldPredicate,
      "firstTokenPredicate" -> firstTokenPredicate, "firstTwoTokensPredicate" -> firstTwoTokensPredicate,
      "commonIntegerPredicate" -> commonIntegerPredicate, "alphaNumericPredicate" -> alphaNumericPredicate,
      "nearIntegersPredicate" -> nearIntegersPredicate, "hundredIntegerPredicate" -> hundredIntegerPredicate,
      "hundredIntegersOddPredicate" -> hundredIntegersOddPredicate, "firstIntegerPredicate" -> firstIntegerPredicate,
      "commonTwoTokens" -> commonTwoTokens, "commonThreeTokens" -> commonThreeTokens,
      "fingerprint" -> fingerprint, "oneGramFingerprint" -> oneGramFingerprint,
      "twoGramFingerprint" -> twoGramFingerprint, "commonFourGram" -> commonFourGram,
      "commonSixGram" -> commonSixGram, "sameThreeCharStartPredicate" -> sameThreeCharStartPredicate,
      "sameFiveCharStartPredicate" -> sameFiveCharStartPredicate,
      "sameSevenCharStartPredicate" -> sameSevenCharStartPredicate,
      "suffixArray" -> suffixArray, "sortedAcronym" -> sortedAcronym)
  }

  test("22 predicate kernels reproduce the executed reference on 257 fuzz strings") {
    val in = getClass.getResourceAsStream("/predicate_fuzz.json")
    assert(in != null, "predicate_fuzz.json resource missing")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
    var total = 0
    root.forEach { row =>
      val input = row.get("input").asText
      row.get("keys").properties().forEach { e =>
        funcs.get(e.getKey).foreach { f =>
          total += 1
          val want = (0 until e.getValue.size).map(e.getValue.get(_).asText).sorted
          val got = f(input).toSeq.sorted
          assert(got == want,
            s"${e.getKey}(${input.take(40)}): got ${got.take(5)} want ${want.take(5)}")
        }
      }
    }
    assert(total > 5000, s"fixture unexpectedly small: $total evaluations")
  }
}
