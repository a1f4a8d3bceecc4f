package graft.learn

import graft.texthash.Predicates

/**
 * Named blocking-predicate catalog for the blocking learner — the analogue
 * of the predicate set a `String` variable contributes to the
 * `Fingerprinter` (`variables/string.py:13-62` `base_predicates` +
 * `ShortStringType._predicate_functions`, each wrapped as a
 * `StringPredicate`, `predicates.py:97-103`).
 *
 * Names mirror the reference's `__name__` format
 * `"(funcName, field)"` so coverage goldens line up with
 * `tests/test_training.py` literally.
 *
 * `StringPredicate.__call__` semantics are reproduced exactly: the field is
 * preprocessed with strip-punctuation + whitespace-collapse
 * ([[Predicates.stringPreprocess]]), a falsy (null/empty) field yields no
 * keys. Index predicates (Tfidf/Levenshtein canopies) are NOT part of the
 * learnable zoo here — the engine realizes them as fixed LSH passes
 * (SURVEY.md §7.6); `learn` therefore implements the reference's
 * `index_predicates=False` mode (`training.py:97-103`).
 */
final case class NamedPredicate(name: String, keys: String => Set[String]) {
  /** `StringPredicate.__call__`: falsy field -> no keys. */
  def apply(field: String): Set[String] =
    if (field == null || field.isEmpty) Set.empty
    else keys(Predicates.stringPreprocess(field))
}

object NamedPredicate {
  /** `CompoundPredicate` (`predicates.py:344-375`): block keys are the
    * cross product of the parts' key sets, ':'-joined with ':' escaped as
    * '\:'. Works on the preprocessed field ([[Predicates.stringPreprocess]]
    * is idempotent, so parts see exactly what they'd see standalone); any
    * part with no keys empties the product, like `itertools.product`. */
  def compound(parts: Seq[NamedPredicate]): NamedPredicate = {
    require(parts.nonEmpty)
    NamedPredicate(
      parts.map(_.name).mkString("(", " + ", ")"),
      f => parts.map(_.keys(f).toSeq.sorted).foldLeft(Seq(Seq.empty[String])) {
        (acc, ks) => for { pre <- acc; k <- ks } yield pre :+ k // empty ks empties the product
      }.map(_.map(_.replace(":", "\\:")).mkString(":")).toSet)
  }
}

object PredicateZoo {

  /** Resolve learned rule part-lists ([[BlockLearner.Learned.conjunctions]])
    * to executable predicates against a zoo: single parts look up directly,
    * multi-part rules become [[NamedPredicate.compound]] conjunctions. */
  def resolve(conjunctions: Vector[Vector[String]],
              zoo: Seq[NamedPredicate]): Seq[NamedPredicate] = {
    val byName = zoo.map(p => p.name -> p).toMap
    conjunctions.map {
      case Vector(one) => byName(one)
      case many => NamedPredicate.compound(many.map(byName))
    }
  }

  /** The simple-predicate zoo of a `String(field)` variable, in the
    * reference's declaration order (`variables/string.py:13-32` base +
    * `:55-61` ShortString extras) — declaration order matters: the learner's
    * tie-breaks follow Python dict insertion order. */
  def stringPredicates(field: String): Seq[NamedPredicate] = Seq[(String, String => Set[String])](
    "wholeFieldPredicate" -> Predicates.wholeFieldPredicate,
    "firstTokenPredicate" -> Predicates.firstTokenPredicate,
    "firstTwoTokensPredicate" -> Predicates.firstTwoTokensPredicate,
    "commonIntegerPredicate" -> Predicates.commonIntegerPredicate,
    "nearIntegersPredicate" -> Predicates.nearIntegersPredicate,
    "firstIntegerPredicate" -> Predicates.firstIntegerPredicate,
    "hundredIntegerPredicate" -> Predicates.hundredIntegerPredicate,
    "hundredIntegersOddPredicate" -> Predicates.hundredIntegersOddPredicate,
    "alphaNumericPredicate" -> Predicates.alphaNumericPredicate,
    "sameThreeCharStartPredicate" -> Predicates.sameThreeCharStartPredicate,
    "sameFiveCharStartPredicate" -> Predicates.sameFiveCharStartPredicate,
    "sameSevenCharStartPredicate" -> Predicates.sameSevenCharStartPredicate,
    "commonTwoTokens" -> Predicates.commonTwoTokens,
    "commonThreeTokens" -> Predicates.commonThreeTokens,
    "fingerprint" -> Predicates.fingerprint,
    "oneGramFingerprint" -> Predicates.oneGramFingerprint,
    "twoGramFingerprint" -> Predicates.twoGramFingerprint,
    "sortedAcronym" -> Predicates.sortedAcronym,
    "commonFourGram" -> Predicates.commonFourGram,
    "commonSixGram" -> Predicates.commonSixGram,
    "tokenFieldPredicate" -> Predicates.tokenFieldPredicate,
    "suffixArray" -> Predicates.suffixArray,
    "doubleMetaphone" -> Predicates.doubleMetaphone,
    "metaphoneToken" -> Predicates.metaphoneToken
  ).map { case (n, f) => NamedPredicate(s"($n, $field)", f) }
}
