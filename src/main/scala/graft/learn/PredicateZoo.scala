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
final case class NamedPredicate(name: String, keys: String => Set[String],
                                preprocess: Boolean = true,
                                falsyGuard: Boolean = true) {
  /** `StringPredicate.__call__` (preprocess=true) or `SimplePredicate`
    * (preprocess=false, `predicates.py:81-94`: typed fields are fed raw);
    * `falsyGuard=false` is `ExistsPredicate.__call__` (`predicates.py:120`),
    * which keys even a missing field. Non-string fields arrive through
    * their [[DataModel]] string codec. */
  def apply(field: String): Set[String] =
    if (falsyGuard && (field == null || field.isEmpty)) Set.empty
    else if (field == null) keys("")
    else keys(if (preprocess) Predicates.stringPreprocess(field) else field)
}

object NamedPredicate {
  /** `CompoundPredicate` (`predicates.py:344-375`): block keys are the
    * cross product of the parts' key sets, ':'-joined with ':' escaped as
    * '\:'. Each part applies its OWN call semantics (preprocess /
    * falsy-guard), exactly as the reference's compound calls each base
    * predicate on the record; any part with no keys empties the product,
    * like `itertools.product`. */
  def compound(parts: Seq[NamedPredicate]): NamedPredicate = {
    require(parts.nonEmpty)
    NamedPredicate(
      parts.map(_.name).mkString("(", " + ", ")"),
      f => parts.map(_.apply(f).toSeq.sorted).foldLeft(Seq(Seq.empty[String])) {
        (acc, ks) => for { pre <- acc; k <- ks } yield pre :+ k // empty ks empties the product
      }.map(_.map(_.replace(":", "\\:")).mkString(":")).toSet,
      preprocess = false, falsyGuard = false)
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

  /** The `Text` variable's zoo: the 18 `base_predicates`
    * (`variables/string.py:13-32`) — [[stringPredicates]] minus the six
    * ShortString extras (`:55-61`). */
  def textPredicates(field: String): Seq[NamedPredicate] =
    stringPredicates(field).take(18)

  /** `wholeFieldPredicate` as a `SimplePredicate` — NO preprocessing —
    * the form `Exact` / `Categorical` / `Price` variables declare
    * (`variables/exact.py:7-10`, `categorical_type.py:14`). */
  def wholeFieldSimple(field: String): NamedPredicate =
    NamedPredicate(s"(wholeFieldPredicate, $field)", f => Set(f), preprocess = false)

  /** The `Set` variable's 7 predicates (`variables/set.py:12-20`,
    * declaration order), over the [[DataModel.SetSep]]-joined codec.
    * `SimplePredicate` semantics: raw values, falsy (empty) set -> no keys. */
  def setPredicates(field: String): Seq[NamedPredicate] = {
    def over(name: String, f: Seq[String] => Set[String]) =
      NamedPredicate(s"($name, $field)", s => {
        val elems = s.split(DataModel.SetSep).toSeq.filter(_.nonEmpty)
        if (elems.isEmpty) Set.empty else f(elems)
      }, preprocess = false)
    Seq(
      over("wholeSetPredicate", Predicates.wholeSetPredicate),
      over("commonSetElementPredicate", Predicates.commonSetElementPredicate),
      over("lastSetElementPredicate", Predicates.lastSetElementPredicate),
      over("commonTwoElementsPredicate", Predicates.commonTwoElementsPredicate),
      over("commonThreeElementsPredicate", Predicates.commonThreeElementsPredicate),
      over("magnitudeOfCardinality", Predicates.magnitudeOfCardinality),
      over("firstSetElementPredicate", Predicates.firstSetElementPredicate))
  }

  /** The `LatLong` variable's predicate (`variables/latlong.py:15`) over
    * the `"lat,lon"` codec; the (0, 0) empty-grid rule lives in the kernel
    * (`predicates.py:198-211`). */
  def latLongPredicates(field: String): Seq[NamedPredicate] = Seq(
    NamedPredicate(s"(latLongGridPredicate, $field)", s => {
      val parts = s.split(",")
      Predicates.latLongGridPredicate(parts(0).toDouble, parts(1).toDouble)
    }, preprocess = false))

  /** The `Price` variable's 3 predicates (`variables/price.py:10-14`,
    * declaration order). `SimplePredicate` falsiness: a 0 price yields no
    * keys (`predicates.py:90-94` `if column:` on the float). */
  def pricePredicates(field: String): Seq[NamedPredicate] = {
    def over(name: String, f: Double => Set[String]) =
      NamedPredicate(s"($name, $field)", s => {
        val v = s.toDouble
        if (v == 0.0) Set.empty else f(v)
      }, preprocess = false)
    Seq(
      over("orderOfMagnitude", Predicates.orderOfMagnitude),
      over("wholeFieldPredicate", v => Set(v.toString)),
      over("roundTo1", Predicates.roundTo1))
  }

  /**
   * LSH canopy predicates — the engine's LEARNABLE realization of the
   * reference's index predicates (`TfidfNGramCanopyPredicate` at thresholds
   * 0.2/0.4/0.6/0.8, `variables/string.py:64-67`; selection mode
   * `training.py:97-103` `index_predicates=True`): each threshold becomes a
   * pure char-2-gram MinHash band-key function, so the set-cover learner
   * can SELECT a canopy exactly like a simple predicate and the blocked
   * self-join runs it like any other key — no mutable TF-IDF index, the
   * cluster-native replacement for `canopy_index.py`'s stateful canopies.
   *
   * Band/row shapes put the LSH S-curve midpoint `(1/b)^(1/r)` nearest
   * each reference threshold; seeds derive from (threshold, field) so
   * different canopies never share keys (and the band index is folded into
   * every key, the `blocking.py:109` block-key suffix analogue).
   */
  def canopyPredicates(field: String,
                       thresholds: Seq[Double] = Seq(0.2, 0.4, 0.6, 0.8)): Seq[NamedPredicate] = {
    import graft.texthash.TextHash
    val shapes = Map(0.2 -> ((16, 2)), 0.4 -> ((10, 3)), 0.6 -> ((8, 4)), 0.8 -> ((4, 8)))
    thresholds.map { t =>
      val (b, r) = shapes.getOrElse(t, throw new IllegalArgumentException(
        s"no LSH shape for canopy threshold $t (supported: ${shapes.keys.toSeq.sorted.mkString(", ")})"))
      val seed = TextHash.hashString(s"canopy:$t:$field", 42L)
      NamedPredicate(s"(TfidfNGramCanopyPredicate-$t, $field)", f => {
        val sig = TextHash.minhashSignature(TextHash.shingleHashes(f, 2, seed), b * r, seed)
        TextHash.bandKeys(sig, b).iterator.map(java.lang.Long.toHexString).toSet
      })
    }
  }

  /** `ExistsPredicate` (`predicates.py:106-122`): keys "1"/"0" by field
    * truthiness, EVEN when the field is missing (no falsy guard). Python
    * truthiness per kind: a 0 price is falsy, everything else goes by
    * null/empty on the codec. */
  def existsPredicate(field: String, kind: String = "string"): NamedPredicate =
    NamedPredicate(s"(Exists, $field)", s => {
      val truthy = s != null && s.nonEmpty &&
        (kind != "price" || s.toDouble != 0.0)
      Set(if (truthy) "1" else "0")
    }, preprocess = false, falsyGuard = false)
}
