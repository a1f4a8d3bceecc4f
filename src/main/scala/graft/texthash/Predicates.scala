package graft.texthash

import scala.collection.immutable.SortedSet

/**
 * Reference-parity blocking predicate functions.
 *
 * Each is a pure `value => Set[blockKey]` function with the exact semantics
 * of `dedupe/predicate_functions.py` + `dedupe/cpredicates.pyx` (cited per
 * function), validated against the golden values in
 * `tests/test_predicate_functions.py`. These feed (a) golden parity specs,
 * (b) the in-JVM small-scale oracle, and (c) cross-checks of the Column
 * (Catalyst) implementations in [[graft.ops.Queries]].
 */
object Predicates {

  // (?U): Python 3 regexes are unicode-aware — \w matches é/ß/中 and \d
  // matches e.g. arabic-indic digits; Java defaults to ASCII classes, which
  // silently splits unicode tokens (caught by the executed-reference fuzz
  // fixture, PredicateFuzzSpec). UNICODE_CHARACTER_CLASS restores parity.
  private val WordsRe = "(?U)[\\w']+".r // predicates.py:24
  private val IntsRe = "(?U)\\d+".r // predicate_functions.py:12
  private val StartWordRe = "(?U)^([\\w']+)".r // predicate_functions.py:13
  private val TwoStartWordsRe = "(?U)^([\\w']+[^\\w]+[\\w']+)".r // :14 (\W+ == [^\w]+)
  private val StartIntRe = "(?U)^(\\d+)".r // :15
  private val AlphaNumRe = "(?U)(?=[a-zA-Z]*\\d)[a-zA-Z\\d]+".r // :16

  /** predicates.py:27-31 — remove ASCII punctuation (string.punctuation). */
  def stripPunc(s: String): String = {
    val punct = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
    s.filterNot(punct.contains(_))
  }

  // Python str.split() whitespace = Unicode White_Space (Java (?U)\s) PLUS
  // the C0 separators FS/GS/RS/US (0x1c-0x1f), which White_Space excludes —
  // Py_UNICODE_ISSPACE special-cases them. Splitting on \s alone keeps
  // 'ab' as one token where Python yields two (executed-reference
  // fuzz rows with 0x1c-0x1f pin this).
  private val PySplitRe = "(?U)[\\s\\x1c-\\x1f]+"

  /** StringPredicate preprocessing (predicates.py:97-103):
    * strip punctuation then collapse all whitespace to single spaces. */
  def stringPreprocess(s: String): String =
    stripPunc(s).split(PySplitRe).filter(_.nonEmpty).mkString(" ")

  // --- simple string predicates (predicate_functions.py) ------------------

  def wholeFieldPredicate(f: String): Set[String] = Set(f) // :19-21

  def tokenFieldPredicate(f: String): Set[String] = WordsRe.findAllIn(f).toSet // :24-26

  def firstTokenPredicate(f: String): Set[String] = // :29-34
    StartWordRe.findFirstMatchIn(f).map(m => Set(m.group(1))).getOrElse(Set.empty)

  def firstTwoTokensPredicate(f: String): Set[String] = // :37-42
    TwoStartWordsRe.findFirstMatchIn(f).map(m => Set(m.group(1))).getOrElse(Set.empty)

  /** Python `int(s)` for a \d-matched string — unicode digits included
    * (int("٣٤") == 34); output renders in ASCII like str(int(s)). */
  private def pyInt(s: String): BigInt =
    s.foldLeft(BigInt(0))((acc, c) => acc * 10 + Character.digit(c, 10))

  private def stripLeadingZeros(s: String): String = pyInt(s).toString

  def commonIntegerPredicate(f: String): Set[String] = // :45-49
    IntsRe.findAllIn(f).map(stripLeadingZeros).toSet

  def alphaNumericPredicate(f: String): Set[String] = AlphaNumRe.findAllIn(f).toSet // :52-53

  def nearIntegersPredicate(f: String): Set[String] = // :56-66
    IntsRe.findAllIn(f).flatMap { s =>
      val n = pyInt(s)
      Seq((n - 1).toString, n.toString, (n + 1).toString)
    }.toSet

  def hundredIntegerPredicate(f: String): Set[String] = // :69-70
    IntsRe.findAllIn(f).map(i => stripLeadingZeros(i).dropRight(2) + "00").toSet

  def hundredIntegersOddPredicate(f: String): Set[String] = // :73-74
    IntsRe.findAllIn(f).map { i =>
      val s = stripLeadingZeros(i)
      s.dropRight(2) + "0" + (pyInt(i) mod 2).toString
    }.toSet

  def firstIntegerPredicate(f: String): Set[String] = // :77-82
    StartIntRe.findFirstMatchIn(f).map(m => Set(m.group(1))).getOrElse(Set.empty)

  /** Word n-grams over a token sequence (predicate_functions.py:85-91). */
  def ngramsTokens(tokens: Seq[String], n: Int): Set[String] = {
    val L = tokens.length
    (0 until L).flatMap { i =>
      // range(i+n, min(L, i+n)+1): yields a single j=i+n iff i+n <= L
      if (i + n <= L) Some(tokens.slice(i, i + n).mkString(" ")) else None
    }.toSet
  }

  def commonTwoTokens(f: String): Set[String] = ngramsTokens(pySplit(f), 2) // :94-95
  def commonThreeTokens(f: String): Set[String] = ngramsTokens(pySplit(f), 3) // :98-99

  /** Python str.split() — split on (unicode) whitespace runs incl.
    * 0x1c-0x1f (see [[PySplitRe]]), no empties. */
  def pySplit(s: String): Seq[String] = s.split(PySplitRe).filter(_.nonEmpty).toSeq

  def fingerprint(f: String): Set[String] = Set(pySplit(f).sorted.mkString("")) // :102-103

  def oneGramFingerprint(f: String): Set[String] = // :106-107
    Set(SortedSet(f.replace(" ", "").toSeq: _*).mkString(""))

  def twoGramFingerprint(f: String): Set[String] = // :110-114
    if (f.length > 1)
      Set(uniqueNgrams(f.replace(" ", ""), 2).toSeq.sorted.mkString(""))
    else Set.empty

  def commonFourGram(f: String): Set[String] = uniqueNgrams(f.replace(" ", ""), 4) // :117-119
  def commonSixGram(f: String): Set[String] = uniqueNgrams(f.replace(" ", ""), 6) // :122-124

  def sameThreeCharStartPredicate(f: String): Set[String] = initials(f.replace(" ", ""), 3) // :127-129
  def sameFiveCharStartPredicate(f: String): Set[String] = initials(f.replace(" ", ""), 5) // :132-134
  def sameSevenCharStartPredicate(f: String): Set[String] = initials(f.replace(" ", ""), 7) // :137-139

  /** All suffixes of length >= 5 (predicate_functions.py:142-147). */
  def suffixArray(f: String): Set[String] = {
    val n = f.length - 4
    if (n > 0) (0 until n).map(f.substring(_)).toSet else Set.empty
  }

  def sortedAcronym(f: String): Set[String] = // :150-151
    Set(pySplit(f).map(_.charAt(0)).sorted.mkString(""))

  /** Nonempty Double Metaphone codes of the whole field (:154-155). */
  def doubleMetaphone(f: String): Set[String] = {
    val (p, s) = Metaphone.doubleMetaphone(f)
    Set(p, s).filter(_.nonEmpty)
  }

  /** Nonempty Double Metaphone codes of each whitespace token (:158-165). */
  def metaphoneToken(f: String): Set[String] =
    pySplit(f).iterator.flatMap { tok =>
      val (p, s) = Metaphone.doubleMetaphone(tok)
      Iterator(p, s)
    }.filter(_.nonEmpty).toSet

  // --- set predicates ------------------------------------------------------

  def wholeSetPredicate(s: Seq[String]): Set[String] = // :168-169 (str() of a python tuple/list not reproduced; canonical repr)
    Set(s.mkString("(", ", ", ")"))

  def commonSetElementPredicate(s: Seq[String]): Set[String] = s.toSet // :172-175

  def commonTwoElementsPredicate(s: Seq[String]): Set[String] = ngramsTokens(s.sorted, 2) // :178-179
  def commonThreeElementsPredicate(s: Seq[String]): Set[String] = ngramsTokens(s.sorted, 3) // :182-183

  def lastSetElementPredicate(s: Seq[String]): Set[String] = Set(s.max) // :186-187
  def firstSetElementPredicate(s: Seq[String]): Set[String] = Set(s.min) // :190-191

  def magnitudeOfCardinality(s: Seq[_]): Set[String] = orderOfMagnitude(s.size.toDouble) // :194-195

  // --- numeric / geo predicates --------------------------------------------

  def latLongGridPredicate(lat: Double, lon: Double): Set[String] = // :198-211
    if (lat != 0.0 || lon != 0.0)
      Set(f"(${pyRound(lat, 1)}%s, ${pyRound(lon, 1)}%s)")
    else Set.empty

  /** Python round(x, digits): banker's rounding of the EXACT binary value
    * (`new BigDecimal(double)`, not valueOf — Python rounds 2.15's true
    * 2.1499…9 to 2.1 where the shortest-repr path would give 2.2; caught
    * by the typed executed-reference fuzz), rendered like Python floats
    * incl. the negative-zero case (round(-0.04, 1) -> "-0.0"). */
  private def pyRound(x: Double, digits: Int): String = {
    val bd = new java.math.BigDecimal(x)
      .setScale(digits, java.math.RoundingMode.HALF_EVEN)
    val s = bd.stripTrailingZeros.toPlainString match {
      case p if p.contains('.') => p
      case p => p + ".0"
    }
    if ((x < 0 || 1.0 / x < 0) && !s.startsWith("-")) "-" + s else s
  }

  def orderOfMagnitude(x: Double): Set[String] = // :214-218
    if (x > 0) Set(math.rint(math.log10(x)).toLong.toString) // Python round() = ties-to-even
    else Set.empty

  def roundTo1(x: Double): Set[String] = { // :222-226
    val absNum = math.abs(x)
    val order = math.floor(math.log10(absNum)).toInt
    val rounded = new java.math.BigDecimal(absNum)
      .setScale(-order, java.math.RoundingMode.HALF_EVEN).doubleValue()
    Set(math.copySign(rounded, x).toLong.toString)
  }

  def existsPredicate(v: Any): Set[String] = v match { // predicates.py:106-122
    case null => Set("0")
    case s: String if s.isEmpty => Set("0")
    case 0 | 0L | 0.0 => Set("0")
    case _ => Set("1")
  }

  // --- cpredicates.pyx ------------------------------------------------------

  /** Contiguous char n-grams, in order, with repeats (cpredicates.pyx:3-21). */
  def ngrams(field: String, n: Int): Seq[String] =
    (0 to field.length - n).map(i => field.substring(i, i + n))

  /** Distinct char n-grams (cpredicates.pyx:24-42). */
  def uniqueNgrams(field: String, n: Int): Set[String] = ngrams(field, n).toSet

  /** First n chars, whole field if shorter (cpredicates.pyx:45-56). */
  def initials(field: String, n: Int): Set[String] = Set(field.take(n))
}
