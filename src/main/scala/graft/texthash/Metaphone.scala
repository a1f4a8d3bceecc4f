package graft.texthash

/**
 * Double Metaphone phonetic encoding — an original Scala implementation of
 * Lawrence Philips' published algorithm (Dr. Dobb's Journal, June 2000;
 * public domain reference C++), the kernel behind the reference's
 * `doubleMetaphone` / `metaphoneToken` predicates
 * (`predicate_functions.py:154-165`, via the public `doublemetaphone`
 * package). Golden-tested against `tests/test_predicate_functions.py:207-217`.
 *
 * Returns (primary, secondary) codes, each truncated to 4 characters; the
 * secondary equals the primary when no alternate pronunciation branch fires.
 */
object Metaphone {

  private val Vowels = "AEIOUY"

  def doubleMetaphone(input: String): (String, String) = {
    val original = input.toUpperCase
    val length = original.length
    if (length == 0) return ("", "")
    val last = length - 1
    val s = original + "     " // pad so lookahead never overflows

    def at(i: Int): Char = if (i < 0 || i >= s.length) ' ' else s.charAt(i)
    def isVowel(i: Int): Boolean = i >= 0 && i < length && Vowels.indexOf(s.charAt(i)) >= 0
    def strAt(start: Int, len: Int, pats: String*): Boolean =
      start >= 0 && pats.exists(p => p.length == len && s.regionMatches(start, p, 0, len))
    val slavoGermanic =
      original.contains("W") || original.contains("K") ||
        original.contains("CZ") || original.contains("WITZ")

    val primary = new StringBuilder
    val secondary = new StringBuilder
    def add(p: String, sec: String = null): Unit = {
      primary.append(p)
      secondary.append(if (sec == null) p else sec)
    }

    var current = 0
    // skip initial silent letters: 'gnat', 'knife', 'pneumonia', 'wrack', 'psyche'
    if (strAt(0, 2, "GN", "KN", "PN", "WR", "PS")) current = 1
    // initial 'X' sounds like 'Z' -> 'S': 'Xavier'
    if (at(0) == 'X') { add("S"); current = 1 }

    while ((primary.length < 4 || secondary.length < 4) && current < length) {
      at(current) match {
        case 'A' | 'E' | 'I' | 'O' | 'U' | 'Y' =>
          if (current == 0) add("A")
          current += 1

        case 'B' =>
          add("P") // '-mb' handled under M
          current += (if (at(current + 1) == 'B') 2 else 1)

        case 'Ç' =>
          add("S"); current += 1

        case 'C' =>
          // germanic '-ach-': 'bacher' but not 'bacchus'
          if (current > 1 && !isVowel(current - 2) && strAt(current - 1, 3, "ACH") &&
              (at(current + 2) != 'I' &&
                (at(current + 2) != 'E' || strAt(current - 2, 6, "BACHER", "MACHER")))) {
            add("K"); current += 2
          } else if (current == 0 && strAt(current, 6, "CAESAR")) {
            add("S"); current += 2
          } else if (strAt(current, 4, "CHIA")) { // italian 'chianti'
            add("K"); current += 2
          } else if (strAt(current, 2, "CH")) {
            if (current > 0 && strAt(current, 4, "CHAE")) // 'michael'
              { add("K", "X"); current += 2 }
            else if (current == 0 &&
                (strAt(current + 1, 5, "HARAC", "HARIS") ||
                  strAt(current + 1, 3, "HOR", "HYM", "HIA", "HEM")) &&
                !strAt(0, 5, "CHORE")) // greek roots: 'chemistry', 'chorus'
              { add("K"); current += 2 }
            else if ((strAt(0, 4, "VAN ", "VON ") || strAt(0, 3, "SCH")) ||
                strAt(current - 2, 6, "ORCHES", "ARCHIT", "ORCHID") ||
                strAt(current + 2, 1, "T", "S") ||
                ((strAt(current - 1, 1, "A", "O", "U", "E") || current == 0) &&
                  strAt(current + 1 + 1, 1, "L", "R", "N", "M", "B", "H", "F", "V", "W", " ")))
              { add("K"); current += 2 } // germanic: 'wachtler', 'schmidt'
            else {
              if (current > 0) {
                if (strAt(0, 2, "MC")) add("K") else add("X", "K") // 'McHugh'
              } else add("X")
              current += 2
            }
          } else if (strAt(current, 2, "CZ") && !strAt(current - 2, 4, "WICZ")) {
            add("S", "X"); current += 2 // 'czerny'
          } else if (strAt(current + 1, 3, "CIA")) { // 'focaccia'
            add("X"); current += 3
          } else if (strAt(current, 2, "CC") && !(current == 1 && at(0) == 'M')) {
            // double 'C', but not 'McClellan'
            if (strAt(current + 2, 1, "I", "E", "H") && !strAt(current + 2, 2, "HU")) {
              if ((current == 1 && at(current - 1) == 'A') ||
                  strAt(current - 1, 5, "UCCEE", "UCCES"))
                add("KS") // 'accident', 'succeed'
              else add("X") // 'bacci', 'bertucci'
              current += 3
            } else { add("K"); current += 2 } // Pierce's rule
          } else if (strAt(current, 2, "CK", "CG", "CQ")) {
            add("K"); current += 2
          } else if (strAt(current, 2, "CI", "CE", "CY")) {
            if (strAt(current, 3, "CIO", "CIE", "CIA")) add("S", "X") else add("S")
            current += 2
          } else {
            add("K")
            current += (
              if (strAt(current + 1, 2, " C", " Q", " G")) 3 // 'mac caffrey'
              else if (strAt(current + 1, 1, "C", "K", "Q") &&
                !strAt(current + 1, 2, "CE", "CI")) 2
              else 1)
          }

        case 'D' =>
          if (strAt(current, 2, "DG")) {
            if (strAt(current + 2, 1, "I", "E", "Y")) { add("J"); current += 3 } // 'edge'
            else { add("TK"); current += 2 } // 'edgar'
          } else if (strAt(current, 2, "DT", "DD")) { add("T"); current += 2 }
          else { add("T"); current += 1 }

        case 'F' =>
          add("F"); current += (if (at(current + 1) == 'F') 2 else 1)

        case 'G' =>
          if (at(current + 1) == 'H') {
            if (current > 0 && !isVowel(current - 1)) { add("K"); current += 2 }
            else if (current == 0) {
              if (at(current + 2) == 'I') add("J") else add("K") // 'ghislane'
              current += 2
            } else if ((current > 1 && strAt(current - 2, 1, "B", "H", "D")) ||
                (current > 2 && strAt(current - 3, 1, "B", "H", "D")) ||
                (current > 3 && strAt(current - 4, 1, "B", "H")))
              current += 2 // Parker's rule: 'hugh'
            else {
              if (current > 2 && at(current - 1) == 'U' &&
                  strAt(current - 3, 1, "C", "G", "L", "R", "T"))
                add("F") // 'laugh', 'cough'
              else if (current > 0 && at(current - 1) != 'I') add("K")
              current += 2
            }
          } else if (at(current + 1) == 'N') {
            if (current == 1 && isVowel(0) && !slavoGermanic) add("KN", "N")
            else if (!strAt(current + 2, 2, "EY") && at(current + 1) != 'Y' && !slavoGermanic)
              add("N", "KN") // not 'cagney'
            else add("KN")
            current += 2
          } else if (strAt(current + 1, 2, "LI") && !slavoGermanic) {
            add("KL", "L"); current += 2 // 'tagliaro'
          } else if (current == 0 && (at(current + 1) == 'Y' ||
              strAt(current + 1, 2, "ES", "EP", "EB", "EL", "EY", "IB", "IL",
                "IN", "IE", "EI", "ER"))) {
            add("K", "J"); current += 2 // -ges-, -gep- at beginning
          } else if ((strAt(current + 1, 2, "ER") || at(current + 1) == 'Y') &&
              !strAt(0, 6, "DANGER", "RANGER", "MANGER") &&
              !strAt(current - 1, 1, "E", "I") &&
              !strAt(current - 1, 3, "RGY", "OGY")) {
            add("K", "J"); current += 2 // -ger-, -gy-
          } else if (strAt(current + 1, 1, "E", "I", "Y") ||
              strAt(current - 1, 4, "AGGI", "OGGI")) {
            if ((strAt(0, 4, "VAN ", "VON ") || strAt(0, 3, "SCH")) ||
                strAt(current + 1, 2, "ET"))
              add("K") // obvious germanic
            else if (strAt(current + 1, 4, "IER ")) add("J") // french ending
            else add("J", "K") // italian 'biaggi'
            current += 2
          } else {
            current += (if (at(current + 1) == 'G') 2 else 1)
            add("K")
          }

        case 'H' =>
          // only keep if first & before vowel or between 2 vowels
          if ((current == 0 || isVowel(current - 1)) && isVowel(current + 1)) {
            add("H"); current += 2
          } else current += 1

        case 'J' =>
          if (strAt(current, 4, "JOSE") || strAt(0, 4, "SAN ")) {
            // obvious spanish: 'jose', 'san jacinto'
            if ((current == 0 && at(current + 4) == ' ') || strAt(0, 4, "SAN "))
              add("H")
            else add("J", "H")
            current += 1
          } else {
            if (current == 0 && !strAt(current, 4, "JOSE")) add("J", "A") // 'Yankelovich'
            else if (isVowel(current - 1) && !slavoGermanic &&
                (at(current + 1) == 'A' || at(current + 1) == 'O'))
              add("J", "H") // spanish pron. of 'bajador'
            else if (current == last) add("J", " ")
            else if (!strAt(current + 1, 1, "L", "T", "K", "S", "N", "M", "B", "Z") &&
                !strAt(current - 1, 1, "S", "K", "L"))
              add("J")
            current += (if (at(current + 1) == 'J') 2 else 1)
          }

        case 'K' =>
          add("K"); current += (if (at(current + 1) == 'K') 2 else 1)

        case 'L' =>
          if (at(current + 1) == 'L') {
            // spanish: 'cabrillo', 'gallegos'
            if ((current == length - 3 &&
                strAt(current - 1, 4, "ILLO", "ILLA", "ALLE")) ||
                ((strAt(last - 1, 2, "AS", "OS") || strAt(last, 1, "A", "O")) &&
                  strAt(current - 1, 4, "ALLE"))) {
              add("L", ""); current += 2
            } else { current += 2; add("L") }
          } else { current += 1; add("L") }

        case 'M' =>
          add("M")
          current += (
            if ((strAt(current - 1, 3, "UMB") &&
                (current + 1 == last || strAt(current + 2, 2, "ER"))) || // 'dumb', 'thumb'
                at(current + 1) == 'M') 2
            else 1)

        case 'N' =>
          add("N"); current += (if (at(current + 1) == 'N') 2 else 1)

        case 'Ñ' =>
          add("N"); current += 1

        case 'P' =>
          if (at(current + 1) == 'H') { add("F"); current += 2 }
          else {
            add("P")
            current += (if (strAt(current + 1, 1, "P", "B")) 2 else 1) // 'campbell'
          }

        case 'Q' =>
          add("K"); current += (if (at(current + 1) == 'Q') 2 else 1)

        case 'R' =>
          // french: 'rogier', but not 'hochmeier'
          if (current == last && !slavoGermanic &&
              strAt(current - 2, 2, "IE") && !strAt(current - 4, 2, "ME", "MA"))
            add("", "R")
          else add("R")
          current += (if (at(current + 1) == 'R') 2 else 1)

        case 'S' =>
          if (strAt(current - 1, 3, "ISL", "YSL")) current += 1 // silent: 'island'
          else if (current == 0 && strAt(current, 5, "SUGAR")) {
            add("X", "S"); current += 1
          } else if (strAt(current, 2, "SH")) {
            if (strAt(current + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ")) add("S") // germanic
            else add("X")
            current += 2
          } else if (strAt(current, 3, "SIO", "SIA") || strAt(current, 4, "SIAN")) {
            if (!slavoGermanic) add("S", "X") else add("S") // -sio-, -sia-
            current += 3
          } else if ((current == 0 && strAt(current + 1, 1, "M", "N", "L", "W")) ||
              strAt(current + 1, 1, "Z")) {
            add("S", "X") // german & anglicization: 'smith' -> 'schmidt'
            current += (if (strAt(current + 1, 1, "Z")) 2 else 1)
          } else if (strAt(current, 2, "SC")) {
            if (at(current + 2) == 'H') {
              if (strAt(current + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM")) {
                // dutch origin: 'school', 'schooner'
                if (strAt(current + 3, 2, "ER", "EN")) add("X", "SK") // 'schermerhorn'
                else add("SK")
              } else {
                if (current == 0 && !isVowel(3) && at(3) != 'W') add("X", "S")
                else add("X")
              }
              current += 3
            } else if (strAt(current + 2, 1, "I", "E", "Y")) { add("S"); current += 3 }
            else { add("SK"); current += 3 }
          } else {
            // french: 'resnais', 'artois'
            if (current == last && strAt(current - 2, 2, "AI", "OI")) add("", "S")
            else add("S")
            current += (if (strAt(current + 1, 1, "S", "Z")) 2 else 1)
          }

        case 'T' =>
          if (strAt(current, 4, "TION")) { add("X"); current += 3 }
          else if (strAt(current, 3, "TIA", "TCH")) { add("X"); current += 3 }
          else if (strAt(current, 2, "TH") || strAt(current, 3, "TTH")) {
            if (strAt(current + 2, 2, "OM", "AM") || // 'thomas', 'thames'
                strAt(0, 4, "VAN ", "VON ") || strAt(0, 3, "SCH"))
              add("T")
            else add("0", "T")
            current += 2
          } else {
            add("T")
            current += (if (strAt(current + 1, 1, "T", "D")) 2 else 1)
          }

        case 'V' =>
          add("F"); current += (if (at(current + 1) == 'V') 2 else 1)

        case 'W' =>
          if (strAt(current, 2, "WR")) { add("R"); current += 2 } // can only be in middle
          else {
            if (current == 0 && (isVowel(current + 1) || strAt(current, 2, "WH"))) {
              if (isVowel(current + 1)) add("A", "F") // 'Wasserman' -> 'Vasserman'
              else add("A") // 'Uomo' handled by 'Whitney' -> 'A'
            }
            if ((current == last && isVowel(current - 1)) ||
                strAt(current - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY") ||
                strAt(0, 3, "SCH")) {
              add("", "F"); current += 1 // 'Arnow' -> 'Arnov'
            } else if (strAt(current, 4, "WICZ", "WITZ")) {
              add("TS", "FX"); current += 4 // polish: 'Filipowicz'
            } else current += 1 // else skip
          }

        case 'X' =>
          // french: 'breaux'
          if (!(current == last &&
              (strAt(current - 3, 3, "IAU", "EAU") || strAt(current - 2, 2, "AU", "OU"))))
            add("KS")
          current += (if (strAt(current + 1, 1, "C", "X")) 2 else 1)

        case 'Z' =>
          if (at(current + 1) == 'H') { add("J"); current += 2 } // chinese: 'zhao'
          else {
            if (strAt(current + 1, 2, "ZO", "ZI", "ZA") ||
                (slavoGermanic && current > 0 && at(current - 1) != 'T'))
              add("S", "TS")
            else add("S")
            current += (if (at(current + 1) == 'Z') 2 else 1)
          }

        case _ =>
          current += 1
      }
    }

    (primary.toString.take(4), secondary.toString.take(4))
  }
}
