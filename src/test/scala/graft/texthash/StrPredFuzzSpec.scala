package graft.texthash

import org.scalatest.funsuite.AnyFunSuite

/** Executed-reference parity for StringPredicate preprocessing
  * (`predicates.py:97-103` `" ".join(strip_punc(column).split())`):
  * `strpred_fuzz.json` holds the reference's outputs over the round-4
  * unicode corpus PLUS the round-5 C0-separator corpus — Python
  * `str.split()` treats FS/GS/RS/US (0x1c-0x1f) as whitespace while
  * Unicode White_Space (Java `(?U)\s`) does not, so these rows pin the
  * `Predicates.PySplitRe` char set. */
class StrPredFuzzSpec extends AnyFunSuite {
  test("stringPreprocess == executed reference on the fuzz corpus incl. 0x1c-0x1f") {
    val in = getClass.getResourceAsStream("/strpred_fuzz.json")
    assert(in != null, "strpred_fuzz.json resource missing")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
    var n = 0
    var c0 = 0
    root.forEach { row =>
      n += 1
      val input = row.get("input").asText
      if (input.exists(c => c >= 0x1c && c <= 0x1f)) c0 += 1
      val want = row.get("out").asText
      val got = Predicates.stringPreprocess(input)
      assert(got == want,
        s"input=${input.map(c => if (c >= 32 && c < 127) c.toString else f"\\u${c.toInt}%04x").mkString}: " +
          s"got=[$got] want=[$want]")
    }
    assert(n > 350 && c0 > 60, s"fixture unexpectedly small: $n rows / $c0 with C0 chars")
  }
}
