package graft.texthash

import org.scalatest.funsuite.AnyFunSuite

/** Executed-reference normalization parity: `preprocess_fuzz.json` holds
  * `pre_process` outputs (`benchmarks/common.py:12-19`, executed
  * driver-side) over 311 fuzz strings stressing unicode whitespace (NBSP,
  * thin/ideographic spaces, line/paragraph separators, NEL), İ/É/ß case
  * folding, quotes and space runs. The north rule pins byte-identical
  * normalized text per url — every row must match exactly. */
class PreprocessFuzzSpec extends AnyFunSuite {
  test("normalizeText == executed pre_process on 311 fuzz strings") {
    val in = getClass.getResourceAsStream("/preprocess_fuzz.json")
    assert(in != null)
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
    var n = 0
    root.forEach { row =>
      n += 1
      val input = row.get("input").asText
      val want = if (row.get("norm").isNull) null else row.get("norm").asText
      val got = TextHash.normalizeText(input)
      assert(got == want,
        s"input=${input.map(c => if (c < 128) c.toString else f"\\u${c.toInt}%04x").mkString}: " +
          s"got=[$got] want=[$want]")
    }
    assert(n > 300)
  }
}
