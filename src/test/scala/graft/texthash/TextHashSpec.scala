package graft.texthash

import org.scalatest.funsuite.AnyFunSuite
import TextHash._

class TextHashSpec extends AnyFunSuite {

  // deterministic pseudo-random strings via SplitMix64 (no java.util.Random)
  private def pseudoStrings(n: Int, seed: Long): Seq[String] = {
    var st = seed
    (0 until n).map { _ =>
      st = mix64(st)
      val len = (st & 0x3F).toInt
      val sb = new StringBuilder
      var s2 = st
      (0 until len).foreach { _ =>
        s2 = mix64(s2)
        sb.append(('a' + (s2 & 0x1F) % 26).toChar)
      }
      sb.toString
    }
  }

  test("normalizeText mirrors benchmarks/common.py pre_process") {
    assert(normalizeText("  Foo   BAR\nbaz  ") == "foo bar baz")
    assert(normalizeText("\"Quoted\"") == "quoted")
    assert(normalizeText("'single'") == "single")
    assert(normalizeText("") == null)
    assert(normalizeText("   ") == null)
  }

  test("normalizeText newline handling exact order (common.py:13-15)") {
    // re.sub("  +"," ") then "\n"->" ": "A\n\nB" -> "a  b" (two spaces survive)
    assert(normalizeText("A\n\nB") == "a  b")
  }

  test("shingle hashes: distinct, sorted, count") {
    val h = shingleHashes("mississippi", 2, 42L)
    assert(h.length == 7) // {mi,is,ss,si,ip,pp,pi}
    assert(h.sameElements(h.sorted))
    assert(h.distinct.length == h.length)
    assert(shingleHashes("abc", 5, 42L).isEmpty)
  }

  test("minhash signature: deterministic, length, empty input") {
    val a = shingleHashes("the quick brown fox jumps over the lazy dog", 5, 42L)
    val s1 = minhashSignature(a, 128, 42L)
    val s2 = minhashSignature(a, 128, 42L)
    assert(s1.sameElements(s2))
    assert(s1.length == 128)
    assert(minhashSignature(Array.emptyIntArray, 128, 42L).isEmpty)
  }

  test("minhash estimates jaccard") {
    val t1 = "the quick brown fox jumps over the lazy dog again and again today"
    val t2 = "the quick brown fox jumps over the lazy cat again and again today"
    val a = shingleHashes(t1, 5, 42L)
    val b = shingleHashes(t2, 5, 42L)
    val trueJ = jaccardSorted(a, b)
    val sa = minhashSignature(a, 256, 42L)
    val sb = minhashSignature(b, 256, 42L)
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.length
    assert(math.abs(est - trueJ) < 0.15, s"est=$est true=$trueJ")
  }

  test("band keys: identical signatures share all bands; band index folded into key") {
    val sig = minhashSignature(shingleHashes("hello world wide web", 3, 42L), 128, 42L)
    val keys = bandKeys(sig, 16)
    assert(keys.length == 16)
    assert(keys.distinct.length == 16) // band idx folded in -> no accidental equality
    assert(bandKeys(sig, 16).sameElements(keys))
  }

  test("band-bucket correctness: same band key iff same signature rows (FIXTURES.md F5)") {
    var st = 987654321L
    def nextSig(): Array[Long] = {
      val a = new Array[Long](32)
      var i = 0
      while (i < 32) { st = mix64(st); a(i) = st & 0xFFL; i += 1 } // narrow range -> real collisions
      a
    }
    (0 until 200).foreach { _ =>
      val s1 = nextSig(); val s2 = nextSig()
      val k1 = bandKeys(s1, 8); val k2 = bandKeys(s2, 8)
      val r = 4
      (0 until 8).foreach { b =>
        val rowsEqual = (b * r until (b + 1) * r).forall(i => s1(i) == s2(i))
        if (rowsEqual) assert(k1(b) == k2(b))
        else assert(k1(b) != k2(b)) // mix collision astronomically unlikely
      }
    }
  }

  test("simhash: identical texts equal, near texts close, far texts far") {
    val t1 = "the quick brown fox jumps over the lazy dog and runs far away home"
    val t2 = "the quick brown fox jumps over the lazy cat and runs far away home"
    val h1 = simhashText(t1, 42L)
    val h2 = simhashText(t2, 42L)
    assert(simhashText(t1, 42L) == h1)
    assert(hamming64(h1, h2) < 24, s"near docs hamming=${hamming64(h1, h2)}")
    val h3 = simhashText("completely unrelated gibberish zebra quantum xylophone", 42L)
    assert(hamming64(h1, h3) > hamming64(h1, h2))
  }

  test("jaccardSorted golden") {
    assert(jaccardSorted(Array(1L, 2L, 3L), Array(2L, 3L, 4L)) == 0.5)
    assert(jaccardSorted(Array(1L, 2L), Array(1L, 2L)) == 1.0)
    assert(jaccardSorted(Array.emptyLongArray, Array(1L)) == 0.0)
  }

  test("suffixKeys: sampled fixed-width substring keys") {
    val k = suffixKeys("abcdefghij", 4, 2, 42L)
    // starts 0,2,4,6 -> abcd, cdef, efgh, ghij
    assert(k.length == 4)
    val full = suffixKeys("abcdefghij", 4, 1, 42L)
    assert(full.length == 7)
    assert(k.toSet.subsetOf(full.toSet))
    assert(suffixKeys("abc", 4, 1, 42L).isEmpty)
  }

  test("signature determinism property: pure function of text (FIXTURES.md F5)") {
    pseudoStrings(300, 2024L).foreach { s =>
      val a = minhashSignature(shingleHashes(s, 3, 7L), 32, 7L)
      val b = minhashSignature(shingleHashes(s, 3, 7L), 32, 7L)
      assert(a.sameElements(b))
      val j = jaccardSorted(shingleHashes(s, 3, 7L), shingleHashes(s, 3, 7L))
      assert(s.length < 3 || j == 1.0)
    }
  }

  test("minhash 4-way unrolled loop == scalar reference (r6 internals)") {
    // the straight-line single-chain loop the unrolled kernel replaced
    def scalarRef(shingles: Array[Int], numHashes: Int, seed: Long): Array[Long] = {
      if (shingles.isEmpty) return Array.emptyLongArray
      val (a, b) = minhashCoeffs(numHashes, seed)
      val sig = new Array[Long](numHashes)
      var i = 0
      while (i < numHashes) {
        var m = Long.MaxValue
        var j = 0
        while (j < shingles.length) {
          val v = a(i) * (shingles(j) & ShingleMask) + b(i)
          if (v < m) m = v
          j += 1
        }
        sig(i) = m
        i += 1
      }
      sig
    }
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 2, 3, 4, 5, 7, 16, 128); rep <- 1 to 5) {
      val sh = Array.fill(1 + rnd.nextInt(40))(rnd.nextInt())
        .distinct.sorted
      val got = minhashSignature(sh, n, 42L)
      val want = scalarRef(sh, n, 42L)
      assert(got.sameElements(want), s"numHashes=$n rep=$rep")
    }
    assert(minhashSignature(Array.emptyIntArray, 5, 42L).isEmpty)
  }

  test("simhashText ASCII fast path == tokenize-then-hash reference (r6 internals)") {
    // reference path: the original composition, still live for non-ASCII
    def ref(t: String): Long = simhash64(wordTokens(t), 42L)
    val cases = Seq(
      "plain ascii words only",
      "with'apostrophes and_underscores plus 123 numbers",
      "  leading trailing   and   runs  ",
      "punct!!! only??? ... ,,,",
      "", "x",
      "café résumé non-ascii tokens", // fallback path
      "mixed ascii café and more",
      "emoji 😀 between words",
      "nbsp separated words")
    cases.foreach { t =>
      assert(simhashText(t, 42L) == ref(t), s"text='$t'")
    }
    assert(simhashText(null, 42L) == 0L)
    // pseudo-random ASCII + occasionally unicode-contaminated strings
    pseudoStrings(200, 99L).foreach { s =>
      assert(simhashText(s, 42L) == ref(s), s"fuzz '$s'")
    }
  }
}
