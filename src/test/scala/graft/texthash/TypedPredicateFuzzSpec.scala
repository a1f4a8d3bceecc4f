package graft.texthash

import org.scalatest.funsuite.AnyFunSuite

/**
 * Executed-reference fuzz parity for the TYPED predicate kernels:
 * `src/test/resources/typedpred_fuzz.json` holds the keys the reference's
 * OWN `predicate_functions.py` emits over deterministic set / float /
 * latlong corpora (tools/gen_fuzz_typed.py — 653 rows incl. unicode set
 * elements, banker's-rounding float boundaries and negative-zero latlong
 * grid edges). `wholeSetPredicate` is excluded by design: its key is
 * Python's quoted `str(tuple)` rendering where the kernel uses a
 * documented canonical rendering (block keys only need within-engine
 * equality).
 */
class TypedPredicateFuzzSpec extends AnyFunSuite {

  private val setFuncs: Map[String, Seq[String] => Set[String]] = {
    import Predicates._
    Map(
      "commonSetElementPredicate" -> commonSetElementPredicate,
      "lastSetElementPredicate" -> lastSetElementPredicate,
      "firstSetElementPredicate" -> firstSetElementPredicate,
      "commonTwoElementsPredicate" -> commonTwoElementsPredicate,
      "commonThreeElementsPredicate" -> commonThreeElementsPredicate,
      "magnitudeOfCardinality" -> (s => magnitudeOfCardinality(s)))
  }

  private val numFuncs: Map[String, Double => Set[String]] = {
    import Predicates._
    Map("orderOfMagnitude" -> orderOfMagnitude, "roundTo1" -> roundTo1)
  }

  test("typed predicate kernels reproduce the executed reference (653 fuzz rows)") {
    val in = getClass.getResourceAsStream("/typedpred_fuzz.json")
    assert(in != null, "typedpred_fuzz.json resource missing")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
    var total = 0
    root.forEach { row =>
      val fn = row.get("func").asText
      val want = (0 until row.get("out").size).map(row.get("out").get(_).asText).sorted
      val got: Seq[String] =
        if (row.has("set")) {
          val s = (0 until row.get("set").size).map(row.get("set").get(_).asText)
          setFuncs(fn)(s).toSeq.sorted
        } else if (row.has("num")) {
          numFuncs(fn)(row.get("num").asDouble).toSeq.sorted
        } else {
          Predicates.latLongGridPredicate(
            row.get("lat").asDouble, row.get("lon").asDouble).toSeq.sorted
        }
      total += 1
      assert(got == want, s"$fn(${row.toString.take(80)}): got $got want $want")
    }
    assert(total >= 650, s"fixture unexpectedly small: $total evaluations")
  }
}
