package graft.learn

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The full variable zoo (`dedupe/variables/`): per-kind predicates,
  * codec-decoded comparators, categorical/exists dummy coding, interaction
  * products, and the reference's exact missing-data column layout
  * (`datamodel.py:59-78,106-144`). */
class DataModelSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._
  import DataModel.{SetSep, Variable}

  // ---------------------------------------------------------------- zoo

  test("per-kind predicate zoos match the reference's declaration lists") {
    def names(v: Variable) = DataModel.zoo(Seq(v, Variable("pad", "string"))).collect {
      case (f, p) if f == v.field => p.name
    }
    assert(names(Variable("t", "text")).size === 18, "base_predicates, string.py:13-32")
    assert(names(Variable("s", "string")).size === 24)
    assert(names(Variable("e", "exact")) === Seq("(wholeFieldPredicate, e)"))
    assert(names(Variable("c", "categorical", categories = Seq("a", "b")))
      === Seq("(wholeFieldPredicate, c)"))
    assert(names(Variable("st", "set")) === Seq(
      "(wholeSetPredicate, st)", "(commonSetElementPredicate, st)",
      "(lastSetElementPredicate, st)", "(commonTwoElementsPredicate, st)",
      "(commonThreeElementsPredicate, st)", "(magnitudeOfCardinality, st)",
      "(firstSetElementPredicate, st)"), "set.py:12-20 order")
    assert(names(Variable("ll", "latlong")) === Seq("(latLongGridPredicate, ll)"))
    assert(names(Variable("p", "price")) === Seq(
      "(orderOfMagnitude, p)", "(wholeFieldPredicate, p)", "(roundTo1, p)"),
      "price.py:10-14 order")
    // has_missing appends ExistsPredicate (base.py:70-73); exists kind has none else
    assert(names(Variable("m", "shortstring", hasMissing = true)).last === "(Exists, m)")
    assert(names(Variable("x", "exists", hasMissing = true)) === Seq("(Exists, x)"))
    assert(names(Variable("x", "exists")) === Seq())
    // custom carries no predicates; a list of only customs is rejected
    intercept[IllegalArgumentException] {
      DataModel.zoo(Seq(Variable("c", "custom", custom = (a, b) => a - b)))
    }
  }

  test("typed predicate keys: SimplePredicate semantics over the codecs") {
    val Seq(whole, common, last, two, three, mag, first) =
      PredicateZoo.setPredicates("st")
    val s = Seq("beta", "alpha", "gamma").mkString(SetSep)
    assert(common(s) === Set("beta", "alpha", "gamma"))
    assert(last(s) === Set("gamma"), "max element, predicates.py:186-187")
    assert(first(s) === Set("alpha"))
    assert(two(s) === Set("alpha beta", "beta gamma"), "sorted 2-grams")
    assert(mag(s) === Set("0"), "order of magnitude of |s|=3")
    assert(whole(s).nonEmpty && three(s) === Set("alpha beta gamma"))
    assert(common("") === Set.empty, "empty set is falsy")

    val Seq(oom, pwhole, round) = PredicateZoo.pricePredicates("p")
    assert(oom("150.0") === Set("2"))
    assert(pwhole("150.0") === Set("150.0"))
    assert(round("150.0") === Set("200"), "round to 1 sig fig, str(int(...))")
    assert(oom("0.0") === Set.empty, "0 price is falsy, predicates.py:90-94")
    assert(pwhole("0.0") === Set.empty)

    val Seq(grid) = PredicateZoo.latLongPredicates("ll")
    assert(grid("40.71,-74.0").nonEmpty)
    assert(grid("0.0,0.0") === Set.empty, "origin yields no grid, predicates.py:198-211")

    // Exists keys even a missing field (predicates.py:120)
    val ex = PredicateZoo.existsPredicate("f")
    assert(ex(null) === Set("0") && ex("") === Set("0") && ex("x") === Set("1"))
    assert(PredicateZoo.existsPredicate("f", "price")("0.0") === Set("0"),
      "0 price is falsy for Exists too")

    // Exact's wholeField is a SimplePredicate: NO preprocessing
    assert(PredicateZoo.wholeFieldSimple("e")("A.B  c") === Set("A.B  c"))
    // ...unlike the String variable's StringPredicate form (strip
    // punctuation + collapse whitespace, no lowercasing)
    assert(PredicateZoo.stringPredicates("e").head("A.B  c") === Set("AB c"))
  }

  // --------------------------------------------------------- featurizer

  private val vars = Seq(
    Variable("name", "exact"),
    Variable("bio", "text"),
    Variable("tags", "set"),
    Variable("price", "price", hasMissing = true),
    Variable("loc", "latlong"),
    Variable("color", "categorical", categories = Seq("red", "blue", "green")),
    Variable("note", "shortstring", hasMissing = true),
    Variable("flag", "exists", hasMissing = true),
    Variable("ix", "interaction", interactionFields = Seq("name", "price")))

  private def featuresOf(row: Map[String, (String, String)]): Seq[Double] = {
    val fields = vars.filter(_.kind != "interaction").map(_.field)
    val df = Seq(1).toDF("one").select(
      fields.flatMap(f => Seq(
        lit(row.get(f).map(_._1).orNull).cast("string").as(s"${f}_1"),
        lit(row.get(f).map(_._2).orNull).cast("string").as(s"${f}_2"))): _*)
    val cols = DataModel.featureColumns(vars,
      f => col(s"${f}_1"), f => col(s"${f}_2"))
    df.select(array(cols: _*).as("f")).as[Seq[Double]].head()
  }

  test("featureColumns: layout, dummy coding, interaction product, missing rules") {
    val names = DataModel.featureNames(vars)
    // widths: 1+1+1+1+1+5 (3 cats -> 6 outcomes - 1) +1+2 (exists) +1 interaction
    val nCols = 1 + 1 + 1 + 1 + 1 + 5 + 1 + 2 + 1
    // indicators: price, note, flag's two exists dummies, interaction(price part)
    val nInd = 1 + 1 + 2 + 1
    assert(names.size === nCols + nInd, names.mkString(","))
    assert(names.count(_.startsWith("present:")) === nInd)
    assert(names.indexWhere(_.startsWith("interaction")) === nCols - 1,
      "interaction columns come after all field columns (datamodel.py:59-73)")

    val f = featuresOf(Map(
      "name" -> ("x", "x"),
      "bio" -> ("alpha beta", "alpha beta alpha"),
      "tags" -> (Seq("a", "b", "c").mkString(SetSep), Seq("b", "c", "d").mkString(SetSep)),
      "price" -> ("150.0", "300.0"),
      "loc" -> ("40.7,-74.0", "40.7,-74.0"),
      "color" -> ("red", "blue"),
      "note" -> ("abc", "abc"),
      "flag" -> ("y", "y")))
    assert(f.size === nCols + nInd)
    assert(f(0) === 1.0, "exact match")
    assert(math.abs(f(1) - 3.0 / math.sqrt(10.0)) < 1e-12, "tf cosine")
    assert(math.abs(f(2) - 2.0 / 3.0) < 1e-12, "set cosine |∩|/sqrt(9)")
    assert(math.abs(f(3) - math.log10(2.0)) < 1e-12, "price log10 diff")
    assert(f(4) === 0.0, "same point haversine")
    // categorical outcomes sorted [blue,green,red]: identities then crosses;
    // dummies = outcomes[1:]; (red,blue) -> (blue,red) = index 3 of 5
    assert(f.slice(5, 10) === Seq(0.0, 0.0, 0.0, 1.0, 0.0))
    assert(f(10) === 0.5, "normalized affine gap of identical strings is 0.5")
    assert(f.slice(11, 13) === Seq(1.0, 0.0), "exists: both present dummy")
    assert(math.abs(f(13) - 1.0 * math.log10(2.0)) < 1e-12, "interaction = name*price")
    assert(f.drop(nCols) === Seq(1.0, 1.0, 1.0, 1.0, 1.0), "nothing missing")
  }

  test("missing semantics: NaN->0, indicator 0, interaction propagates") {
    val f = featuresOf(Map(
      "name" -> ("x", "y"),
      "price" -> ("-5.0", "300.0"), // <=0 is NaN-missing (price.py:19-22)
      "color" -> ("red", "red")))
    assert(f(0) === 0.0, "exact mismatch")
    assert(f(3) === 0.0, "missing price zeroed")
    assert(f(10) === 0.0, "null note zeroed")
    assert(f.slice(11, 13) === Seq(0.0, 0.0), "exists: neither present")
    assert(f(13) === 0.0, "interaction with missing factor zeroed")
    // indicators: price missing -> 0, note missing -> 0, exists dummies
    // never missing -> 1, interaction inherits price missing -> 0
    assert(f.drop(14) === Seq(0.0, 0.0, 1.0, 1.0, 0.0))
    // categorical identity (red,red): sorted cats [blue,green,red] ->
    // outcome (red,red) = identity index 2 -> dummy index 1
    assert(f.slice(5, 10) === Seq(0.0, 1.0, 0.0, 0.0, 0.0))
  }

  test("interaction over a categorical part expands per dummy (interaction.py:41-60)") {
    val iv = Seq(
      Variable("e", "exact"),
      Variable("c", "categorical", categories = Seq("a", "b")),
      Variable("i2", "interaction", interactionFields = Seq("c", "e")))
    // 2 cats -> 3 outcomes -> 2 dummies -> interaction expands to 2 columns
    assert(DataModel.featureNames(iv).size === 1 + 2 + 2)
    val df = Seq(("x", "x", "a", "b")).toDF("e_1", "e_2", "c_1", "c_2")
    val out = df.select(array(DataModel.featureColumns(iv,
      f => col(s"${f}_1"), f => col(s"${f}_2")): _*).as("f"))
      .as[Seq[Double]].head()
    // (a,b) -> outcomes [(a,a),(b,b),(a,b)] -> dummies [(b,b),(a,b)] = [0,1]
    assert(out === Seq(1.0, 0.0, 1.0, 0.0, 1.0))
    intercept[IllegalArgumentException] {
      DataModel.featureNames(Seq(Variable("e", "exact"),
        Variable("i", "interaction", interactionFields = Seq("e", "nope"))))
    }
  }

  test("reference layout goldens (tests/test_dedupe.py:31-65, test_exists.py, test_price.py)") {
    // DataModelTest: interaction binds columns [0, 1]; missing_field_indices
    // is [0, 2] when a has_missing (field col 0 + the interaction col 2)
    def m(hasMissing: Boolean) = Seq(
      Variable("a", "string", hasMissing = hasMissing), Variable("b", "string"),
      Variable("i", "interaction", interactionFields = Seq("a", "b")))
    assert(DataModel.featureNames(m(false)) ===
      Seq("string:a", "string:b", "interaction(string:a*string:b)"))
    assert(DataModel.featureNames(m(true)) ===
      Seq("string:a", "string:b", "interaction(string:a*string:b)",
        "present:string:a", "present:interaction(string:a*string:b)"))
    // TestExists.test_comparator: (None,None)->[0,0], (1,1)->[1,0], (1,0)->[0,1]
    def ex(a: Any, b: Any): Seq[Double] = {
      val df = Seq(1).toDF("one").select(
        lit(a).cast("string").as("x"), lit(b).cast("string").as("y"))
      df.select(array(graft.ops.Comparators.existsDummies(col("x"), col("y"))
        .map(_.cast("double")): _*).as("d")).as[Seq[Double]].head()
    }
    assert(ex(null, null) === Seq(0.0, 0.0))
    assert(ex("1", "1") === Seq(1.0, 0.0))
    assert(ex("1", null) === Seq(0.0, 1.0))
    // TestExists.test_len_higher_vars: width > 1 and == dummy count
    assert(Variable("f", "exists").width === 2)
    // TestPrice.test_comparator: comparator(1, 10) == 1
    val pd = Seq((1.0, 10.0)).toDF("p1", "p2").select(
      graft.ops.Comparators.priceLogDiff(col("p1"), col("p2")).as("d"))
      .as[Double].head()
    assert(pd === 1.0)
  }

  test("mixed-kind variable list trains and partitions end to end") {
    // 8 entities x 2 variants: name strings agree on first token; price
    // within 2x; category equal for dups, different across entities
    val cats = Seq("red", "blue", "green")
    val rows = (0 until 8).flatMap { e =>
      Seq((2L * e, s"entity$e surname$e", (100.0 * (e + 1)).toString, cats(e % 3)),
          (2L * e + 1, s"entity$e surname$e apt", (110.0 * (e + 1)).toString, cats(e % 3)))
    }
    val records = rows.toDF("rid", "name", "price", "color")
    val mixedVars = Seq(
      Variable("name", "string"),
      Variable("price", "price"),
      Variable("color", "categorical", categories = cats))
    val pos = (0 until 8).map { e =>
      (e.toLong, s"entity$e surname$e", s"entity$e surname$e apt",
        (100.0 * (e + 1)).toString, (110.0 * (e + 1)).toString,
        cats(e % 3), cats(e % 3), 1)
    }
    val neg = (0 until 7).map { e =>
      (8L + e, s"entity$e surname$e", s"entity${e + 1} surname${e + 1}",
        (100.0 * (e + 1)).toString, (100.0 * (e + 2)).toString,
        cats(e % 3), cats((e + 1) % 3), 0)
    }
    val labeled = (pos ++ neg).toDF("pair_id", "name_1", "name_2",
      "price_1", "price_2", "color_1", "color_2", "label")
    val settings = TrainedDedupe.trainFields(labeled, records, mixedVars)
    assert(settings.predicates.nonEmpty)
    val out = TrainedDedupe.partitionFields(records, mixedVars, settings)
    val byRid = out.select($"rid", $"cluster_id").as[(Long, Long)].collect().toMap
    assert(byRid.size === 16)
    (0 until 8).foreach { e =>
      assert(byRid(2L * e) === byRid(2L * e + 1), s"entity $e variants split")
    }
    assert((0 until 8).map(e => byRid(2L * e)).distinct.size === 8, "entities merged")
  }
}
