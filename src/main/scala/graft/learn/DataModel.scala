package graft.learn

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.expr.{functions => gf}

/**
 * Multi-field variable model — the engine's `DataModel`
 * (`datamodel.py:36-145`): an ordered list of typed field variables that
 * yields (a) the learnable blocking-predicate zoo (union over variables,
 * set-deduplicated, declaration order preserved) and (b) the featurizer
 * Columns the classifier consumes (`DataModel.distances`).
 *
 * Variable kinds mirror the reference's benchmark surface
 * (`benchmarks/canonical.py:41-47`):
 *  - `string` / `shortstring` — comparator = normalized affine-gap distance
 *    (`variables/string.py:70-109`), predicate zoo = the 24 simple string
 *    predicates ([[PredicateZoo.stringPredicates]]; index predicates stay
 *    descoped to the engine's LSH passes);
 *  - `exact` — comparator = 0/1 equality (`variables/exact.py`), predicate
 *    zoo = wholeFieldPredicate only.
 *
 * Missing data follows `datamodel.py:117-142`: any comparison with a null
 * side scores 0, and each `hasMissing` variable appends a trailing
 * indicator column valued 1 when BOTH sides are present (the
 * `1 - is_missing` dummy), letting the classifier learn the missing-value
 * prior instead of conflating it with distance 0.
 *
 * All feature Columns are codegen'd expressions ([[graft.expr.Exprs]]'
 * AffineGapNorm is a static DP call) — the train-time and inference-time
 * featurization are the SAME Column trees by construction.
 */
object DataModel {

  final case class Variable(field: String, kind: String, hasMissing: Boolean = false) {
    require(Set("string", "shortstring", "exact").contains(kind),
      s"unknown variable kind '$kind' (string | shortstring | exact)")
  }

  /** The learnable predicate zoo of a variable list: per-variable zoos
    * concatenated in declaration order, deduplicated by predicate name
    * (`DataModel.predicates` is a SET union, `datamodel.py:100-106` — an
    * `Exact` on a field a `String` already covers adds nothing). Each entry
    * is (field, predicate); the predicate name already carries the field
    * (`"(func, field)"`). */
  def zoo(vars: Seq[Variable]): Seq[(String, NamedPredicate)] = {
    val seen = scala.collection.mutable.Set.empty[String]
    vars.flatMap { v =>
      val ps = v.kind match {
        case "exact" => PredicateZoo.stringPredicates(v.field)
          .filter(_.name == s"(wholeFieldPredicate, ${v.field})")
        case _ => PredicateZoo.stringPredicates(v.field)
      }
      ps.filter(p => seen.add(p.name)).map(v.field -> _)
    }
  }

  /** Featurizer Columns over a pair of records — `DataModel.distances`
    * (`datamodel.py:106-144`): one distance per variable in declaration
    * order, then one presence indicator per `hasMissing` variable.
    * @param a maps a field name to its left-side Column
    * @param b maps a field name to its right-side Column
    */
  def featureColumns(vars: Seq[Variable],
                     a: String => Column, b: String => Column): Seq[Column] = {
    val present = (v: Variable) => a(v.field).isNotNull && b(v.field).isNotNull
    val dists = vars.map { v =>
      val d = v.kind match {
        case "exact" => when(a(v.field) === b(v.field), 1.0).otherwise(0.0)
        case _ => gf.affine_gap(a(v.field), b(v.field))
      }
      when(present(v), d).otherwise(0.0) // nan -> 0, datamodel.py:135-137
    }
    val missing = vars.filter(_.hasMissing)
      .map(v => when(present(v), 1.0).otherwise(0.0)) // 1 - is_missing
    dists ++ missing
  }

  /** Feature names (diagnostics / settings round trips). */
  def featureNames(vars: Seq[Variable]): Seq[String] =
    vars.map(v => s"${v.kind}:${v.field}") ++
      vars.filter(_.hasMissing).map(v => s"present:${v.field}")
}
