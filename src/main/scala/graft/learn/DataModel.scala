package graft.learn

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.expr.{functions => gf}
import graft.ops.Comparators

/**
 * Multi-field variable model — the engine's `DataModel`
 * (`datamodel.py:36-145`): an ordered list of typed field variables that
 * yields (a) the learnable blocking-predicate zoo (union over variables,
 * set-deduplicated, declaration order preserved) and (b) the featurizer
 * Columns the classifier consumes (`DataModel.distances`).
 *
 * Variable kinds — the reference's full variable zoo (`dedupe/variables/`):
 *  - `string` / `shortstring` — normalized affine-gap comparator
 *    (`variables/string.py:52-90`), the 24 simple string predicates
 *    ([[PredicateZoo.stringPredicates]]; index predicates stay descoped to
 *    the engine's LSH passes, `training.py:97-103` index_predicates=False);
 *  - `text` — corpus-less `CosineTextSimilarity` (tf cosine,
 *    `variables/string.py:92-110`), the 18 base string predicates;
 *  - `exact` — 0/1 equality, non-preprocessing wholeField predicate
 *    (`variables/exact.py` — `SimplePredicate`, not `StringPredicate`);
 *  - `set` — corpus-less `CosineSetSimilarity` over the [[SetSep]]-joined
 *    string codec, the 7 set predicates (`variables/set.py`);
 *  - `latlong` — sqrt(haversine) over a `"lat,lon"` codec, latLongGrid
 *    predicate (`variables/latlong.py`);
 *  - `price` — |log10 - log10|, NaN-missing when either price <= 0
 *    (`variables/price.py:17-24`), predicates orderOfMagnitude /
 *    wholeField / roundTo1;
 *  - `categorical` — dummy-coded outcome columns over `categories`
 *    (`variables/categorical_type.py`, r2-golden
 *    [[Comparators.categoricalDummies]]), wholeField predicate;
 *  - `exists` — two presence dummies, computed even for missing fields
 *    (`variables/exists.py` `comparator.missing = True`), no predicates;
 *  - `custom` — caller-supplied comparator Column, no predicates
 *    (`variables/base.py:80-105`);
 *  - `interaction` — product of other variables' feature columns
 *    (`variables/interaction.py`); parts are referenced by FIELD name,
 *    categorical/exists parts expand combinatorially over their dummies
 *    exactly like `InteractionType.categorical`. Nested interactions are
 *    not supported (reference them by their atomic fields instead).
 *
 * Missing data follows `datamodel.py:106-144` exactly: a comparison with a
 * null side (or a price <= 0) is NaN, interactions propagate NaN through
 * their product, NaN becomes 0 in the feature vector, and each
 * `hasMissing` column — field or interaction — appends a trailing
 * `1 - is_missing` indicator, IN COLUMN ORDER (`missing_field_indices`).
 * An interaction is `hasMissing` when any of its parts is
 * (`interaction.py:32-36`).
 *
 * Non-string fields cross the learner's string transport via per-kind
 * codecs: sets join elements with [[SetSep]], latlong renders `"lat,lon"`,
 * price renders the decimal value (Java and Python shortest-round-trip
 * renderings agree on ordinary magnitudes; scientific-notation extremes
 * differ and are out of codec scope). One bound vs the reference: a
 * preprocessing (`StringPredicate`) and non-preprocessing
 * (`SimplePredicate`) predicate with the same name on the same field — a
 * `String` and an `Exact` variable on one column — collapse to the
 * first-declared call mode, where the reference keeps both as distinct
 * set members (`predicates.py:63-64` repr-equality includes the type).
 */
object DataModel {

  /** Separator for the Set-field string codec (U+001F unit separator —
    * stripped from free text by `normalizeText`, so it cannot collide). */
  val SetSep = "\u001f"

  val Kinds: Set[String] = Set("string", "shortstring", "text", "exact",
    "set", "latlong", "price", "categorical", "exists", "custom", "interaction")

  final case class Variable(field: String, kind: String,
                            hasMissing: Boolean = false,
                            categories: Seq[String] = Nil,
                            interactionFields: Seq[String] = Nil,
                            custom: (Column, Column) => Column = null) {
    require(Kinds.contains(kind), s"unknown variable kind '$kind' (${Kinds.toSeq.sorted.mkString(" | ")})")
    require(kind != "categorical" || categories.distinct.size >= 2,
      s"categorical '$field' needs >= 2 distinct categories")
    require(kind != "interaction" || interactionFields.size >= 2,
      s"interaction '$field' needs >= 2 interaction fields")
    require(kind != "custom" || custom != null,
      s"custom '$field' needs a comparator, variables/base.py:91-94")

    /** Column count this variable contributes (`Variable.__len__`). */
    def width: Int = kind match {
      case "exists" => 2
      case "categorical" => Comparators.categoricalOutcomes(categories).size - 1
      case _ => 1
    }
  }

  /** The learnable predicate zoo of a variable list: per-variable zoos
    * concatenated in declaration order, deduplicated by predicate name
    * (`DataModel.predicates` is a SET union, `datamodel.py:100-106`), plus
    * one `ExistsPredicate` per `hasMissing` field variable
    * (`variables/base.py:70-73`).
    * @param indexPredicates `training.py:97-103` mode switch: when true,
    *        string/shortstring/text variables also contribute the LSH
    *        canopy predicates ([[PredicateZoo.canopyPredicates]] — the
    *        learnable index-predicate analogue); set variables' index
    *        predicates stay realized as the engine's fixed LSH passes */
  def zoo(vars: Seq[Variable],
          indexPredicates: Boolean = false): Seq[(String, NamedPredicate)] = {
    val seen = scala.collection.mutable.Set.empty[String]
    def canopies(f: String) =
      if (indexPredicates) PredicateZoo.canopyPredicates(f) else Nil
    val out = vars.flatMap { v =>
      val ps: Seq[NamedPredicate] = v.kind match {
        case "string" | "shortstring" => PredicateZoo.stringPredicates(v.field) ++ canopies(v.field)
        case "text" => PredicateZoo.textPredicates(v.field) ++ canopies(v.field)
        case "exact" | "categorical" => PredicateZoo.wholeFieldSimple(v.field) :: Nil
        case "set" => PredicateZoo.setPredicates(v.field)
        case "latlong" => PredicateZoo.latLongPredicates(v.field)
        case "price" => PredicateZoo.pricePredicates(v.field)
        case _ => Nil // exists / custom / interaction carry no simple predicates
      }
      val withExists =
        if (v.hasMissing && v.kind != "interaction")
          ps :+ PredicateZoo.existsPredicate(v.field, v.kind)
        else ps
      withExists.filter(p => seen.add(p.name)).map(v.field -> _)
    }
    require(out.nonEmpty,
      "at least one variable must carry blocking predicates (datamodel.py:42-47)")
    out
  }

  /** One variable's raw comparator columns — null encodes the reference's
    * NaN-missing. Codec decoding happens here, in Column space. */
  private def rawColumns(v: Variable, a: String => Column, b: String => Column): Seq[Column] = {
    val (x, y) = (a(v.field), b(v.field))
    val present = x.isNotNull && y.isNotNull
    def guard(d: Column): Column = when(present, d)
    def latlon(c: Column, i: Int) = element_at(split(c, ","), i + 1).cast("double")
    def setArr(c: Column) = filter(split(c, SetSep), e => e =!= "")
    v.kind match {
      case "string" | "shortstring" => Seq(guard(gf.affine_gap(x, y)))
      case "exact" => Seq(guard(when(x === y, 1.0).otherwise(0.0)))
      case "text" => Seq(guard(Comparators.cosineTextTf(x, y)))
      case "set" => Seq(guard(Comparators.cosineSetTf(setArr(x), setArr(y))))
      case "latlong" => Seq(guard(Comparators.haversineSqrt(
        latlon(x, 0), latlon(x, 1), latlon(y, 0), latlon(y, 1))))
      case "price" => // priceLogDiff is itself null on price <= 0 (NaN analogue)
        Seq(guard(Comparators.priceLogDiff(x.cast("double"), y.cast("double"))))
      case "categorical" =>
        Comparators.categoricalDummies(x, y, v.categories).map(d => guard(d.cast("double")))
      case "exists" => // comparator.missing = True: computed on nulls too
        Comparators.existsDummies(x, y).map(_.cast("double"))
      case "custom" => Seq(guard(v.custom(x, y)))
      case "interaction" => Seq.empty // expanded separately, in column space
    }
  }

  /** Per-column dummy labels for a multi-column variable (diagnostics). */
  private def colLabels(v: Variable): Seq[String] = v.kind match {
    case "exists" => Seq("both", "one")
    case "categorical" =>
      Comparators.categoricalOutcomes(v.categories).drop(1).map { case (p, q) => s"$p|$q" }
    case _ => Seq("")
  }

  private final case class Col(c: Column, label: String, hasMissing: Boolean)

  /** Full derived column list: field columns in declaration order, then
    * interaction columns (`datamodel.py:59-73`). */
  private def allColumns(vars: Seq[Variable],
                         a: String => Column, b: String => Column): Seq[Col] = {
    val fieldVars = vars.filter(_.kind != "interaction")
    val perVar: Seq[(Variable, Seq[Col])] = fieldVars.map { v =>
      val labels = colLabels(v)
      // categorical dummies are has_missing=False in the reference no
      // matter the variable flag (`categorical_type.py:24`); exists dummies
      // inherit it (`exists.py:22`)
      val colMissing = if (v.kind == "categorical") false else v.hasMissing
      (v, rawColumns(v, a, b).zip(labels).map { case (c, l) =>
        Col(c, if (l.isEmpty) s"${v.kind}:${v.field}" else s"${v.kind}:${v.field}:$l",
          colMissing)
      })
    }
    // interactions bind by field name; with several variables on one field
    // (String + Exact on the same column, the reference names them apart)
    // the FIRST declared one is the interaction part
    val byField: Map[String, (Variable, Seq[Col])] =
      perVar.reverse.map(p => p._1.field -> p).toMap
    val fieldCols = perVar.flatMap(_._2)
    val interCols = vars.filter(_.kind == "interaction").flatMap { iv =>
      val parts = iv.interactionFields.map { f =>
        val (pv, cols) = byField.getOrElse(f,
          throw new IllegalArgumentException(
            s"interaction field '$f' is not a declared field variable (interaction.py:96-104)"))
        (pv, cols)
      }
      val anyMissing = parts.exists(_._1.hasMissing) // interaction.py:32-36
      // itertools.product over each part's columns: categorical/exists parts
      // contribute their dummy columns, width-1 parts their single column
      parts.foldLeft(Seq((lit(1.0): Column, List.empty[String]))) { (acc, p) =>
        for { (prod, names) <- acc; c <- p._2 }
          yield (prod * c.c, names :+ c.label)
      }.map { case (prod, names) =>
        Col(prod, s"interaction(${names.mkString("*")})", anyMissing)
      }
    }
    fieldCols ++ interCols
  }

  /** Featurizer Columns over a pair of records — `DataModel.distances` +
    * `_add_derived_distances` (`datamodel.py:106-144`): field columns,
    * interaction products (null propagates like NaN), null -> 0, then one
    * trailing `1 - is_missing` indicator per `hasMissing` column.
    * @param a maps a field name to its left-side (codec string) Column
    * @param b maps a field name to its right-side (codec string) Column
    */
  def featureColumns(vars: Seq[Variable],
                     a: String => Column, b: String => Column): Seq[Column] = {
    val cols = allColumns(vars, a, b)
    cols.map(c => coalesce(c.c, lit(0.0))) ++
      cols.filter(_.hasMissing).map(c => when(c.c.isNull, 0.0).otherwise(1.0))
  }

  /** Feature names (diagnostics / settings round trips), aligned 1:1 with
    * [[featureColumns]]. */
  def featureNames(vars: Seq[Variable]): Seq[String] = {
    val cols = allColumns(vars, _ => lit(null), _ => lit(null))
    cols.map(_.label) ++ cols.filter(_.hasMissing).map(c => s"present:${c.label}")
  }
}
