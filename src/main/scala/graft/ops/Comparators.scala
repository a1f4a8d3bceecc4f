package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Non-string field comparators from the reference's variable zoo, as Column
 * expressions feeding the featurizer:
 *
 *  - [[haversineSqrt]] — `LatLongType.comparator` (`variables/latlong.py:16-18`):
 *    sqrt of the haversine great-circle distance in km (the `haversine`
 *    package's default Earth radius 6371.0088 km).
 *  - [[priceLogDiff]] — `PriceType.comparator` (`variables/price.py:17-24`):
 *    `abs(log10(p1) - log10(p2))`, null (the NaN-missing analogue) when
 *    either price <= 0.
 *  - [[categoricalDummies]] — `CategoricalType` (`variables/categorical_type.py:12-27`)
 *    via the public `categorical` package's CategoricalComparator: a pair of
 *    category values maps to one of the outcomes
 *    `[(c1,c1)..(cn,cn), (c1,c2), (c1,c3), ..]` (identity outcomes in sorted
 *    category order, then unordered cross pairs lexicographically); the
 *    feature is a one-hot dummy vector over outcomes[1:] (baseline outcome 0
 *    encodes as all-zero). Golden-tested against `tests/test_core.py:118-152`.
 *  - [[existsDummies]] — `ExistsType.comparator` (`variables/exists.py:25-38`):
 *    categorical over presence, outcomes [(0,0),(1,1),(0,1)] -> 2 dummies.
 */
object Comparators {

  /** Earth radius (km) used by the `haversine` package's default unit. */
  val EarthRadiusKm = 6371.0088

  /** sqrt(haversine km distance) — inputs in degrees. */
  def haversineSqrt(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dPhi = radians(lat2 - lat1) / 2
    val dLam = radians(lon2 - lon1) / 2
    val h = pow(sin(dPhi), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLam), 2)
    sqrt(lit(2 * EarthRadiusKm) * asin(sqrt(h)))
  }

  /** abs(log10(p1) - log10(p2)); null when either price <= 0 (missing). */
  def priceLogDiff(p1: Column, p2: Column): Column =
    when(p1 <= 0 || p2 <= 0, lit(null).cast("double"))
      .otherwise(abs(log10(p1) - log10(p2)))

  /** Outcome list for a category set: identity pairs then cross pairs. */
  def categoricalOutcomes(categories: Seq[String]): Seq[(String, String)] = {
    val cats = categories.sorted
    cats.map(c => (c, c)) ++
      (for { i <- cats.indices; j <- (i + 1) until cats.length }
        yield (cats(i), cats(j)))
  }

  /** One dummy Column per outcome[1:]; unknown categories yield all-zero. */
  def categoricalDummies(x: Column, y: Column, categories: Seq[String]): Seq[Column] = {
    val lo = least(x, y)
    val hi = greatest(x, y)
    categoricalOutcomes(categories).drop(1).map { case (a, b) =>
      when(lo === a && hi === b, 1L).otherwise(0L)
    }
  }

  /** Presence dummies: both -> (1,0), exactly one -> (0,1), none -> (0,0).
    * "Present" means non-null and (for strings) non-empty, matching Python
    * truthiness in `exists.py:26-31`. */
  def existsDummies(x: Column, y: Column): Seq[Column] = {
    val px = x.isNotNull && x.cast("string") =!= ""
    val py = y.isNotNull && y.cast("string") =!= ""
    Seq(
      when(px && py, 1L).otherwise(0L),
      when((px || py) && !(px && py), 1L).otherwise(0L))
  }
}
