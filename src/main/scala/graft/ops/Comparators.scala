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

  /** Corpus-less `CosineSetSimilarity` (`variables/set.py:31-36` with no
    * corpus: every element weighs 1): |A ∩ B| / sqrt(|A| |B|) over distinct
    * elements; empty side -> 0. Inputs are array&lt;string&gt; Columns. */
  def cosineSetTf(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val denom = sqrt(size(da).cast("double") * size(db).cast("double"))
    when(denom > 0,
      size(array_intersect(da, db)).cast("double") / denom).otherwise(0.0)
  }

  /** Corpus-less `CosineTextSimilarity` (`variables/string.py:103-110` with
    * no corpus: weights are raw term counts): tf-weighted cosine over
    * whitespace tokens of the two strings. Pure Column HOFs — per-pair work
    * is O(unique × total) on SHORT fields (the variable's intended use);
    * corpus-weighted cosine at scale is [[tfidfWeights]] +
    * [[PipelineOps.scoreCosineTfidf]]'s distributed shape. */
  def cosineTextTf(a: Column, b: Column): Column = {
    def toks(c: Column): Column =
      filter(split(c, "(?U)[\\s\\u001c-\\u001f]+"), t => t =!= "")
    def cnt(arr: Column, t: Column): Column =
      size(filter(arr, x => x === t)).cast("double")
    def dot(u: Column, ta: Column, tb: Column): Column =
      aggregate(u, lit(0.0), (acc, t) => acc + cnt(ta, t) * cnt(tb, t))
    val ta = toks(a)
    val tb = toks(b)
    val num = dot(array_distinct(ta), ta, tb)
    val denom = sqrt(dot(array_distinct(ta), ta, ta) * dot(array_distinct(tb), tb, tb))
    when(denom > 0, num / denom).otherwise(0.0)
  }

  // ---------------------------------------------- TF-IDF cosine comparators

  import org.apache.spark.sql.DataFrame

  /**
   * Per-(doc, term) integer TF-IDF weights — the distributed corpus stage of
   * `CosineTextSimilarity` / `CosineSetSimilarity` (`variables/string.py:103-109`,
   * `variables/set.py:31-36`; the reference wraps the `simplecosine` package,
   * which builds per-term corpus idf weights and compares docs by weighted
   * cosine).
   *
   * Spark-first shape: the corpus pass is a term-exploded `groupBy(term)`
   * document-frequency table (one shuffle, map-side combined) joined back to
   * the per-doc term counts — never a driver-held vocabulary. idf uses the
   * smoothed form idf(t) = ln((N+1)/(df(t)+1)) + 1 and is quantized to
   * integers (x1000) so every downstream aggregation is an EXACT integer sum:
   * results are bit-identical across engines and partition orders (scaling
   * the weights multiplies both dot and norms, so cosine is unchanged up to
   * the quantization granularity).
   *
   * @param docs (idCol, termsCol: array<string>)
   * @param nDocs corpus size N
   * @param setSemantics true -> tf is 0/1 over distinct terms
   *                     (CosineSetSimilarity); false -> term counts
   * @param weighted false -> no idf (the reference's corpus-less variant):
   *                 w = tf exactly
   * @return (idCol, term, w: long)
   */
  def tfidfWeights(docs: DataFrame, idCol: String, termsCol: String, nDocs: Long,
                   setSemantics: Boolean = false, weighted: Boolean = true): DataFrame =
    tfidfWeightsWithDf(docs, idCol, termsCol, nDocs, setSemantics, weighted)._1

  /** [[tfidfWeights]] plus the (term, df) document-frequency table it
    * derives internally. Callers that also need df — e.g. the stop-term
    * rule in [[PipelineOps.tfidfSearch]] — MUST take it from here rather
    * than re-aggregating the corpus: both the weights and the returned df
    * frame hang off the SAME tf aggregation sub-plan, so Spark's exchange
    * reuse runs that corpus scan + shuffle exactly once per query. */
  def tfidfWeightsWithDf(docs: DataFrame, idCol: String, termsCol: String, nDocs: Long,
                         setSemantics: Boolean = false, weighted: Boolean = true): (DataFrame, DataFrame) = {
    val exploded = docs.select(col(idCol), explode(col(termsCol)).as("term"))
    val tf =
      if (setSemantics) exploded.distinct().withColumn("tf", lit(1L))
      else exploded.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfTab = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w =
      if (!weighted)
        tf.select(col(idCol), col("term"), col("tf").cast("long").as("w"))
      else {
        val idfQ = floor(lit(1000.0) *
          (log(lit((nDocs + 1).toDouble) / (col("df") + lit(1)).cast("double")) + lit(1.0)))
        tf.join(dfTab, Seq("term"))
          .select(col(idCol), col("term"), (col("tf") * idfQ).cast("long").as("w"))
      }
    (w, dfTab)
  }

  /**
   * Weighted cosine similarity for candidate pairs over a [[tfidfWeights]]
   * table: dot = equi-join of the two sides' (id, term, w) rows on the term
   * (per-pair cost O(doc terms) — the same work the reference spends per
   * compared pair, distributed); norms = per-doc integer aggregates. Pairs
   * with no common term keep cosine 0 (left join). All sums are integer, so
   * the single double division at the end is deterministic.
   *
   * @param pairs (id_a, id_b)
   * @return (id_a, id_b, cosine: double in [0, 1])
   */
  def cosineTfidf(pairs: DataFrame, weights: DataFrame, idCol: String): DataFrame = {
    val norm = weights.groupBy(col(idCol)).agg(sum(col("w") * col("w")).as("norm2"))
    val wa = weights.select(col(idCol).as("id_a"), col("term"), col("w").as("w_a"))
    val wb = weights.select(col(idCol).as("id_b"), col("term"), col("w").as("w_b"))
    val dot = pairs.join(wa, Seq("id_a"))
      .join(wb, Seq("id_b", "term"))
      .groupBy(col("id_a"), col("id_b")).agg(sum(col("w_a") * col("w_b")).as("dot"))
    pairs
      .join(dot, Seq("id_a", "id_b"), "left")
      .join(norm.select(col(idCol).as("id_a"), col("norm2").as("n_a")), Seq("id_a"))
      .join(norm.select(col(idCol).as("id_b"), col("norm2").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        // clamp: sqrt(n)*sqrt(n) can exceed n by an ulp, pushing a
        // self-pair's cosine to 1 + 2e-16; cap at exactly 1.0
        least(lit(1.0), coalesce(col("dot"), lit(0L)).cast("double") /
          (sqrt(col("n_a").cast("double")) * sqrt(col("n_b").cast("double")))).as("cosine"))
  }
}
